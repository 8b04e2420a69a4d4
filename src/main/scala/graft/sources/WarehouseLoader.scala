package graft.sources

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Warehouse load stage (SURVEY §2.1 S4 + §2.11 G6; reference: BBT-ETL-DW
  * scripts/etl_load.py:12-61 — JDBC append into SQL Server, dims loaded
  * before the fact so FK discipline holds by ordering).
  *
  * The sink is pluggable: production uses [[JdbcSink]] (the exact
  * df.write.jdbc shape the reference uses — exercised for real in
  * GoldWarehouseSpec against an embedded in-memory Derby, the JVM-local
  * stand-in for the reference's SQL Server); [[ParquetSink]] is a
  * filesystem-backed alternative for environments without any database.
  * Load-order semantics — the part that can silently corrupt a
  * warehouse — are testable through either sink.
  */
object WarehouseLoader {

  trait TableSink {
    def append(df: DataFrame, table: String): Unit
  }

  /** The reference's sink: JDBC append, one table per dim/fact
    * (etl_load.py:12-15: url + driver props; :30-32 mode("append")).
    */
  final class JdbcSink(url: String, user: String, password: String,
                       driver: String) extends TableSink {
    def append(df: DataFrame, table: String): Unit = {
      val props = new Properties()
      props.setProperty("user", user)
      props.setProperty("password", password)
      props.setProperty("driver", driver)
      df.write.mode("append").jdbc(url, table, props)
    }
  }

  /** Filesystem fake with identical append semantics. */
  final class ParquetSink(root: String) extends TableSink {
    def append(df: DataFrame, table: String): Unit =
      df.write.mode("append").parquet(s"$root/$table")
  }

  /** G6 — load dims strictly before the fact (etl_load.py:38-61). Returns
    * the tables in the order they were written so tests can assert it.
    */
  def load(sink: TableSink, dims: Seq[(String, DataFrame)],
           fact: (String, DataFrame)): Seq[String] = {
    val order = scala.collection.mutable.ArrayBuffer[String]()
    dims.foreach { case (name, df) => sink.append(df, name); order += name }
    sink.append(fact._2, fact._1)
    order += fact._1
    order.toSeq
  }
}
