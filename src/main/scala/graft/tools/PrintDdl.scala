package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.JdbcDialects

import graft.core.Sessions

/** Dev probe (NOT shipped library code): prints the SQL Server DDL type
  * each column of the dw_bbt star would get through Spark's
  * MsSqlServerDialect — the source of truth GoldWarehouseSpec's dialect
  * pin was authored from.
  */
object PrintDdl {
  def main(args: Array[String]): Unit = {
    val s = Sessions.build("graft-ddl", 4)
    val dialect = JdbcDialects.get(
      "jdbc:sqlserver://localhost:1433;databaseName=dw_bbt")
    def ddl(name: String, df: DataFrame): Unit = {
      val m = df.schema.fields.map(f => s""""${f.name}" -> "${
        dialect.getJDBCType(f.dataType)
          .orElse(JdbcUtils.getCommonJDBCType(f.dataType))
          .map(_.databaseTypeDefinition).getOrElse("<NONE:" + f.dataType + ">")
      }"""").mkString(", ")
      println(s"DDLMAP $name Map($m)")
    }
    val out = graft.pipeline.ReferenceParity.run(s,
      "/root/reference/data/raw", "2024-11-24")
    ddl("dimCustomers", out.dimCustomers)
    ddl("dimProducts", out.dimProducts)
    ddl("dimStore", out.dimStore)
    ddl("dimCalendar", out.dimCalendar)
    ddl("dimTaxRate", out.dimTaxRate)
    ddl("dimExchange", out.dimExchange)
    ddl("factSales", out.factSales)
    s.stop()
  }
}
