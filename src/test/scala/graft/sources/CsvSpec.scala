package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CsvSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("quarantining read: schema-violating rows keep their raw text in " +
    "_corrupt_record, clean rows parse; nothing crashes, nothing vanishes") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(Paths.get(s"$dir/rows.csv"),
      "id,qty\n1,10\n2,not_a_number\n3,30\n")
    val schema = new StructType()
      .add("id", IntegerType).add("qty", IntegerType)
    // the corrupt-record column is only materialized alongside the data
    // columns after caching (Spark refuses corrupt-only projections)
    val df = Csv.readQuarantining(s, s"$dir/rows.csv", schema).cache()
    val clean = df.filter(col("_corrupt_record").isNull)
      .select("id", "qty").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(clean == Set((1, 10), (3, 30)))
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(quarantined.toSeq == Seq("2,not_a_number"))
    df.unpersist()
  }
}
