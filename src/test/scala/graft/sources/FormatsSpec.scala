package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class FormatsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trips losslessly and pushes filters + pruned columns " +
    "to the scan, like parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
    val src = Tables.orders(s, dir)
    Formats.writeOrc(src, s"$tmp/orders.orc")
    val back = Formats.readOrc(s, s"$tmp/orders.orc")
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // pushdown: the filter and the 2-column projection reach the scan
    val q = back.filter(col("o_orderkey") < 100)
      .select("o_orderkey", "o_totalprice")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderkey), " +
      "LessThan(o_orderkey,100)]"), scan.take(800))
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint," +
      "o_totalprice:double>"), scan.take(800))
  }

  test("quarantining JSON ingest: malformed lines survive with their " +
    "raw text, clean lines parse — nothing crashes, nothing vanishes") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_q")
    val f = tmp.resolve("docs.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"id": 1, "text": "good line"}""",
      """{"id": 2, "text": "also good"}""",
      """{"id": 3, "text": "truncated""", // malformed
      """not json at all"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val df = Formats.readJsonlQuarantining(s, f.toString, schema).cache()
    val clean = df.filter(col("_corrupt_record").isNull)
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2 && quarantined.count() == 2)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
    // the quarantined rows carry the original line for repair/audit
    assert(quarantined.select("_corrupt_record").collect()
      .map(_.getString(0)).exists(_.contains("not json at all")))
  }

  test("JSON-lines round-trips with an explicit schema, one object per " +
    "line (splittable)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val src = Tables.region(s, dir)
    Formats.writeJsonl(src, s"$tmp/region.jsonl")
    val back = Formats.readJsonl(s, s"$tmp/region.jsonl", src.schema)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // the files really are line-delimited JSON objects
    val firstFile = java.nio.file.Files.walk(tmp).iterator()
    var line: String = null
    firstFile.forEachRemaining { p =>
      if (p.toString.endsWith(".json") && line == null)
        line = java.nio.file.Files.readAllLines(p).get(0)
    }
    assert(line != null && line.startsWith("{") && line.endsWith("}"))
  }
}
