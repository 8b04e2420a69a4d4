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

  test("parquet corrupt-file quarantine: torn and alien files are " +
    "listed with reasons, valid files read completely, and the plain " +
    "read would have failed") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_pq_quar").toString
    val src = Tables.region(s, dir)
    // two VALID single-file parquet dirs, files copied up into tmp
    for (i <- 1 to 2) {
      val d = s"$tmp/stage$i"
      src.coalesce(1).write.mode("overwrite").parquet(d)
      val part = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$tmp/good$i.parquet"))
    }
    // corrupt arms: truncated tail (bad footer), alien bytes (bad
    // header), too-short stub; plus a _SUCCESS marker that must be
    // ignored, not quarantined
    val goodBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/good1.parquet"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/torn.parquet"),
      java.util.Arrays.copyOfRange(goodBytes, 0, goodBytes.length - 9))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/alien.parquet"),
      "this is not a parquet file, it only ends in .parquet PAR1"
        .getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/stub.parquet"),
      Array[Byte](80, 65, 82, 49))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/_SUCCESS"), Array.empty[Byte])
    // the stage dirs must not be scanned (files only)
    val (data, quarantined) = Formats.scanParquetQuarantining(s, tmp)
    assert(data.count() == 2 * src.count(),
      "both valid files read in full")
    assert(data.schema == src.schema)
    val q = quarantined.collect()
      .map(r => r.getString(0).split('/').last -> r.getString(2)).toMap
    assert(q.keySet == Set("torn.parquet", "alien.parquet",
      "stub.parquet"), s"quarantine list: $q")
    assert(q("stub.parquet") == "too-short-for-parquet")
    assert(q("alien.parquet") == "bad-header-magic")
    assert(q("torn.parquet") == "bad-footer-magic")
    // non-vacuity: the plain directory read dies on the same input
    intercept[Throwable] {
      s.read.parquet(s"$tmp/torn.parquet").count()
    }
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
