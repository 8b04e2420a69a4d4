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
