package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PolyHashSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("poly_hash matches the SQL higher-order fold character for " +
    "character on real corpus text") {
    import s.implicits._
    val samples = Seq("hello", "a", "data pipeline shingle text",
      "Grüße", "числа", "x" * 500) :+
      graft.core.Tables.documents(s, "/root/testdata/sf0.001")
        .select("text").head().getString(0)
    val df = samples.toDF("t")
      .withColumn("native", expr("poly_hash(t)"))
      .withColumn("hof", expr(
        """aggregate(sequence(1, length(t)), CAST(7 AS BIGINT),
           (a, i) -> (a * 31 + ascii(substring(t, i, 1))) % 1073741789)"""))
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"mismatch for '${r.getString(0).take(30)}'"))
  }

  test("empty string hashes to the seed; null propagates") {
    import s.implicits._
    val out = Seq(Some(""), None).toDF("t")
      .select(expr("poly_hash(t)")).collect()
    assert(out(0).getLong(0) == 7L)
    assert(out(1).isNullAt(0))
  }
}
