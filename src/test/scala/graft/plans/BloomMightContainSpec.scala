package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomMightContainSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def filterBytes(keys: Seq[Long], n: Long,
                          fpp: Double): Array[Byte] = {
    val bf = BloomFilter.create(n, fpp)
    keys.foreach(bf.putLong)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives ever; false-positive rate lands near fpp") {
    import s.implicits._
    val members = (0L until 1000L).map(_ * 7919L)
    val bytes = filterBytes(members, 1000L, 0.03)
    val probes = ((0L until 1000L).map(_ * 7919L) ++
      (1L to 20000L).map(_ * 7919L + 1L)).toDF("h")
    val hits = probes
      .filter(call_function("bloom_might_contain", lit(bytes), col("h")))
      .collect().map(_.getLong(0)).toSet
    assert(members.forall(hits.contains), "a member must never be missed")
    val fps = hits.size - members.size
    assert(fps < 20000 * 0.09, s"fp count $fps way above 3x the 3% target")
  }

  test("null key evaluates to null (filtered out), and the predicate " +
    "stays inside whole-stage codegen") {
    val bytes = filterBytes(Seq(1L), 10L, 0.01)
    // range (not a LocalRelation) so ConvertToLocalRelation can't fold
    // the filter away before it reaches the physical plan
    val df = s.range(0, 10)
      .select(when(col("id") < 5, col("id")).as("h"))
      .filter(call_function("bloom_might_contain", lit(bytes), col("h")))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "only the member passes; null keys are filtered, not errors")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter") &&
      plan.contains("bloom_might_contain"),
      s"expected codegen'd filter, got:\n${plan.take(800)}")
  }

  test("a non-foldable filter argument is rejected at analysis") {
    import s.implicits._
    val df = Seq((Array[Byte](1, 2), 1L)).toDF("b", "h")
    val e = intercept[Exception] {
      df.filter(call_function("bloom_might_contain", col("b"), col("h")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"),
      s"analysis must demand a literal filter, got: ${e.getMessage}")
  }
}
