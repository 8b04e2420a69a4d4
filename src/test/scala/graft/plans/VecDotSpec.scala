package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class VecDotSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("vec_dot is bit-identical to the sequential higher-order fold on " +
    "every embedding pair against vector 0") {
    val e = Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val both = e.join(broadcast(q))
      .select(
        expr("vec_dot(v, qv)").as("native"),
        expr("""aggregate(zip_with(v, qv, (x, y) -> x * y),
               CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)""").as("fold"))
    val mismatches = both.filter(col("native") =!= col("fold")).count()
    assert(mismatches == 0)
  }

  test("vec_dot participates in whole-stage codegen") {
    val e = Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = e.select(expr("vec_dot(v, v)").as("d"))
      .queryExecution.executedPlan.toString
    // the star prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot"))
  }

  test("null input array yields null; mismatched lengths use the shorter") {
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0))))
      .toDF("a", "b")
    val out = df.select(expr("vec_dot(a, b)")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }
}
