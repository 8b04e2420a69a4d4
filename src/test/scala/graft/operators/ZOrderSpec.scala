package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.InterleaveBits

class ZOrderSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("interleave_bits equals the reference interleave on random and " +
    "edge coordinates; out-of-range throws") {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L),
      (65535L, 0L), (1L, 2L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => InterleaveBits.interleave(a, b) }
    assert(got.toSeq == want)
    // z-order property: interleave is monotone within an aligned square
    assert(InterleaveBits.interleave(0, 0) == 0L &&
      InterleaveBits.interleave(1, 0) == 1L &&
      InterleaveBits.interleave(0, 1) == 2L &&
      InterleaveBits.interleave(1, 1) == 3L)
    val e = intercept[Exception] {
      Seq((65536L, 0L)).toDF("a", "b")
        .select(ZOrder.zvalue(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("65535") ||
      Option(e.getCause).exists(_.getMessage.contains("65535")))
  }

  test("interleave_bits participates in whole-stage codegen") {
    val plan = s.range(0L, 16L)
      .select(ZOrder.zvalue(col("id"), col("id")).as("z"))
      .queryExecution.executedPlan.toString
    // the star prefix marks operators fused into a WholeStageCodegen
    // stage — round 11 shipped this expression with generated code Janino
    // could not parse, and nothing asserted it (NativeCodegenCanarySpec
    // now pins the compile itself for every native expression)
    assert(plan.contains("*(1) Project [interleave_bits"), plan)
  }

  /** Files of `path` whose [min, max] of `c` intersects [lo, hi]. */
  private def filesTouched(path: String, c: String,
                           lo: Long, hi: Long): (Int, Int) = {
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    val touched = parts.count { p =>
      val r = s.read.parquet(p)
        .agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
      r.getLong(0) <= hi && r.getLong(1) >= lo
    }
    (touched, parts.length)
  }

  test("z-ordered layout prunes on BOTH dimensions where a linear sort " +
    "prunes on one: a y-filter touches a strict subset of z files but " +
    "every x-sorted file") {
    import s.implicits._
    // uniform 64x64 grid, one row per cell; 16 files => each z file is
    // one aligned 16x16 square of the grid
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val zed = grid.withColumn("z", ZOrder.zvalue(col("x"), col("y")))
    val base = System.getProperty("java.io.tmpdir") + "/graft_zorder_spec"
    ZOrder.writeZOrdered(zed, "z", s"$base/zorder", numFiles = 16)
    ZOrder.writeZOrdered(zed.withColumnRenamed("z", "zz")
      .withColumn("z", col("x")), "z", s"$base/linear", numFiles = 16)

    val (zTouch, zAll) = filesTouched(s"$base/zorder", "y", 0L, 3L)
    val (lTouch, lAll) = filesTouched(s"$base/linear", "y", 0L, 3L)
    assert(zAll == 16 && lAll == 16, s"expected 16 files, got $zAll/$lAll")
    assert(lTouch == 16, "x-sorted layout cannot prune a y filter")
    assert(zTouch <= 6, s"z layout should touch ~4 of 16 files, got " +
      s"$zTouch (aligned 16x16 squares: only the y<16 row of squares " +
      "intersects y<4)")
    // the x dimension still prunes too (both layouts do here)
    val (zx, _) = filesTouched(s"$base/zorder", "x", 0L, 3L)
    assert(zx <= 6, s"z layout must also prune x filters, touched $zx")
    // layout changes bytes on disk, never content
    val back = s.read.parquet(s"$base/zorder")
      .select("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = zed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == want)
  }
}
