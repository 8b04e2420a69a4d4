package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * stage a 100 TB embedding pipeline needs before ANN / SemDeDup (project
  * 64-d to 8–16-d, then bucket/search in the cheap space).
  *
  * Scale shape: ONE map-side-combinable aggregation computes the exact
  * second-moment sums (the d(d+1)/2 upper triangle, 2 080 cells for d=64);
  * the per-partition hash-agg collapses the per-row O(d²) pair stream to
  * 2 080 rows before the shuffle, so shuffle bytes are O(partitions · d²)
  * regardless of corpus size. The eigensolve then runs DRIVER-SIDE on the
  * tiny d×d matrix (cyclic Jacobi, deterministic), and projection is a
  * map-only pass of k codegen'd [[graft.plans.VecDot]] calls against
  * literal component arrays — the same literal-plane trick the LSH family
  * uses. No RDDs, no BLAS, no driver-side data pass.
  *
  * Determinism: moments are integerized per row ([[graft.functions.Exact]]
  * scaled-long trick) so the sums are exact integers under ANY partitioning
  * / AQE plan; the covariance doubles derived from them — and therefore the
  * eigenvectors — are bit-stable run to run. The moment table is the
  * DuckDB-oracle-checked query (l43); the eigensolve itself is pinned by
  * PcaSpec (orthonormality, A·v = λ·v residual, trace preservation,
  * projected variance = eigenvalue).
  *
  * Reference scope note: the reference pipeline (BBT-ETL-DW) has no
  * embedding operators at all — this extends the engine's LLM-data family
  * (SURVEY §2.14), composing with IVF/SemDeDup the way l42 composes l12cp
  * with l39.
  */
object Pca {

  /** Exact scaled-integer moment sums over `vecCol` (array<float|double>,
    * length `dim`): one row per upper-triangle cell (i ≤ j) with
    * {{{ sxy = Σ ⌊x_i·10^digits⌉·⌊x_j·10^digits⌉,  sx = Σ ⌊x_i·10^digits⌉,
    *     sy = Σ ⌊x_j·10^digits⌉,  n = row count }}}
    * — everything a covariance (or uncentered Gram) needs, all exact
    * BIGINTs, via the fused [[graft.functions.MomentAgg]] buffer: one
    * compiled d² loop per row, one ~17 KB buffer per partition through
    * the merge, no interpreted per-pair lambdas (the HOF formulation
    * below measured 8.7–10.9 s at 100k×64-d; this is the compiled
    * replacement, spec-pinned bit-equal). Long-sum overflow envelope:
    * see [[graft.functions.MomentAgg]]; beyond it use
    * [[momentSumsHof]] with `wide = true`.
    */
  def momentSums(df: DataFrame, vecCol: String, dim: Int,
                 digits: Int = 6): DataFrame =
    df.select(udaf(new graft.functions.MomentAgg(dim, digits))
        .apply(col(vecCol).cast("array<double>")).as("cells"))
      .select(inline(col("cells")))
      .filter(col("n") > 0L)

  /** The higher-order-function formulation of [[momentSums]] — kept for
    * the beyond-long-envelope regime (`wide = true` sums through a
    * decimal(38,0) accumulator, the [[graft.functions.Exact.exactSumBig]]
    * pattern) and as the independent reference the spec pins the fused
    * buffer against. The scaled vector is bound ONCE as a lambda
    * variable (the transform-over-singleton trick), and the pair stream
    * exists only inside whole-stage codegen — but each pair struct is an
    * interpreted lambda eval, which is why the fused buffer replaced it
    * on the hot path.
    */
  def momentSumsHof(df: DataFrame, vecCol: String, dim: Int,
                    digits: Int = 6, wide: Boolean = false): DataFrame = {
    val scale = math.pow(10, digits)
    val pairsSql =
      s"""element_at(transform(
            array(transform($vecCol,
                    x -> CAST(round(CAST(x AS DOUBLE) * $scale, 0)
                              AS BIGINT))),
            sv -> flatten(transform(sv, (xi, i) ->
              transform(slice(sv, i + 1, $dim - i), (xj, k) ->
                named_struct(
                  'i', CAST(i AS BIGINT), 'j', CAST(i + k AS BIGINT),
                  'x', xi, 'y', xj, 'p', xi * xj))))), 1)"""
    def s(c: Column) =
      if (wide) sum(c.cast("decimal(38,0)")) else sum(c)
    // fail FAST on ragged vectors, matching MomentAgg's require: a
    // short vector would otherwise contribute cells only for its own
    // indices, leaving per-cell n inconsistent and the fitted model
    // silently wrong in the wide regime. Null rows still skip (the
    // fused path and SQL sums both skip them).
    df.filter(coalesce(expr(
        s"""assert_true($vecCol IS NULL OR size($vecCol) = $dim,
            'momentSumsHof: vector length <> dim')"""), lit(true)))
      .select(explode(expr(pairsSql)).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(s(col("pr.p")).as("sxy"), s(col("pr.x")).as("sx"),
        s(col("pr.y")).as("sy"), count(lit(1)).as("n"))
  }

  /** DuckDB mirror of [[momentSums]] (long path) over table `table`'s
    * column `vecCol` — kept adjacent so the two sides can't drift.
    */
  def momentSumsOracleSql(table: String, vecCol: String, dim: Int,
                          digits: Int = 6): String = {
    val scale = math.pow(10, digits)
    s"""WITH sv AS (SELECT list_transform($vecCol,
          x -> CAST(round(CAST(x AS DOUBLE) * $scale, 0) AS BIGINT)) AS v
        FROM $table)
      SELECT r1.i AS i, r2.j AS j,
        CAST(sum(v[r1.i + 1] * v[r2.j + 1]) AS BIGINT) AS sxy,
        CAST(sum(v[r1.i + 1]) AS BIGINT) AS sx,
        CAST(sum(v[r2.j + 1]) AS BIGINT) AS sy,
        CAST(count(v) AS BIGINT) AS n
      FROM sv, range(0, $dim) r1(i), range(0, $dim) r2(j)
      WHERE r2.j >= r1.i
      GROUP BY 1, 2"""
  }

  /** Fitted model. `components(c)` is the c-th principal axis (unit norm,
    * descending `eigenvalues`, sign fixed so the largest-|·| coordinate is
    * positive — first index wins ties); `eigenvalues(c)` is the population
    * variance (centered fit) or mean squared norm share (uncentered fit)
    * along it. `centered = false` means the axes diagonalize the RAW
    * second-moment matrix E[xxᵀ] — the variant for cosine/dot-product
    * consumers (ANN, near-dup): a truncated orthonormal rotation of the
    * raw vectors preserves dot products up to the dropped energy, whereas
    * centering shifts the origin and wrecks angles (measured recall@10
    * 0.05 centered vs the uncentered variant on the clustered 100k
    * fixture — SCALE_r12 §16).
    */
  final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]],
                            centered: Boolean = true,
                            totalVariance: Option[Double] = None) {
    /** Fraction of total variance captured by the first k components.
      * The denominator is the full trace: `eigenvalues.sum` when the
      * model carries all `dim` of them (the exact [[fit]]), else the
      * trace measured alongside the sketch (`totalVariance`,
      * [[fitRandomized]]) — a truncated model's eigenvalue sum covers
      * only the captured subspace and would silently inflate the
      * fraction. */
    def varianceExplained(k: Int): Double = {
      val tot = totalVariance.getOrElse(eigenvalues.sum)
      if (tot == 0.0) 0.0 else eigenvalues.take(k).sum / tot
    }
  }

  /** One exact distributed moment pass + a driver-side d×d eigensolve.
    * The collect is d(d+1)/2 rows — bounded by DIMENSION, not data.
    *
    * `center = true` diagonalizes the covariance (statistics semantics:
    * eigenvalue = variance along the axis); `center = false`
    * diagonalizes the raw second moment E[xxᵀ] — use this for
    * cosine/dot-product consumers (see [[PcaModel]]). `wide` routes the
    * moment pass through [[momentSumsHof]]'s decimal accumulator for
    * corpora beyond the long-sum envelope.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, digits: Int = 6,
          wide: Boolean = false, center: Boolean = true): PcaModel = {
    val rows = (if (wide) momentSumsHof(df, vecCol, dim, digits, wide)
                else momentSums(df, vecCol, dim, digits)).collect()
    modelFromMoments(rows, dim, digits, center)
  }

  /** Build a model from collected moment cells — the shared tail of
    * [[fit]] and the streaming standing-state reader
    * ([[graft.streaming.StreamOps]] maintains the cells incrementally:
    * the sums are a MONOID, so a batch's cells fold into the standing
    * state by elementwise addition and a model is available at any time
    * without a corpus pass).
    */
  def modelFromMoments(rows: Array[org.apache.spark.sql.Row], dim: Int,
                       digits: Int = 6,
                       center: Boolean = true): PcaModel = {
    val scale = math.pow(10, digits)
    require(rows.nonEmpty, "PCA fit on an empty dataset")
    val n = rows.head.getLong(rows.head.fieldIndex("n"))
    require(n > 0, "PCA fit on an empty dataset")
    def asD(r: org.apache.spark.sql.Row, field: String): Double = r.get(
      r.fieldIndex(field)) match {
      case l: java.lang.Long => l.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
    }
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getLong(r.fieldIndex("i")).toInt
      val j = r.getLong(r.fieldIndex("j")).toInt
      if (i == j) mean(i) = asD(r, "sx") / n / scale
      val c =
        if (center)
          (asD(r, "sxy") / n -
            (asD(r, "sx") / n) * (asD(r, "sy") / n)) / (scale * scale)
        else asD(r, "sxy") / n / (scale * scale)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(dim, n, mean, values, vectors, centered = center)
  }

  /** Cyclic-by-rows Jacobi eigendecomposition of a symmetric matrix:
    * deterministic (fixed sweep order, pure double ops, no pivoting on
    * magnitude), O(d³) per sweep — microseconds at d=64. Returns
    * (eigenvalues desc, row-per-eigenvector) with the sign convention of
    * [[PcaModel]]. Converges when the off-diagonal Frobenius mass falls
    * below 1e-14 of the diagonal mass (or 64 sweeps).
    */
  def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1e-300, (0 until d).map(i =>
      a(i)(i) * a(i)(i)).sum)
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            // Rutishauser rotation: tan via the stable quadratic root
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) +
                math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort desc by eigenvalue, stable on original index; fix signs
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val mx = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(mx) < 0.0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Randomized (sketch-project-solve) eigensolve — the d ∈ [2k, 16k]
    * form RISKS.md row 8 names: [[MomentAgg]]'s exact triangle is
    * O(d²) per partition (1 GB at d = 16k) and the driver Jacobi is
    * O(d³) (~4·10¹² flops at 16k) — both walls; here NOTHING is ever
    * O(d²). Randomized subspace iteration (Halko, Martinsson & Tropp
    * 2011, alg. 4.4 + Rayleigh–Ritz):
    *
    *  1. Ω: d×l Gaussian test matrix, l = k + oversample, seeded
    *     (deterministic driver-side generation);
    *  2. one distributed pass per iteration computes Y = A·B for the
    *     current basis B via [[graft.functions.SketchAgg]] (buffer
    *     O(d·l), per-row 2·d·l compiled flops, map-side combined) —
    *     A = E[xxᵀ] or the covariance, never materialized;
    *  3. driver: B ← orth(Y) (modified Gram–Schmidt, O(d·l²));
    *  4. after the last pass, Rayleigh–Ritz in span(B): M = BᵀY (l×l),
    *     Jacobi eigensolve of M, components = B·U.
    *
    * `powerIters` ≥ 1 (pass count = powerIters + 1): the final basis
    * must be orthonormal for step 4, and each extra iteration sharpens
    * the spectral gap (A²ᵖ⁺¹ sampling). Accuracy is excellent when the
    * spectrum decays (the real-embedding case) and carries the usual
    * randomized-SVD error bound in expectation; the spec pins top-k
    * eigenvalue agreement and subspace alignment against the exact
    * solve on decaying-spectrum data, and l44r emits the per-component
    * alignment as DATA. When exact still wins: d ≲ 2k, where the
    * triangle fits (17 KB at d = 64) and the exact solve is both
    * cheaper (one pass, not powerIters+1) and bit-deterministic —
    * fitRandomized's double sums can differ in last ulps across
    * layouts. Use [[fit]] there; this is the past-the-wall form.
    */
  def fitRandomized(df: DataFrame, vecCol: String, dim: Int, k: Int,
                    oversample: Int = 8, powerIters: Int = 1,
                    seed: Long = 42L, center: Boolean = true): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    require(powerIters >= 1, "powerIters >= 1 (the Rayleigh-Ritz basis " +
      "must be orthonormalized at least once)")
    val l = math.min(dim, k + oversample)
    val rnd = new java.util.Random(seed)
    var basis = Array.fill(dim, l)(rnd.nextGaussian())
    var lastBasis: Array[Array[Double]] = null
    var y: Array[Array[Double]] = null
    var mean: Array[Double] = null
    var n = 0L
    var ssq = 0.0
    var pass = 0
    while (pass <= powerIters) {
      val cells = df.select(
          udaf(new graft.functions.SketchAgg(dim, basis))
            .apply(col(vecCol).cast("array<double>")).as("cells"))
        .select(inline(col("cells")))
        .collect()
      require(cells.nonEmpty && cells.head.getLong(4) > 0,
        "fitRandomized on an empty dataset")
      n = cells.head.getLong(4)
      ssq = cells.head.getDouble(5)
      mean = new Array[Double](dim)
      val yRaw = Array.ofDim[Double](dim, l)
      cells.foreach { r =>
        val i = r.getLong(0).toInt
        val j = r.getLong(1).toInt
        yRaw(i)(j) = r.getDouble(2) / n
        if (j == 0) mean(i) = r.getDouble(3) / n
      }
      // centered A·B = E[x(xᵀB)] − μ(μᵀB)
      if (center) {
        val muB = Array.tabulate(l)(j =>
          (0 until dim).map(i => mean(i) * basis(i)(j)).sum)
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < l) { yRaw(i)(j) -= mean(i) * muB(j); j += 1 }
          i += 1
        }
      }
      y = yRaw
      lastBasis = basis
      basis = orthonormalize(yRaw)
      pass += 1
    }
    // Rayleigh–Ritz in span(lastBasis) (orthonormal for pass ≥ 1):
    // M = lastBasisᵀ · y where y = A·lastBasis; symmetrize against
    // float dust before the Jacobi sweep
    val small = Array.tabulate(l, l) { (a, b) =>
      (0 until dim).map(i => lastBasis(i)(a) * y(i)(b)).sum
    }
    val sym = Array.tabulate(l, l)((a, b) => (small(a)(b) + small(b)(a)) / 2)
    val (vals, u) = jacobiEigen(sym)
    // expose only the k REQUESTED components: the oversample tail's
    // Ritz directions are low-accuracy scaffolding, not axes a caller
    // should project on
    val comps = (0 until math.min(k, l)).map { c =>
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var a = 0
        var s = 0.0
        while (a < l) { s += lastBasis(i)(a) * u(c)(a); a += 1 }
        v(i) = s
        i += 1
      }
      // unit-norm + the PcaModel sign convention
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val vn = if (nrm > 0) v.map(_ / nrm) else v
      val mx = vn.indices.maxBy(i => (math.abs(vn(i)), -i))
      if (vn(mx) < 0.0) vn.map(x => -x) else vn
    }.toArray
    // trace of A = E[‖x‖²]/1 (uncentered) or minus ‖μ‖² (centered) —
    // the honest varianceExplained denominator for a truncated model
    val trace = ssq / n -
      (if (center) mean.map(x => x * x).sum else 0.0)
    PcaModel(dim, n, mean, vals.take(comps.length), comps,
      centered = center, totalVariance = Some(trace))
  }

  /** Modified Gram–Schmidt (two passes for stability) over the COLUMNS
    * of a d×l matrix; a numerically-dead column (rank-deficient input)
    * is zeroed rather than blown up — Rayleigh–Ritz then reports ~0
    * eigenvalues for the missing directions.
    */
  private def orthonormalize(y: Array[Array[Double]])
      : Array[Array[Double]] = {
    val d = y.length
    val l = if (d == 0) 0 else y(0).length
    val q = Array.tabulate(d, l)((i, j) => y(i)(j))
    var rep = 0
    while (rep < 2) {
      var j = 0
      while (j < l) {
        var p = 0
        while (p < j) {
          var dot = 0.0
          var i = 0
          while (i < d) { dot += q(i)(p) * q(i)(j); i += 1 }
          i = 0
          while (i < d) { q(i)(j) -= dot * q(i)(p); i += 1 }
          p += 1
        }
        var nrm = 0.0
        var i = 0
        while (i < d) { nrm += q(i)(j) * q(i)(j); i += 1 }
        nrm = math.sqrt(nrm)
        i = 0
        if (nrm > 1e-12) while (i < d) { q(i)(j) /= nrm; i += 1 }
        else while (i < d) { q(i)(j) = 0.0; i += 1 }
        j += 1
      }
      rep += 1
    }
    q
  }

  // ---------------------------------------------------------------------
  // Quantized fixed-point PCA — the l44p/l48p PORTABLE sibling
  // (verdict item 4): the l31 discipline applied to the eigensolve.
  // The exact [[fit]] (cyclic Jacobi on doubles) has no SQL mirror by
  // nature; this sibling computes the top-k axes by FIXED-POINT POWER
  // ITERATION WITH DEFLATION over the exact INTEGER moment sums — every
  // operation is int64 multiply/add/truncating-divide, so DuckDB
  // replays the whole fit bit-exactly from its own l43 moment mirror
  // (unrolled CTEs, [[quantizedOracleCtes]]). Accuracy is the trade:
  // components carry ~QF precision and truncated deflation compounds
  // across components (PcaSpec pins alignment with the exact solve on
  // a decaying spectrum); [[fit]] stays the production eigensolve.
  // ---------------------------------------------------------------------

  /** Fixed-point scale of quantized component entries (and of the
    * power-iteration renormalization). */
  val QF: Long = 1L << 15

  /** Moment-matrix rescale target: entries are truncated so
    * |m| ≤ ~2^22, keeping every later product inside int64 (both
    * engines' BIGINT ops fail LOUDLY on overflow — Scala uses
    * multiplyExact/addExact, DuckDB errors — so the envelope is a
    * guarded contract, not a silent wrap). */
  private val QRescale: Long = 1L << 22

  final case class QuantizedPca(dim: Int, k: Int,
                                components: Array[Array[Long]],
                                eigenvaluesScaled: Array[Long])

  /** Truncate-toward-zero division — what Scala/Java `/` already does;
    * named so the SQL mirrors (Spark DIV truncates, DuckDB `//` floors
    * and needs the CASE trick) stay visibly in lockstep with it. */
  private def tdiv(a: Long, b: Long): Long = a / b

  /** Top-k axes of the UNCENTERED second-moment matrix by integer
    * power iteration: one exact distributed moment pass, then a pure
    * int64 driver loop (see object-level comment). Deterministic under
    * any partitioning — the moments are exact integers and everything
    * after is integer arithmetic in a fixed order.
    */
  def fitQuantized(df: DataFrame, vecCol: String, dim: Int, k: Int,
                   iters: Int, digits: Int = 6): QuantizedPca =
    quantizedFromMoments(momentSums(df, vecCol, dim, digits).collect(),
      dim, k, iters)

  def quantizedFromMoments(rows: Array[org.apache.spark.sql.Row],
                           dim: Int, k: Int, iters: Int): QuantizedPca = {
    require(rows.nonEmpty, "quantized PCA fit on an empty dataset")
    val sRaw = Array.ofDim[Long](dim, dim)
    rows.foreach { r =>
      val i = r.getLong(r.fieldIndex("i")).toInt
      val j = r.getLong(r.fieldIndex("j")).toInt
      val sxy = r.getLong(r.fieldIndex("sxy"))
      sRaw(i)(j) = sxy; sRaw(j)(i) = sxy
    }
    val maxAbs = sRaw.flatten.map(math.abs).max
    val r0 = tdiv(maxAbs, QRescale) + 1L
    val m = sRaw.map(_.map(tdiv(_, r0)))
    val comps = Array.ofDim[Long](k, dim)
    val eigs = new Array[Long](k)
    for (c <- 0 until k) {
      var v = Array.fill(dim)(QF)
      var u = new Array[Long](dim)
      for (_ <- 1 to iters) {
        u = Array.tabulate(dim) { i =>
          var acc = 0L
          var j = 0
          while (j < dim) {
            acc = Math.addExact(acc, Math.multiplyExact(m(i)(j), v(j)))
            j += 1
          }
          acc
        }
        val nrm = u.map(math.abs).max
        val den = math.max(1L, tdiv(nrm, QF))
        v = u.map(tdiv(_, den))
      }
      // Rayleigh quotient in the rescaled-moment scale, computed with
      // the SAME truncation order the mirror unrolls: uh = u/QF per
      // element first, then the integer sums, then one division.
      val num = v.zip(u.map(tdiv(_, QF)))
        .foldLeft(0L) { case (a, (x, y)) =>
          Math.addExact(a, Math.multiplyExact(x, y)) }
      val den2 = v.foldLeft(0L)((a, x) =>
        Math.addExact(a, Math.multiplyExact(x, x)))
      val lam = tdiv(num, math.max(1L, tdiv(den2, QF)))
      comps(c) = v
      eigs(c) = lam
      // Hotelling deflation, truncated: m -= (lam·v·vᵀ) / (vᵀv)
      if (c < k - 1 && den2 > 0) {
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) {
            m(i)(j) = Math.subtractExact(m(i)(j),
              tdiv(Math.multiplyExact(Math.multiplyExact(lam, v(i)),
                v(j)), den2))
            j += 1
          }
          i += 1
        }
      }
    }
    QuantizedPca(dim, k, comps, eigs)
  }

  /** Quantize a vector column exactly as [[momentSums]] does —
    * ⌊x·10^digits⌉ as BIGINT — shared by the quantized projection and
    * its mirror so the two quantizations cannot drift. */
  def quantizeVecExpr(vecCol: String, digits: Int = 6): Column =
    expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"${math.pow(10, digits)}, 0) AS BIGINT))")

  /** Fully-integer projection onto the quantized axes: one posexplode
    * + a broadcast join with the k·dim component table + a combinable
    * (id, c) sum — codegen the whole way, no per-element lambdas.
    * Output (idCol, c, coord), coord = Σ_i ⌊x_i·10^digits⌉·q_ci —
    * exact BIGINTs, hash-stable under any partitioning.
    *
    * Exactness is GUARDED, not assumed: the driver-side fit already
    * fails loudly on int64 overflow (multiplyExact), but the
    * distributed qx·w products and their sum would wrap SILENTLY under
    * non-ANSI long arithmetic while the DuckDB mirror errors loudly —
    * a silent engine divergence. The guard bounds every |qx| by
    * Long.MaxValue / (dim · max|w|), which makes each product AND the
    * ≤dim-term sum provably in-range (|Σ qx·w| ≤ dim·max|qx|·max|w|),
    * independent of `spark.sql.ansi.enabled`; an out-of-envelope input
    * raises with the offending value instead of diverging.
    */
  def projectQuantized(df: DataFrame, q: QuantizedPca, idCol: String,
                       vecCol: String, digits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val compRows = for {
      c <- 0 until q.k; i <- 0 until q.dim
    } yield (c.toLong, i.toLong, q.components(c)(i))
    val comp = spark.createDataset(compRows).toDF("c", "i", "w")
    val maxW = math.max(1L,
      q.components.iterator.flatten.map(math.abs).max)
    val qxLimit = (BigInt(Long.MaxValue) /
      (BigInt(math.max(1, q.dim)) * BigInt(maxW))).toLong
    val qxGuarded = when(abs(col("qx")) <= lit(qxLimit), col("qx"))
      .otherwise(raise_error(format_string(
        "projectQuantized: |qx|=%s exceeds the exact int64 envelope " +
          s"$qxLimit (dim=${q.dim}, max|w|=$maxW, digits=$digits) — " +
          "the quantized sum would overflow; lower digits or rescale " +
          "the vectors", col("qx"))).cast("long"))
    df.select(col(idCol),
        posexplode(quantizeVecExpr(vecCol, digits)).as(Seq("i", "qx")))
      .withColumn("qx", qxGuarded)
      .join(broadcast(comp), Seq("i"))
      .groupBy(idCol, "c")
      .agg(sum(col("qx") * col("w")).as("coord"))
  }

  private def duckTrunc(num: String, den: String): String =
    s"(CASE WHEN ($num) >= 0 THEN ($num) // ($den) " +
      s"ELSE -((-($num)) // ($den)) END)"

  /** The unrolled DuckDB replay of [[quantizedFromMoments]] on
    * `table`.`vecCol`: CTE chain ending in `qcomp(c, i, w)` — the
    * quantized component table, bit-identical to the Spark fit because
    * every step is the same int64 op in the same order. Size: ~k·(2·
    * iters + 4) CTEs over ≤ dim²-row tables (the l31 unrolled-training
    * discipline at PCA's design point).
    */
  def quantizedOracleCtes(table: String, vecCol: String, dim: Int,
                          k: Int, iters: Int,
                          digits: Int = 6): String = {
    val head =
      s"""qmom AS MATERIALIZED (${momentSumsOracleSql(table, vecCol,
           dim, digits)}),
        #qsf AS (SELECT i, j, sxy FROM qmom
        #  UNION ALL SELECT j, i, sxy FROM qmom WHERE i <> j),
        #qr0 AS (SELECT (max(abs(sxy)) // $QRescale) + 1 AS r FROM qsf),
        #qm_0 AS MATERIALIZED (SELECT i, j,
        #  ${duckTrunc("sxy", "r")} AS v FROM qsf CROSS JOIN qr0)"""
        .stripMargin('#')
    val comps = (0 until k).map { c =>
      val v0 =
        s"""qv_${c}_0 AS (SELECT CAST(r.i AS BIGINT) AS i,
           #  CAST($QF AS BIGINT) AS x FROM range(0, $dim) r(i))"""
          .stripMargin('#')
      val its = (1 to iters).map { t =>
        s"""qu_${c}_$t AS MATERIALIZED (SELECT m.i,
           #  CAST(sum(m.v * v.x) AS BIGINT) AS u
           #  FROM qm_$c m JOIN qv_${c}_${t - 1} v ON v.i = m.j
           #  GROUP BY m.i),
           #qn_${c}_$t AS (SELECT GREATEST(CAST(1 AS BIGINT),
           #  max(abs(u)) // $QF) AS d FROM qu_${c}_$t),
           #qv_${c}_$t AS MATERIALIZED (SELECT i,
           #  ${duckTrunc("u", "d")} AS x
           #  FROM qu_${c}_$t CROSS JOIN qn_${c}_$t)"""
          .stripMargin('#')
      }
      val ray =
        s"""qray_$c AS (SELECT
           #  CAST(sum(v.x * ${duckTrunc("u.u", QF.toString)})
           #    AS BIGINT) AS num,
           #  CAST(sum(v.x * v.x) AS BIGINT) AS den
           #  FROM qu_${c}_$iters u JOIN qv_${c}_$iters v USING (i)),
           #qlam_$c AS (SELECT ${duckTrunc("num",
                s"GREATEST(CAST(1 AS BIGINT), den // $QF)")} AS lam,
           #  den FROM qray_$c)"""
          .stripMargin('#')
      val defl =
        if (c == k - 1) Seq.empty
        else Seq(
          s"""qm_${c + 1} AS MATERIALIZED (SELECT m.i, m.j,
             #  CASE WHEN l.den > 0 THEN m.v -
             #    ${duckTrunc("l.lam * a.x * b.x", "l.den")}
             #  ELSE m.v END AS v
             #  FROM qm_$c m JOIN qv_${c}_$iters a ON a.i = m.i
             #  JOIN qv_${c}_$iters b ON b.i = m.j
             #  CROSS JOIN qlam_$c l)"""
            .stripMargin('#'))
      (Seq(v0) ++ its ++ Seq(ray) ++ defl).mkString(",\n")
    }
    val compUnion = (0 until k).map(c =>
      s"SELECT CAST($c AS BIGINT) AS c, i, x AS w FROM qv_${c}_$iters")
      .mkString("\n  UNION ALL ")
    (Seq(head) ++ comps ++ Seq(s"qcomp AS ($compUnion)")).mkString(",\n")
  }

  /** Map-only projection of `vecCol` onto the first `k` principal axes:
    * out(c) = vec_dot(x, comp_c) − ⟨mean, comp_c⟩ (the centering dot is a
    * driver-side constant — and zero for an uncentered model, so the
    * dot-product geometry survives), so the per-row work is k compiled
    * dot loops — no per-element lambdas, no shuffle. Output column
    * `outCol` is array<double> of length k.
    */
  def project(df: DataFrame, model: PcaModel, k: Int,
              vecCol: String, outCol: String = "proj"): DataFrame = {
    require(k <= model.components.length,
      s"k=$k > the model's ${model.components.length} components " +
        s"(dim=${model.dim}; a randomized fit carries only its " +
        "requested k)")
    val xd = expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))")
    val comps = (0 until k).map { c =>
      val comp = model.components(c)
      val center =
        if (!model.centered) 0.0
        else comp.zip(model.mean).map { case (w, mu) => w * mu }.sum
      call_function("vec_dot", xd, lit(comp)) - lit(center)
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
