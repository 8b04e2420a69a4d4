package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two tiers, as a 100 TB pipeline needs both:
  *  - brute-force cosine top-k for a SMALL query set: broadcast the
  *    queries, one scan of the corpus, per-partition scoring, top-k via
  *    window. Cost O(|corpus| x |queries|) with no corpus shuffle — the
  *    right baseline, and exact.
  *  - random-hyperplane LSH bucketing for corpus-x-corpus workloads:
  *    sign-pattern buckets bound candidate generation, top-k within
  *    bucket. Probabilistic recall (SimilaritySpec pins it against
  *    brute force); never materializes all pairs.
  *
  * All arithmetic is double with an explicit left-to-right fold so the
  * DuckDB oracle (list_reduce) produces bit-identical scores.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns — the fold
    * order is the contract (matches DuckDB list_reduce in the oracle).
    * Resolves to the native codegen'd [[graft.plans.VecDot]] expression
    * (registered by GraftExtensions); same left-to-right double
    * accumulation, no intermediate array / closure dispatch.
    */
  def dot(a: String, b: String): Column = expr(s"vec_dot($a, $b)")

  def norm(a: String): Column = sqrt(dot(a, a))

  /** cosine = dot / (sqrt(aa) * sqrt(bb)), same tree as the oracle. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each row of `queries` over `corpus`.
    * Both inputs: (idCol, vecCol: array<float>). Output:
    * (q_id, rnk, n_id, cosine), deterministic ties broken by id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine("qv", "cv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded into [-0.5, 0.5). Seeds the LSH without RNG state.
    */
  private def planeComponent(plane: String, dim: String): String =
    s"(CAST(pmod(xxhash64($plane, $dim), 1000000) AS DOUBLE) / 1000000.0) - 0.5"

  /** Sign-pattern LSH bucket of a vector: bit p of the bucket id is the
    * sign of dot(vec, plane_{p + offset}) over `nPlanes` deterministic
    * hyperplanes. `offsetExpr` is a SQL expression (may reference columns)
    * selecting which plane family to use — the hook for multi-table LSH,
    * where table t hashes with planes [t*nPlanes, (t+1)*nPlanes).
    */
  def lshBucketAt(vecCol: String, nPlanes: Int,
                  offsetExpr: String): Column = expr(
    s"""aggregate(sequence(0, ${nPlanes - 1}), CAST(0 AS BIGINT), (acc, p) ->
        acc + IF(
          aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
              (x, d) -> x * (${planeComponent(s"(p + ($offsetExpr))", "d")})),
            CAST(0.0 AS DOUBLE), (s, v) -> s + v) > 0,
          CAST(power(2, p) AS BIGINT), CAST(0 AS BIGINT)))""")

  def lshBucket(vecCol: String, nPlanes: Int): Column =
    lshBucketAt(vecCol, nPlanes, "0")

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their
    * nearest of `nCells` centroid cells; a query probes its `nProbe`
    * nearest cells and runs exact cosine top-k over just those cells'
    * vectors. One corpus shuffle on cell id; centroids broadcast.
    *
    * Centroids are a deterministic pseudo-random sample: the nCells
    * corpus vectors with the smallest xxhash64(id) (a TakeOrdered, no
    * corpus count and no job at operator-construction time — the whole
    * operator stays one lazy plan). A k-means refinement would slot in
    * here without changing the query path.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val centroids = c.orderBy(xxhash64(col("n_id")), col("n_id"))
      .limit(nCells)
      .select(col("n_id").as("cell"), col("cv").as("centroid"))
    // nearest cell per corpus vector: argmax cosine over the broadcast
    // centroid set (cosine, since vectors aren't normalized)
    def nearestCells(df: DataFrame, vec: String, out: String,
                     take: Int): DataFrame = {
      val scored = df.join(broadcast(centroids))
        .withColumn("__sim", cosine(vec, "centroid"))
      val w = Window.partitionBy(df.columns.head)
        .orderBy(col("__sim").desc, col("cell"))
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= take)
        .drop("centroid", "__sim", "__r")
        .withColumnRenamed("cell", out)
    }
    val assigned = nearestCells(c, "cv", "cell", 1)
    val probed = nearestCells(q, "qv", "cell", nProbe)
    val joined = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine("qv", "cv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    // each corpus vector lives in exactly one cell, so a (q, n) pair
    // occurs at most once — no dedup needed before ranking
    joined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "cosine")
  }

  /** Embedding-cosine near-dup pairs: corpus-x-corpus, blocked by
    * MULTI-TABLE sign-pattern LSH, then EXACT cosine verifies candidates
    * at `threshold`.
    *
    * Each vector is hashed into `nTables` independent tables (table t uses
    * hyperplanes [t*nPlanes, (t+1)*nPlanes)); candidate pairs are generated
    * only within a (table, bucket) cell — never all-pairs. A pair at true
    * cosine c collides in one table with probability r^nPlanes where
    * r = 1 - acos(c)/pi, so recall = 1 - (1 - r^nPlanes)^nTables: tunable
    * to ~1 for any target threshold by adding tables, while nPlanes keeps
    * each bucket (and thus the candidate count) small. Precision is exact
    * either way — every emitted pair passed a real cosine comparison.
    *
    * Cost shape at 100 TB: the explode multiplies the corpus by nTables
    * before ONE shuffle on (table, bucket); the exact filter runs
    * within-partition before the final distinct touches only
    * above-threshold pairs. No all-pairs materialization anywhere
    * (SimilaritySpec asserts no CartesianProduct in the plan).
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int = 4,
                         nTables: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("doc"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("tbl", explode(sequence(lit(0), lit(nTables - 1))))
      .withColumn("bucket", lshBucketAt("v", nPlanes, s"tbl * $nPlanes"))
    val a = c.select(col("tbl"), col("bucket"), col("doc").as("doc_a"),
      col("v").as("va"))
    val b = c.select(col("tbl"), col("bucket"), col("doc").as("doc_b"),
      col("v").as("vb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", cosine("va", "vb"))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
      // a pair may collide in several tables; the distinct runs AFTER the
      // exact filter so only above-threshold pairs are ever shuffled
      .distinct()
  }

  /** ANN top-k: candidates limited to the query's LSH bucket, then exact
    * cosine + window top-k within bucket. One shuffle on bucket id.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket("cv", nPlanes))
    val q = queries.select(col(idCol).as("q_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket("qv", nPlanes))
    val joined = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine("qv", "cv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    joined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "cosine")
  }
}
