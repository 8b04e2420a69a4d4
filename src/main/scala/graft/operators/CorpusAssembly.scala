package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data preparation: sequence
  * packing (concat-and-chunk token binning) and per-source quality-quota
  * selection. Both are additive capabilities beyond the reference
  * (which is a sales ETL — no counterpart); they complete the
  * LLM-pipeline family in SURVEY §2.14 next to dedup/sampling/splits.
  *
  * Design rule shared by both: every per-row quantity is an exact
  * integer (token counts, cumulative sums, integer division) so results
  * are bit-identical across engines and cluster layouts — the same
  * reproducibility contract as [[TextAnalysis.splitAssign]].
  */
object CorpusAssembly {

  /** Exact global prefix sum of `valueCol` in `orderCol` order, WITHOUT
    * a global single-partition window (`sum().over(Window.orderBy(...))`
    * collapses the table into one task — fine on bounded frames, fatal
    * on an SF-scaling corpus). Shape:
    *
    *  1. range-partition on the order column (RangePartitioner keeps
    *     partition index aligned with key order);
    *  2. per-partition running sums — a PARTITIONED window, every
    *     partition parallel;
    *  3. per-partition totals (one tiny row per partition) get an
    *     exclusive-prefix offset via a window over the ≤
    *     `spark.sql.shuffle.partitions`-row totals table — bounded by
    *     construction, the x12p bucket-table argument;
    *  4. broadcast-join offsets back and add.
    *
    * Fully lazy and declarative (contrast [[Gold.orderedId]]'s
    * zipWithIndex, which pays eager construction jobs for the same
    * distribution guarantee): Catalyst keeps optimizing through it, and
    * the only global structure is the partition-totals table.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                name: String): DataFrame = {
    val parted = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLocal =
      parted.withColumn("__local", sum(col(valueCol)).over(localW))
    // partition totals come from a plain sum, NOT max(running sum) —
    // identical for non-negative values but still correct when the
    // value column can go negative (running sums aren't monotonic then)
    val offsets = parted.groupBy("__pid")
      .agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__offset", coalesce(
        sum("__psum").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(name, col("__local") + col("__offset"))
      .drop("__pid", "__local")
  }

  /** Sequence packing, concat-and-chunk style: documents are laid out in
    * deterministic `idCol` order, token counts accumulate, and the token
    * stream is cut into fixed-`budget` bins — how training pipelines
    * pack variable-length documents into fixed-length sample sequences.
    * A document belongs to the bin its FIRST token lands in;
    * `straddles_next` marks documents whose last token falls in a later
    * bin (the cross-boundary fragments a loader would split or mask).
    *
    * All arithmetic is exact-integer (whitespace token counts, prefix
    * sums, `div`), so bin assignment is reproducible on any engine or
    * cluster layout. The global cumsum runs through [[prefixSum]] — no
    * single-partition window at any SF.
    */
  def sequencePack(df: DataFrame, idCol: String, textCol: String,
                   budget: Long): DataFrame = {
    val toks = df.select(col(idCol),
      TextAnalysis.tokenCount(textCol).as("n_tokens"))
    prefixSum(toks, idCol, "n_tokens", "cum_tokens")
      .withColumn("bin",
        expr(s"(cum_tokens - n_tokens) div ${budget}L"))
      .withColumn("straddles_next",
        col("n_tokens") > 0 &&
          expr(s"(cum_tokens - 1) div ${budget}L") > col("bin"))
  }

  /** Per-source quality-quota selection: within each source, rank
    * documents by a quality score (lexical diversity: distinct
    * whitespace tokens, descending; `idCol` breaks ties) and keep the
    * ranked prefix whose cumulative token count fits `budgetPerSource` —
    * greedy quality-first data mixing under per-domain token quotas.
    *
    * The window partitions by source, so every source ranks in
    * parallel; the scale risk is a single giant source, and the scale
    * path there is the x12p histogram trick — build a per-source
    * quality histogram (mergeable, O(buckets) state), find the quality
    * threshold where the cumulative token count crosses the budget, and
    * FILTER on it (one map-side pass, no ordered window) — the exact
    * windowed form below stays the oracle for that rewrite.
    */
  def qualityQuotaSelect(df: DataFrame, sourceCol: String, idCol: String,
                         textCol: String,
                         budgetPerSource: Long): DataFrame = {
    val scored = df.select(col(sourceCol), col(idCol),
      TextAnalysis.tokenCount(textCol).as("n_tokens"),
      expr("size(array_distinct(filter(split(" + textCol +
        ", ' '), t -> length(t) > 0)))").cast("long").as("quality"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("quality").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kept", col("cum_tokens") <= budgetPerSource)
  }
}
