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

  /** Quality scoring shared by both quota forms: `n_tokens` =
    * whitespace token count, `quality` = distinct-token count (lexical
    * diversity) — both exact integers, so every downstream decision is
    * cross-engine reproducible. Public so scale probes can feed
    * synthetic pre-scored frames straight to [[quotaExact]] /
    * [[quotaHistogram]] without measuring the scorer.
    */
  def scoreDocs(df: DataFrame, sourceCol: String, idCol: String,
                textCol: String): DataFrame =
    df.select(col(sourceCol), col(idCol),
      TextAnalysis.tokenCount(textCol).as("n_tokens"),
      expr("size(array_distinct(filter(split(" + textCol +
        ", ' '), t -> length(t) > 0)))").cast("long").as("quality"))

  /** Exact quota form over a pre-scored frame: rank documents within
    * each source by (`quality` desc, `idCol`) and keep the ranked
    * prefix whose cumulative token count fits `budgetPerSource`. The
    * window partitions by source, so every source ranks in parallel;
    * a single giant source collapses into one window task — that case
    * is [[quotaHistogram]]'s job, with this form as its oracle.
    */
  def quotaExact(scored: DataFrame, sourceCol: String, idCol: String,
                 budgetPerSource: Long): DataFrame = {
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("quality").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kept", col("cum_tokens") <= budgetPerSource)
  }

  /** Per-source quality-quota selection: within each source, rank
    * documents by a quality score (lexical diversity: distinct
    * whitespace tokens, descending; `idCol` breaks ties) and keep the
    * ranked prefix whose cumulative token count fits `budgetPerSource` —
    * greedy quality-first data mixing under per-domain token quotas.
    * Exact windowed form; [[qualityQuotaSelectHistogram]] makes the
    * same decisions without a per-source global sort.
    */
  def qualityQuotaSelect(df: DataFrame, sourceCol: String, idCol: String,
                         textCol: String,
                         budgetPerSource: Long): DataFrame =
    quotaExact(scoreDocs(df, sourceCol, idCol, textCol), sourceCol,
      idCol, budgetPerSource)

  /** Scale form of [[quotaExact]]: identical `kept` decisions computed
    * through a per-(source, quality) token histogram instead of a
    * per-source global ordered window — the x12p histogram trick the
    * exact form's scaladoc promises. Shape:
    *
    *  1. histogram: one map-side-combinable `groupBy(source, quality)`
    *     over the scored docs (quality is an exact integer, so buckets
    *     need no binning and the histogram is lossless);
    *  2. per-source exclusive cumulative tokens by descending quality —
    *     a window over the HISTOGRAM, whose per-source row count is
    *     bounded by the distinct quality values, not the corpus;
    *  3. classify each bucket: fully under budget → every doc kept;
    *     cumulative-before strictly over budget → every doc dropped
    *     (both decided WITHOUT any ordered window over docs);
    *  4. only the straddling edge bucket (≤1 per source, plus the
    *     zero-token boundary case) pays an ordered window — and that
    *     window partitions by (source, quality), so even a pathological
    *     single-source corpus never collapses into one task the way the
    *     exact form's per-source window does.
    *
    * Returns (sourceCol, idCol, n_tokens, quality, kept) — no global
    * rank/cum columns, which is exactly why it scales. Equality of the
    * `kept` flags with the exact form (ties, zero-token docs, all three
    * bucket classes) is pinned by CorpusAssemblySpec.
    */
  def quotaHistogram(scored: DataFrame, sourceCol: String, idCol: String,
                     budgetPerSource: Long): DataFrame =
    quotaFromHistogram(scored,
      scored.groupBy(sourceCol, "quality")
        .agg(sum("n_tokens").as("__bucket_tokens")),
      sourceCol, idCol, budgetPerSource)

  /** [[quotaHistogram]] with the (source, quality) token histogram
    * supplied by the CALLER instead of recomputed from `scored` — the
    * entry point for a histogram maintained incrementally (the
    * streaming sink merges per-batch histograms by addition; the
    * decision pass then only consults the corpus for doc-level
    * columns). `hist` must carry (sourceCol, quality, __bucket_tokens)
    * and must be the exact histogram OF `scored` for the kept flags to
    * equal the one-shot form.
    */
  def quotaFromHistogram(scored: DataFrame, hist: DataFrame,
                         sourceCol: String, idCol: String,
                         budgetPerSource: Long): DataFrame = {
    val wq = Window.partitionBy(sourceCol).orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = hist
      .withColumn("__cum_before",
        coalesce(sum("__bucket_tokens").over(wq), lit(0L)))
      .withColumn("__cls",
        when(col("__cum_before") + col("__bucket_tokens") <=
          budgetPerSource, lit("keep"))
        .when(col("__cum_before") > budgetPerSource, lit("drop"))
        .otherwise(lit("edge")))
      .select(col(sourceCol), col("quality"), col("__cum_before"),
        col("__cls"))
    val joined = scored.join(buckets, Seq(sourceCol, "quality"))
    val decided = joined.filter(col("__cls") =!= "edge")
      .withColumn("kept", col("__cls") === "keep")
    val wEdge = Window.partitionBy(sourceCol, "quality").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val edge = joined.filter(col("__cls") === "edge")
      .withColumn("kept", col("__cum_before") +
        sum("n_tokens").over(wEdge) <= budgetPerSource)
    decided.unionByName(edge)
      .select(col(sourceCol), col(idCol), col("n_tokens"), col("quality"),
        col("kept"))
  }

  /** [[qualityQuotaSelect]]'s decisions through [[quotaHistogram]] —
    * the form that survives a single giant source. */
  def qualityQuotaSelectHistogram(df: DataFrame, sourceCol: String,
                                  idCol: String, textCol: String,
                                  budgetPerSource: Long): DataFrame =
    quotaHistogram(scoreDocs(df, sourceCol, idCol, textCol), sourceCol,
      idCol, budgetPerSource)
}
