package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide duplicated-span detection via PREFIX DOUBLING — the
  * suffix-array rank construction (Manber–Myers) expressed as dataflow,
  * applied to the Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better") problem: find every corpus position whose
  * suffix shares a long prefix with a suffix in ANOTHER document,
  * without committing to a fixed n-gram width up front.
  *
  * Relation to the fixed-n forms ([[Dedup.dupSpanRemoval]], l23): a
  * fixed n answers "is this exact n-window duplicated?" — one pass, but
  * n is a design-time guess. Prefix doubling answers "how LONG is the
  * longest duplicated prefix at this position?" on a power-of-two grid
  * {1, 2, 4, ..., horizon} in ⌈log2(horizon)⌉ rounds, and stops EARLY
  * the round all suffix ranks become distinct — so the round count is
  * data-adaptive: ⌈log2(longest repeat + 1)⌉, not log2(corpus length).
  * A corpus whose longest cross-doc repeat is 100 tokens finishes in 7
  * rounds regardless of whether it is 1 GB or 100 TB.
  *
  * Scale shape (the reason this is dataflow and not a single-node
  * suffix array): every round is (a) one distinct + range-partitioned
  * sort + zipWithIndex to assign dense ranks ([[Gold.orderedId]] — no
  * global window), and (b) two hash joins on (doc, pos) / (rank, rank)
  * 8-byte-class keys. State is always (position → rank), linear in the
  * corpus; a hot rank group (site boilerplate) is a large AGGREGATION
  * group — O(group), never the O(group²) a pair join would pay, so the
  * boilerplate skew that kills naive n-gram pair generation (RISKS
  * row 1) costs only its row count here. Rounds are driver-paced like
  * Bpe.train: ≤ log2(horizon) bounded iterations, one early-stop
  * isEmpty action each.
  */
object SuffixArray {

  /** (doc, pos, tok): 1-based positions over whitespace tokens — the
    * l23 tokenization so the two span families agree on positions. */
  private def tokens(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        posexplode(expr(
          s"filter(split($textCol, ' '), t -> length(t) > 0)"))
          .as(Seq("pos0", "tok")))
      .select(col("doc"), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))

  /** Per-document duplicated-span summary on the power-of-two grid.
    *
    * For each position p, span(p) = the largest ℓ = min(2^k, suffix
    * length) with 2^k ≤ horizon such that the first ℓ tokens of p's
    * suffix also open a suffix in a DIFFERENT document (the l23
    * cross-doc contract). Clamping to the suffix length keeps the
    * reported span an actual token count — a duplicated 3-token
    * document tail reports 3, not the round's 2^k. The grid value is a
    * lower bound within 2× of the true maximal duplicated prefix
    * (binary search between grid points is the refinement lever; the
    * grid is what the dedup decision needs).
    *
    * Output: (doc_id, n_tokens, max_dup_span, n_dup_pos_8,
    * n_dup_pos_32) — one row per input document, zero-filled for
    * documents with no duplicated span (or no tokens).
    *
    * Rank-tie ⇔ window-equality invariant (what the DuckDB mirror
    * replays): two positions share a round-k rank iff their suffixes'
    * first min(2^k, remaining) tokens are equal AND both clamp at the
    * same length — exactly string equality of the space-joined clamped
    * window, because round 0 ranks by token value and each doubling
    * appends the rank 2^(k-1) ahead (sentinel 0 when no such position,
    * and 0 < every assigned rank).
    */
  def gridDupSpans(docs: DataFrame, idCol: String, textCol: String,
                   horizon: Int = 64): DataFrame =
    gridDupSpansWithRounds(docs, idCol, textCol, horizon)._1

  /** [[gridDupSpans]] plus the number of doubling rounds actually run —
    * the data-adaptivity evidence the scale probes record (rounds =
    * ⌈log2(longest cross-doc repeat)⌉ + 1 with early stop, vs the full
    * log2(horizon) + 1 only when long repeats exist). */
  def gridDupSpansWithRounds(docs: DataFrame, idCol: String,
                             textCol: String,
                             horizon: Int = 64): (DataFrame, Int) = {
    require(horizon >= 1 && (horizon & (horizon - 1)) == 0,
      s"horizon must be a power of two, got $horizon")
    val tk = tokens(docs, idCol, textCol).localCheckpoint()
    val lens = tk.groupBy("doc").agg(count(lit(1)).as("n")).localCheckpoint()

    var ranks = tk
      .join(Gold.orderedId(tk.select("tok").distinct(), Seq("tok"), "r"),
        "tok")
      .select(col("doc"), col("pos"), col("r"))
      .localCheckpoint()

    var spans: DataFrame = null
    var s = 1L
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      // only CROSS-doc tied groups matter for both flagging and the
      // early stop: groups can only split as rounds double, so once no
      // rank group spans two documents none ever will again
      val cross = ranks.groupBy("r")
        .agg(count(lit(1)).as("cnt"), min("doc").as("dmin"),
          max("doc").as("dmax"))
        .filter(col("cnt") >= 2 && col("dmin") =!= col("dmax"))
        .select("r")
        .localCheckpoint()
      val flagged = ranks
        .join(cross, "r")
        .join(lens, "doc")
        .select(col("doc"), col("pos"),
          least(lit(s), col("n") - col("pos") + 1L).as("span"))
      spans = if (spans == null) flagged else spans.unionByName(flagged)
      if (cross.isEmpty || s >= horizon) done = true
      else {
        // rank 2^(k-1) ahead, materialized by SHIFTING the rank table
        // back by s so the combine is one equi-join on (doc, pos)
        val ahead = ranks.select(col("doc"), (col("pos") - s).as("pos"),
          col("r").as("r2"))
        val keyed = ranks.join(ahead, Seq("doc", "pos"), "left")
          .na.fill(0L, Seq("r2"))
        val rid = Gold.orderedId(keyed.select("r", "r2").distinct(),
          Seq("r", "r2"), "rn")
        ranks = keyed.join(rid, Seq("r", "r2"))
          .select(col("doc"), col("pos"), col("rn").as("r"))
          .localCheckpoint()
        s *= 2
      }
    }

    val perPos = spans.groupBy("doc", "pos").agg(max("span").as("span"))
    val perDoc = perPos.groupBy("doc").agg(
      max("span").as("max_dup_span"),
      sum(when(col("span") >= 8, 1L).otherwise(0L)).as("n_dup_pos_8"),
      sum(when(col("span") >= 32, 1L).otherwise(0L)).as("n_dup_pos_32"))
    val out = docs.select(col(idCol).as("doc")).distinct()
      .join(lens, Seq("doc"), "left")
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        coalesce(col("max_dup_span"), lit(0L)).as("max_dup_span"),
        coalesce(col("n_dup_pos_8"), lit(0L)).as("n_dup_pos_8"),
        coalesce(col("n_dup_pos_32"), lit(0L)).as("n_dup_pos_32"))
    (out, rounds)
  }
}
