package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: a Misra–Gries frequent-items summary (Misra &
  * Gries 1982; merge rule from Agarwal et al. 2013, "Mergeable
  * Summaries", PODS) over a token stream.
  *
  * The buffer holds at most `capacity` (term -> counter) entries plus
  * the total item count n. Reduce: increment a present term; insert at
  * count 1 if there is room; otherwise decrement EVERY counter by one
  * (dropping zeros) — the classic k-way cancellation. Merge: add the
  * two counter maps, then if over capacity subtract the (capacity+1)-th
  * largest counter from all and drop non-positives.
  *
  * Guarantees (both partition-order and merge-order INDEPENDENT, even
  * though the counter values themselves are not):
  *
  *  - counter(t) <= true_freq(t) <= counter(t) + n/(capacity+1);
  *  - every term with true_freq > n/(capacity+1) is IN the summary
  *    (no false negatives above the threshold).
  *
  * Because counter values depend on arrival order, the summary is a
  * CANDIDATE set, not an answer: [[graft.operators.TextAnalysis
  * .heavyHitters]] re-counts the <= capacity candidates exactly in a
  * second bounded pass, which makes the final output deterministic and
  * lets a plain SQL GROUP BY/HAVING oracle check it (x18).
  *
  * State is bounded by `capacity` — this is the 100 TB path for "top
  * terms over the corpus" where a full-vocabulary shuffle (l18's
  * shape) would move billions of distinct keys.
  *
  * The WORKING buffer ([[MisraGries.MBuf]]) is mutable — reduce runs
  * once per TOKEN of the scan, and the previous immutable-Map form
  * paid a persistent-map rebuild per token. mutable.HashMap gives an
  * allocation-free hit path for the dominant already-present-term
  * case; measured ~10-12% off the WHOLE sf5 scan pass (which is
  * scan/tokenize-dominated — the reduce-local saving is larger), both
  * at x18's capacity and under cap-12 trim pressure (SCALE_r10.md §4).
  * The FINISHED type stays the immutable [[MisraGries.Buf]] every
  * consumer reads.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, MisraGries.MBuf, MisraGries.Buf] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: MisraGries.MBuf =
    new MisraGries.MBuf(
      new scala.collection.mutable.HashMap[String, Long](capacity * 2,
        scala.collection.mutable.HashMap.defaultLoadFactor),
      0L)

  override def reduce(b: MisraGries.MBuf, t: String): MisraGries.MBuf = {
    val c = b.counts
    b.n += 1L
    val v = c.getOrElse(t, 0L) // HashMap overrides getOrElse: no Option
    if (v > 0L) c.update(t, v + 1L)
    else if (c.size < capacity) c.update(t, 1L)
    else {
      // k-way cancellation, in place: decrement all, drop zeros
      c.mapValuesInPlace((_, x) => x - 1L)
      c.filterInPlace((_, x) => x > 0L)
    }
    b
  }

  override def merge(a: MisraGries.MBuf,
                     b: MisraGries.MBuf): MisraGries.MBuf = {
    b.counts.foreachEntry { (k, v) =>
      a.counts.update(k, a.counts.getOrElse(k, 0L) + v)
    }
    if (a.counts.size > capacity) {
      // subtract the (capacity+1)-th largest counter from every entry
      val cut = a.counts.valuesIterator.toArray
        .sorted(Ordering[Long].reverse).apply(capacity)
      a.counts.filterInPlace((_, v) => v > cut)
      a.counts.mapValuesInPlace((_, v) => v - cut)
    }
    a.n += b.n
    a
  }

  override def finish(b: MisraGries.MBuf): MisraGries.Buf =
    MisraGries.Buf(b.counts.toMap, b.n)

  /** The PODS merge over two FINISHED summaries — the streaming-state
    * path (StreamOps merges a persisted summary with each micro-batch's
    * partial). Same rule as the Aggregator-internal merge.
    */
  def merge(a: MisraGries.Buf, b: MisraGries.Buf): MisraGries.Buf =
    finish(merge(MisraGries.toMutable(a), MisraGries.toMutable(b)))

  override def bufferEncoder: Encoder[MisraGries.MBuf] =
    Encoders.kryo[MisraGries.MBuf]

  override def outputEncoder: Encoder[MisraGries.Buf] =
    Encoders.kryo[MisraGries.Buf]
}

object MisraGries {
  /** counter map (<= capacity entries) + total items processed */
  case class Buf(counts: Map[String, Long], n: Long)

  /** Mutable working buffer: in-place counters + running total. */
  final class MBuf(val counts: scala.collection.mutable.HashMap[String, Long],
                   var n: Long)

  private def toMutable(b: Buf): MBuf = {
    val m = scala.collection.mutable.HashMap.from(b.counts)
    new MBuf(m, b.n)
  }
}
