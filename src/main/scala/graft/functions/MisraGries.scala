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
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, MisraGries.Buf, MisraGries.Buf] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: MisraGries.Buf = MisraGries.Buf(Map.empty, 0L)

  override def reduce(b: MisraGries.Buf, t: String): MisraGries.Buf = {
    val counts = b.counts
    val next =
      if (counts.contains(t)) counts.updated(t, counts(t) + 1L)
      else if (counts.size < capacity) counts.updated(t, 1L)
      else counts.flatMap { case (k, v) =>
        if (v > 1L) Some(k -> (v - 1L)) else None
      }
    MisraGries.Buf(next, b.n + 1L)
  }

  override def merge(a: MisraGries.Buf, b: MisraGries.Buf): MisraGries.Buf = {
    val sum = b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    val trimmed =
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest counter from every entry
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)
          .apply(capacity)
        sum.flatMap { case (k, v) =>
          if (v > cut) Some(k -> (v - cut)) else None
        }
      }
    MisraGries.Buf(trimmed, a.n + b.n)
  }

  override def finish(b: MisraGries.Buf): MisraGries.Buf = b

  override def bufferEncoder: Encoder[MisraGries.Buf] =
    Encoders.kryo[MisraGries.Buf]

  override def outputEncoder: Encoder[MisraGries.Buf] =
    Encoders.kryo[MisraGries.Buf]
}

object MisraGries {
  /** counter map (<= capacity entries) + total items processed */
  case class Buf(counts: Map[String, Long], n: Long)
}
