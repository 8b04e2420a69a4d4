package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored retrieval hit: the per-(query, doc) BM25 record the
  * bounded top-k ranks. `D` is the doc-id type (Long / Int / String in
  * practice — whatever the corpus id column carries).
  */
final case class TopDoc[D](score: Double, doc: D, dl: Long,
                           nMatched: Long)

/** Typed Aggregator: bounded mergeable top-k by (score desc, doc asc) —
  * the [[MisraGries]]/[[KmvSketch]] bounded-summary pattern applied to
  * ranking. Each partial aggregate holds at most ~4k entries (compacted
  * back to k whenever the slack fills), partials MERGE by concat +
  * compact, and `finish` emits the exact top k in rank order.
  *
  * Unlike a sketch, this summary is EXACT: top-k under a total order is
  * itself a mergeable aggregation (the true top k of a union is always
  * contained in the union of per-part top ks), so bounding the state
  * loses nothing. Determinism: scores are compared bit-for-bit (the
  * BM25 scores feeding this are bit-identical by construction) and ties
  * break on the doc ordering, so the output matches
  * `row_number() OVER (ORDER BY score DESC, doc)` exactly.
  *
  * This is the 100 TB shape for per-key ranking: a window
  * `partitionBy(query_id)` over the scored stream funnels each query's
  * ENTIRE matched-doc set (billions of rows for a common-term query)
  * into one task, where this aggregator moves at most
  * partitions * k rows per query through the final shuffle and keeps
  * O(k) state per partial.
  */
class BoundedTopK[D: Ordering: TypeTag](k: Int)
    extends Aggregator[TopDoc[D], ArrayBuffer[TopDoc[D]], Seq[TopDoc[D]]] {
  require(k > 0, "BoundedTopK needs k > 0")

  // compaction slack: sort-and-trim amortizes to O(log k) per row
  private val slack = math.max(4 * k, 64)
  // String doc ids tie-break in UTF-8 byte (== code point) order, matching
  // Spark's ORDER BY over StringType and DuckDB's VARCHAR collation;
  // Ordering[String] would compare UTF-16 code units, which diverges for
  // supplementary-plane ids. Other id types keep their natural ordering.
  private val ordD: Ordering[D] = {
    import scala.reflect.runtime.universe.typeOf
    if (typeOf[D] =:= typeOf[String])
      BoundedTopK.codePointOrdering.asInstanceOf[Ordering[D]]
    else implicitly[Ordering[D]]
  }

  // Double.compare gives a total order (explicit NaN-greatest, -0.0 < 0.0),
  // so sortWith can't hit "comparison violates its general contract" even
  // on scores BM25 never produces. For the finite positive scores the BM25
  // fold emits it coincides with bit-for-bit > / == comparison.
  private def better(a: TopDoc[D], b: TopDoc[D]): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c > 0 else ordD.lt(a.doc, b.doc)
  }

  private def compact(b: ArrayBuffer[TopDoc[D]]): ArrayBuffer[TopDoc[D]] =
    if (b.size <= k) b
    else {
      val kept = b.sortWith(better).take(k)
      b.clear()
      b ++= kept
    }

  override def zero: ArrayBuffer[TopDoc[D]] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[TopDoc[D]],
                      in: TopDoc[D]): ArrayBuffer[TopDoc[D]] = {
    b += in
    if (b.size > slack) compact(b) else b
  }

  override def merge(a: ArrayBuffer[TopDoc[D]],
                     b: ArrayBuffer[TopDoc[D]]): ArrayBuffer[TopDoc[D]] = {
    a ++= b
    if (a.size > slack) compact(a) else a
  }

  override def finish(b: ArrayBuffer[TopDoc[D]]): Seq[TopDoc[D]] =
    b.sortWith(better).take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[TopDoc[D]]] =
    Encoders.kryo[ArrayBuffer[TopDoc[D]]]

  override def outputEncoder: Encoder[Seq[TopDoc[D]]] =
    ExpressionEncoder[Seq[TopDoc[D]]]()
}

object BoundedTopK {
  /** Unicode code-point order — identical to comparing the strings'
    * UTF-8 encodings byte-by-byte (UTF-8 preserves code-point order),
    * which is how Spark's `UTF8String.compareTo` and DuckDB's default
    * VARCHAR collation sort. Differs from `Ordering[String]` (UTF-16
    * code-unit order) only when one side contains supplementary-plane
    * characters (surrogate pairs sort below U+E000..U+FFFF in UTF-16).
    */
  val codePointOrdering: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      var i = 0
      val lx = x.length
      val ly = y.length
      while (i < lx && i < ly) {
        val cx = x.codePointAt(i)
        val cy = y.codePointAt(i)
        if (cx != cy) return Integer.compare(cx, cy)
        i += Character.charCount(cx)
      }
      Integer.compare(lx - i, ly - i)
    }
  }
}
