package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): a `depth` x `width`
  * grid of counters. Each item (pre-hashed to a long `h`, the engine's
  * codegen'd poly_hash) increments one counter per row at
  * `bucket_r(h) = ((h * A_r + B_r) mod P) mod width`; the point
  * estimate for an item is the MIN of its `depth` counters.
  *
  * Why it earns a slot next to Misra-Gries (x18): CM is a LINEAR
  * sketch — grids add elementwise — so the state is merge-order and
  * partition-order INDEPENDENT (bit-deterministic under any
  * parallelism, no re-count pass needed), micro-batch folds are exact
  * (the streaming form is sum-of-grids), and point queries work for
  * ANY item, not only items the summary retained. The price is the
  * two-sided trade: est >= true always (collisions only inflate), and
  * est <= true + 2n/width per row with probability >= 1/2 per row
  * (Markov), so P(est > true + 2n/width) <= 2^-depth.
  *
  * State is `depth * width` longs regardless of corpus size — the
  * 100 TB path for ad-hoc frequency point queries where the exact
  * l18-style vocabulary shuffle moves billions of distinct keys.
  *
  * The row-hash family is portable affine arithmetic over poly_hash
  * (exact BIGINT both engines evaluate verbatim: h < 2^31, A_r < P =
  * 2147483629 < 2^31, so h*A_r + B_r < 2^62), which is what lets the
  * l51 DuckDB oracle mirror every counter and hash-match the
  * estimates.
  */
class CountMin(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1,
    s"CountMin needs depth >= 1 and width >= 1, got $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < depth) {
      b(r * width + CountMin.bucket(h, r, width).toInt) += 1L
      r += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = CountMin.enc
  override def outputEncoder: Encoder[Array[Long]] = CountMin.enc
}

object CountMin {
  /** Largest prime below 2^31 that keeps h*A+B inside a long. */
  val P = 2147483629L

  private[graft] val enc: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  def aCoef(r: Int): Long = ((r + 1).toLong * 2654435761L) % P
  def bCoef(r: Int): Long = r.toLong * 40503L + 7L

  /** Row-r bucket of pre-hashed item `h` — exact integer arithmetic. */
  def bucket(h: Long, r: Int, width: Int): Long =
    ((((h % P) + P) % P * aCoef(r) + bCoef(r)) % P) % width

  /** The same bucket as a SQL fragment over a BIGINT column/expression
    * `h`, parseable by BOTH Spark and DuckDB (kept adjacent to
    * [[bucket]] so the engines cannot drift). The CAST is load-bearing:
    * P fits in an INT, so an integer-typed `h` would keep the whole
    * expression 32-bit and the `* aCoef` step overflows under ANSI
    * (caught by CountMinSpec's literal-hash case).
    */
  def bucketSql(h: String, r: Int, width: Int): String =
    s"((((CAST($h AS BIGINT) % $P) + $P) % $P * ${aCoef(r)} + " +
      s"${bCoef(r)}) % $P) % $width"

  /** Point-estimate column: min over rows of the sketch array's counter
    * for the pre-hashed item (SQL fragment `hExpr`, a BIGINT column
    * name or expression). `sketch` is the finished grid (row-major,
    * 1-indexed through element_at).
    */
  def estimate(sketch: Column, hExpr: String, depth: Int,
               width: Int): Column = {
    val cells = (0 until depth).map { r =>
      element_at(sketch,
        (lit(r * width) + expr(bucketSql(hExpr, r, width)) + 1)
          .cast("int"))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
