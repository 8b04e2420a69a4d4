package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Typed Aggregator (SURVEY §2.9's "Aggregator[IN,BUF,OUT] for sketches
  * at 100 TB"): a KMV (k-minimum-values) distinct sketch.
  *
  * The buffer keeps the k smallest hash values seen; merging two buffers
  * is a k-way min-merge, so the sketch is associative/commutative —
  * partition-order independent, hence DETERMINISTIC for a fixed input set
  * (unlike a random reservoir sample). Distinct-count estimate:
  * (k - 1) / kthMinNormalized.
  *
  * Use over groupBy via `KmvSketch.toColumn` or `ds.select(...)`.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {

  private def hash(x: Long): Long = {
    // 64-bit mix of MurmurHash3 over the two halves — deterministic,
    // well-spread, no RNG state. productHash is deprecated in favor of
    // caseClassHash, but the two produce DIFFERENT values — swapping
    // would silently change every estimate this sketch has ever pinned
    // (KmvSketchSpec tolerances, probe records), so the deprecated
    // spelling stays deliberately: the hash VALUES are the contract.
    val h1 = MurmurHash3.productHash((x, 0x9e3779b9L)): @annotation.nowarn(
      "cat=deprecation")
    val h2 = MurmurHash3.productHash((x, 0x85ebca6bL)): @annotation.nowarn(
      "cat=deprecation")
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  override def zero: Array[Long] = Array.empty

  /** insert keeping the k smallest (distinct) hashes */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length == k && h >= buf(buf.length - 1)) buf
    else if (java.util.Arrays.binarySearch(buf, h) >= 0) buf
    else {
      val merged = (buf :+ h).sorted
      if (merged.length > k) merged.take(k) else merged
    }
  }

  override def reduce(buf: Array[Long], x: Long): Array[Long] =
    insert(buf, hash(x))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val merged = (a ++ b).distinct.sorted
    if (merged.length > k) merged.take(k) else merged
  }

  /** distinct-count estimate ((k-1)/normalized kth minimum); exact size
    * when fewer than k distinct values were seen.
    */
  override def finish(buf: Array[Long]): Double = {
    if (buf.length < k) buf.length.toDouble
    else {
      // map the kth smallest hash into (0,1): shift from [Long.Min,Max]
      val kth = (buf(k - 1).toDouble - Long.MinValue.toDouble) /
        (Long.MaxValue.toDouble - Long.MinValue.toDouble)
      (k - 1).toDouble / kth
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
