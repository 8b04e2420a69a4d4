package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extensions registered on every session (core/Sessions.scala):
  * native functions beyond the Spark built-ins, injected through the
  * supported SparkSessionExtensions surface so `expr("vec_dot(a, b)")`
  * and SQL both resolve them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(children(0))))
    ext.injectFunction((
      FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "nearest_cell"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NearestCell(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName,
        "interleave_bits"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        InterleaveBits(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomMightContain(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(children(0))))
    ext.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LshBuckets.build(children)))
    ext.injectFunction((
      FunctionIdentifier("pq_encode_all"),
      new ExpressionInfo(classOf[PqEncodeAll].getName, "pq_encode_all"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqEncodeAll(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqLut(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("vec_sub"),
      new ExpressionInfo(classOf[VecSub].getName, "vec_sub"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecSub(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("multi_contains_count"),
      new ExpressionInfo(classOf[MultiContainsCount].getName,
        "multi_contains_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MultiContainsCount.build(children)))
    ext.injectFunction((
      FunctionIdentifier("pq_lut_score"),
      new ExpressionInfo(classOf[PqLutScore].getName, "pq_lut_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqLutScore(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("unigram_viterbi"),
      new ExpressionInfo(classOf[UnigramViterbi].getName,
        "unigram_viterbi"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UnigramViterbi.build(children)))
    ext.injectFunction((
      FunctionIdentifier("warc_parse"),
      new ExpressionInfo(classOf[WarcParse].getName, "warc_parse"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WarcParse.build(children)))
    ext.injectFunction((
      FunctionIdentifier("wordpiece_pieces"),
      new ExpressionInfo(classOf[GreedyPieces].getName,
        "wordpiece_pieces"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GreedyPieces.build(children)))
    ext.injectOptimizerRule(_ => new DimBroadcastRule)
  }
}
