package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first segmenter (Schuster & Nakajima
  * 2012; the BERT tokenizer's inference rule: Devlin et al. 2019,
  * arXiv:1810.04805) as a native expression: at each position take the
  * LONGEST vocabulary token matching a prefix of the remaining word; a
  * position no token covers (a character the training corpus never
  * produced) emits the `[UNK]` sentinel and advances one character —
  * the standard degrade, never a crash.
  *
  * Deterministic by construction: the match is by exact string lookup
  * and the longest-first order is total, so the piece stream is
  * engine-reproducible (no floats anywhere) — the DuckDB mirror (l73e)
  * replays the identical walk as unrolled longest-match steps.
  *
  * Execution: the vocabulary is compiled ONCE into a hash set and
  * shipped via `addReferenceObj` — never per row; per-row work is
  * O(len(word) · maxTokenLen) hash probes, no regex, no shuffle. This
  * is [[UnigramViterbiModel]]'s packaging with the DP replaced by the
  * greedy rule — WordPiece's inference is cheaper than unigram-LM's
  * exactly because it never scores alternatives.
  */
final class GreedyPiecesModel(tokenArr: Array[String])
    extends Serializable {
  require(tokenArr.nonEmpty, "empty vocabulary")

  val Unk = "[UNK]"
  private val vocab = {
    val s = new java.util.HashSet[String](tokenArr.length * 2)
    tokenArr.foreach(s.add)
    s
  }
  private val maxTokenLen = tokenArr.iterator.map(_.length).max

  def segment(word: UTF8String): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = 0
    while (pos < n) {
      var l = math.min(maxTokenLen, n - pos)
      var taken = false
      while (l >= 1 && !taken) {
        val cand = w.substring(pos, pos + l)
        if (vocab.contains(cand)) {
          out += UTF8String.fromString(cand)
          pos += l
          taken = true
        } else l -= 1
      }
      if (!taken) { // character outside the vocabulary
        out += UTF8String.fromString(Unk)
        pos += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `wordpiece_pieces(word, array(tokens...))` — see
  * [[GreedyPiecesModel]]. The token array must be a foldable literal
  * (it parameterizes the compiled model); misuse fails at analysis,
  * not on an executor.
  */
case class GreedyPieces(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_pieces requires a string word argument, got " +
          s"${t.simpleString(10)}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "wordpiece_pieces"

  @transient private lazy val model = new GreedyPiecesModel(tokens.toArray)

  override def nullSafeEval(w: Any): Any =
    model.segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("gpModel", model,
        classOf[GreedyPiecesModel].getName)
      s"${ev.value} = $ref.segment($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): GreedyPieces = copy(child = newChild)
}

object GreedyPieces {
  /** Function-registry builder: arg 2 must be a foldable non-empty
    * string array with non-empty elements. */
  def build(children: Seq[Expression]): GreedyPieces = {
    if (children.length != 2)
      throw new IllegalArgumentException(
        "wordpiece_pieces(word, tokens) takes 2 args, got " +
          children.length)
    val tArr = children(1) match {
      case a if a.foldable && a.dataType.isInstanceOf[ArrayType] =>
        if (a.dataType.asInstanceOf[ArrayType].elementType != StringType)
          throw new IllegalArgumentException(
            "wordpiece_pieces tokens must be an ARRAY<STRING>, got " +
              a.dataType.simpleString)
        val v = a.eval(InternalRow.empty)
        if (v == null) throw new IllegalArgumentException(
          "wordpiece_pieces tokens is NULL")
        v.asInstanceOf[ArrayData]
      case other => throw new IllegalArgumentException(
        s"wordpiece_pieces tokens must be a literal array, got $other")
    }
    val tokens = (0 until tArr.numElements()).map { i =>
      val u = tArr.getUTF8String(i)
      if (u == null) throw new IllegalArgumentException(
        s"wordpiece_pieces tokens($i) is NULL")
      u.toString
    }
    if (tokens.isEmpty) throw new IllegalArgumentException(
      "wordpiece_pieces needs a non-empty token array")
    if (tokens.exists(_.isEmpty)) throw new IllegalArgumentException(
      "wordpiece_pieces tokens must be non-empty strings")
    GreedyPieces(children.head, tokens)
  }
}
