package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmenter (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model's inference step) as a native expression:
  * split a word into the vocabulary pieces minimizing total integer
  * cost, by dynamic programming over character positions.
  *
  * Exactness contract (the l30/l31 fixed-point discipline): costs are
  * INTEGER bit-surprisals, so the DP minimum is an exact integer and
  * the argmin is engine-reproducible; ties are broken by preferring the
  * LONGEST piece at each backtrace step walking from the END of the
  * word. The DuckDB oracle replays the identical DP as a list-fold and
  * the identical longest-first backward walk (l72) — a float-cost
  * lattice would not hash-match across libms.
  *
  * A character not covered by any piece costs `unknownCost` (a single
  * sentinel well above any real path, keeping the DP total finite so
  * coverage gaps degrade instead of crashing); trainers that keep every
  * single character in the vocabulary never hit it.
  *
  * Execution: the piece->cost table is compiled once into a hash map
  * and shipped via `addReferenceObj` — never per row; the per-row work
  * is O(len(word) * maxPieceLen) with no regex and no shuffle.
  */
final class UnigramViterbiModel(pieceArr: Array[String],
                                costArr: Array[Long],
                                val maxPieceLen: Int,
                                val unknownCost: Long)
    extends Serializable {
  require(pieceArr.length == costArr.length,
    "pieces and costs must be parallel")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  private val costs = {
    val m = new java.util.HashMap[String, java.lang.Long](
      pieceArr.length * 2)
    var i = 0
    while (i < pieceArr.length) {
      m.put(pieceArr(i), costArr(i))
      i += 1
    }
    m
  }

  private def costOf(s: String): Long = {
    val c = costs.get(s)
    if (c == null) Long.MaxValue else c.longValue
  }

  /** Minimal-cost segmentation of `word`; ties resolved longest-piece-
    * first walking back from the end. Empty word -> empty array.
    */
  def segment(word: UTF8String): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Long](n + 1)
    var k = 1
    while (k <= n) {
      var best = Long.MaxValue
      var l = 1
      val lMax = math.min(maxPieceLen, k)
      while (l <= lMax) {
        val pc =
          if (l == 1) {
            val c = costOf(w.substring(k - 1, k))
            if (c == Long.MaxValue) unknownCost else c
          } else costOf(w.substring(k - l, k))
        if (pc != Long.MaxValue && dp(k - l) != Long.MaxValue) {
          val cand = dp(k - l) + pc
          if (cand < best) best = cand
        }
        l += 1
      }
      dp(k) = best
      k += 1
    }
    // backtrace, LONGEST matching piece first at every position
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var pos = n
    while (pos > 0) {
      var l = math.min(maxPieceLen, pos)
      var taken = false
      while (l >= 2 && !taken) {
        val pc = costOf(w.substring(pos - l, pos))
        if (pc != Long.MaxValue && dp(pos - l) != Long.MaxValue &&
          dp(pos - l) + pc == dp(pos)) {
          out += UTF8String.fromString(w.substring(pos - l, pos))
          pos -= l
          taken = true
        } else l -= 1
      }
      if (!taken) {
        out += UTF8String.fromString(w.substring(pos - 1, pos))
        pos -= 1
      }
    }
    // pieces were collected back-to-front
    new GenericArrayData(out.reverse.toArray)
  }
}

/** `unigram_viterbi(word, array(pieces...), array(costs...), maxLen)`
  * — see [[UnigramViterbiModel]]. The piece/cost arrays and maxLen must
  * be foldable literals (they parameterize the compiled model); the
  * builder validates them analysis-style.
  */
case class UnigramViterbi(child: Expression, pieces: Seq[String],
                          costs: Seq[Long], maxPieceLen: Int,
                          unknownCost: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi requires a string word argument, got " +
          s"${t.simpleString(10)}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val model =
    new UnigramViterbiModel(pieces.toArray, costs.toArray, maxPieceLen,
      unknownCost)

  override def nullSafeEval(w: Any): Any =
    model.segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("uvModel", model,
        classOf[UnigramViterbiModel].getName)
      s"${ev.value} = $ref.segment($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbi = copy(child = newChild)
}

object UnigramViterbi {
  /** Function-registry builder: args 2/3 must be foldable parallel
    * string/long arrays, arg 4 a positive int literal, optional arg 5
    * the unknown-char cost. Misuse fails at analysis, not on an
    * executor (the MultiContainsCount discipline).
    */
  def build(children: Seq[Expression]): UnigramViterbi = {
    if (children.length != 4 && children.length != 5)
      throw new IllegalArgumentException(
        "unigram_viterbi(word, pieces, costs, maxPieceLen[, unkCost])" +
          s" takes 4 or 5 args, got ${children.length}")
    def foldArr(e: Expression, what: String): ArrayData = e match {
      case a if a.foldable && a.dataType.isInstanceOf[ArrayType] =>
        a.eval(InternalRow.empty).asInstanceOf[ArrayData]
      case other => throw new IllegalArgumentException(
        s"unigram_viterbi $what must be a literal array, got $other")
    }
    val pArr = foldArr(children(1), "pieces")
    val pieces = (0 until pArr.numElements()).map { i =>
      val u = pArr.getUTF8String(i)
      if (u == null) throw new IllegalArgumentException(
        s"unigram_viterbi pieces($i) is NULL")
      u.toString
    }
    if (pieces.isEmpty) throw new IllegalArgumentException(
      "unigram_viterbi needs a non-empty piece array")
    if (pieces.exists(_.isEmpty)) throw new IllegalArgumentException(
      "unigram_viterbi pieces must be non-empty strings")
    val cArr = foldArr(children(2), "costs")
    if (cArr.numElements() != pieces.length)
      throw new IllegalArgumentException(
        s"unigram_viterbi pieces(${pieces.length}) and costs(" +
          s"${cArr.numElements()}) must be parallel")
    val costs = (0 until cArr.numElements()).map(cArr.getLong)
    val maxLen = children(3) match {
      case e if e.foldable => e.eval(InternalRow.empty) match {
        case i: Int if i >= 1 => i
        case l: java.lang.Long if l >= 1 => l.toInt
        case other => throw new IllegalArgumentException(
          s"unigram_viterbi maxPieceLen must be a positive int, " +
            s"got $other")
      }
      case other => throw new IllegalArgumentException(
        s"unigram_viterbi maxPieceLen must be a literal, got $other")
    }
    val unk = if (children.length == 5) children(4) match {
      case e if e.foldable => e.eval(InternalRow.empty) match {
        case i: Int => i.toLong
        case l: java.lang.Long => l.longValue
        case other => throw new IllegalArgumentException(
          s"unigram_viterbi unknownCost must be an integer literal, " +
            s"got $other")
      }
      case other => throw new IllegalArgumentException(
        s"unigram_viterbi unknownCost must be a literal, got $other")
    } else 1048576L
    UnigramViterbi(children(0), pieces, costs, maxLen, unk)
  }
}
