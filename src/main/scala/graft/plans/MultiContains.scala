package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matcher (Aho & Corasick, CACM 1975) —
  * ONE linear scan of the text finds every occurrence of every pattern
  * in a fixed set, the classic automaton for blocklist/term filtering
  * over large corpora. The alternatives melt as the pattern set grows:
  * a regex alternation `(t1|t2|...|tK)` backtracks per position (and
  * java.util.regex compiles alternations to sequential trials — O(K)
  * per character in the worst case), and K separate `contains` calls
  * rescan the text K times. The automaton is O(len(text) + matches)
  * regardless of K — the property that matters when K is a 10^4-term
  * blocklist and the text is 100 TB.
  *
  * Match semantics (pinned by MultiContainsSpec and the l60 oracle):
  * every (position, pattern) occurrence counts, INCLUDING overlaps and
  * patterns contained in other patterns — `count("aaaa", ["aa"])` is 3,
  * `count("table", ["table", "able"])` is 2. Duplicate patterns each
  * count (callers dedupe if they mean set semantics). Positions are
  * code points, matching the oracle's character-indexed `substr` probe.
  *
  * Construction: trie + BFS failure links, with each node's output
  * count pre-aggregated through its dictionary-suffix chain
  * (`out(s) += out(fail(s))` in BFS order), so the scan does O(1) work
  * per character — no output-chain walk. Transitions are frozen into
  * sorted parallel int arrays per node (binary search, no boxing on
  * the hot path).
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
  require(patterns.forall(_.nonEmpty),
    "AhoCorasick patterns must be non-empty strings")

  // --- trie build (growable), then frozen to flat arrays ---
  private val (keys, vals, fail, out) = {
    val childMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.TreeMap[Integer, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(0L)
    patterns.foreach { p =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        val nxt = childMaps(s).get(cp)
        if (nxt == null) {
          childMaps += new java.util.TreeMap[Integer, Integer]()
          outB += 0L
          val id = childMaps.size - 1
          childMaps(s).put(cp, id)
          s = id
        } else s = nxt
        i += Character.charCount(cp)
      }
      outB(s) += 1L
    }
    val n = childMaps.size
    val failB = new Array[Int](n)
    val q = new java.util.ArrayDeque[Integer]()
    childMaps(0).forEach((_, c) => q.add(c))
    while (!q.isEmpty) {
      val u = q.poll().intValue
      // BFS order: fail(u) is strictly shallower, so its out count is
      // already dictionary-suffix-aggregated when u pops
      outB(u) += outB(failB(u))
      childMaps(u).forEach { (cp, v) =>
        var f = failB(u)
        while (f != 0 && !childMaps(f).containsKey(cp)) f = failB(f)
        val fv = childMaps(f).get(cp)
        // .intValue: Integer == Integer compares REFERENCES above the
        // [-128, 127] box cache — node ids must compare by value
        failB(v.intValue) =
          if (fv != null && fv.intValue != v.intValue) fv.intValue else 0
        q.add(v)
      }
    }
    // freeze: sorted parallel arrays per node (TreeMap iterates sorted)
    val ks = new Array[Array[Int]](n)
    val vs = new Array[Array[Int]](n)
    var s = 0
    while (s < n) {
      val m = childMaps(s)
      val k = new Array[Int](m.size)
      val v = new Array[Int](m.size)
      var j = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        k(j) = e.getKey
        v(j) = e.getValue
        j += 1
      }
      ks(s) = k
      vs(s) = v
      s += 1
    }
    (ks, vs, failB, outB.toArray)
  }

  private def step(state: Int, cp: Int): Int = {
    var s = state
    while (true) {
      val i = java.util.Arrays.binarySearch(keys(s), cp)
      if (i >= 0) return vals(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Total (position, pattern) match count over `text` — one pass. */
  def countMatches(text: String): Long = {
    var s = 0
    var i = 0
    var total = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      s = step(s, cp)
      total += out(s)
      i += Character.charCount(cp)
    }
    total
  }
}

/** `multi_contains_count(text, array('t1', 't2', ...))` — the
  * [[AhoCorasick]] automaton as a native codegen'd expression: total
  * occurrence count (overlaps included) of every pattern in the fixed
  * set, in one compiled scan per row. The pattern array must be a
  * foldable literal (it parameterizes the automaton, built once and
  * shipped to executors via `addReferenceObj` — never per row). NULL
  * text yields NULL (nullSafe); the blocklist decision downstream is
  * `count > 0`.
  */
case class MultiContainsCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"multi_contains_count requires a string text argument, got " +
          s"${t.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "multi_contains_count"

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(s: Any): Any =
    ac.countMatches(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("acMatcher", ac,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $ref.countMatches($s.toString());"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MultiContainsCount = copy(child = newChild)
}

object MultiContainsCount {
  /** Function-registry builder: arg 2 must be a foldable non-empty
    * array of non-empty string literals (it parameterizes the
    * automaton). Fails analysis-style on misuse, not with a cast error
    * from deep inside codegen.
    */
  def build(children: Seq[Expression]): MultiContainsCount = {
    if (children.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`multi_contains_count`",
          "expectedNum" -> "2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    val pats = children(1) match {
      case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
        val arr = e.eval(InternalRow.empty)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until arr.numElements())
          .map(i => Option(arr.getUTF8String(i)).map(_.toString).orNull)
      case e => throw new IllegalArgumentException(
        s"multi_contains_count patterns must be a literal string array, " +
          s"got $e")
    }
    // validate the CONTENTS here too, not just the shape — an empty
    // array, a null element, or an empty-string pattern would otherwise
    // pass build() and only fail at first-row evaluation on an executor
    // (AhoCorasick's require / an NPE), far from the misuse site
    if (pats.isEmpty) throw new IllegalArgumentException(
      "multi_contains_count: pattern array must be non-empty")
    val iBad = pats.indexWhere(p => p == null || p.isEmpty)
    if (iBad >= 0) throw new IllegalArgumentException(
      s"multi_contains_count: pattern element $iBad is " +
        (if (pats(iBad) == null) "NULL" else "the empty string") +
        " — every pattern must be a non-empty string literal")
    MultiContainsCount(children(0), pats)
  }
}
