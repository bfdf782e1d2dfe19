package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: occurrence counts of MANY fixed substrings
  * in ONE pass over the text — `multi_substr_count(text)` with the
  * pattern list baked in at construction, returning `ARRAY<BIGINT>`
  * aligned with the pattern order.
  *
  * Why it exists: the langid kernel scored each of ~37 markers with
  * `(length(text) - length(replace(text, m))) / len(m)` — codegen'd, but
  * a FULL scan of the document per marker. This expression is a classic
  * Aho-Corasick automaton: one scan of the text total, each character
  * advancing one goto/fail step and adding the (precomputed, fail-chain-
  * merged) pattern hits at the reached state. Per-row cost drops from
  * O(len x patterns) to O(len + matches) — the difference between 37
  * text passes and 1 at 100 TB.
  *
  * SEMANTICS GUARD: the replace formulation counts NON-OVERLAPPING
  * occurrences greedily; Aho-Corasick counts ALL matches. The two agree
  * exactly iff no pattern can overlap itself, i.e. no pattern has a
  * proper border (a prefix equal to a suffix, like "aa" in "aaa") —
  * asserted at construction so swapping the kernel can never silently
  * change counts. Oracle SQL keeps the replace formulation; this
  * expression must (and, bordered-pattern-free, provably does) compute
  * the same numbers.
  *
  * CodegenFallback, deliberately: the automaton tables live on the JVM
  * object, the eval is one tight while-loop over primitive-indexed
  * arrays, and fusing goto tables into generated Java would balloon
  * codegen for no measurable gain (the pattern set is a construction-
  * time constant).
  */
case class MultiSubstrCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "multi_substr_count needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
  patterns.foreach { p =>
    val bordered = (1 until p.length).exists(k =>
      p.substring(0, k) == p.substring(p.length - k))
    require(!bordered,
      s"pattern '$p' has a proper border (self-overlap): Aho-Corasick " +
        "total-match counting would diverge from replace-based " +
        "non-overlapping counting")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_substr_count requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_substr_count"

  /** Aho-Corasick tables, built once per expression instance:
    * per-state goto maps, the fail-chain-MERGED pattern-index hit array
    * per state (the scan never walks fail chains to REPORT — only to
    * transition on a miss), and — the hot-path trick — the fail function
    * PRE-RESOLVED into a dense DFA over the ASCII plane: for chars
    * < 128, one `dfa(state)(c)` array load replaces the fail-walk loop
    * entirely (states x 128 ints — ~60 KB for the langid profile).
    * Non-ASCII chars (the CJK markers and any non-Latin text) take the
    * map + fail-walk path, identical semantics.
    */
  @transient private lazy val automaton
      : (Array[Array[Int]], Array[Map[Char, Int]], Array[Int], Array[Array[Int]]) = {
    val gotos = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val own = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = gotos(s).getOrElseUpdate(c, {
          gotos += scala.collection.mutable.HashMap.empty[Char, Int]
          own += Nil
          gotos.length - 1
        })
      }
      own(s) = pi :: own(s)
    }
    val fail = new Array[Int](gotos.length)
    val merged = own.map(_.toArray).toArray
    val bfs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotos(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      bfs += r
      gotos(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotos(f).contains(c)) f = fail(f)
        fail(s) = gotos(f).get(c).filter(_ != s).getOrElse(0)
        // BFS order guarantees fail(s)'s merged list is final
        merged(s) = merged(s) ++ merged(fail(s))
      }
    }
    // dense ASCII DFA: dfa(s)(c) = goto(s, c), else dfa(fail(s))(c) —
    // valid to fill in BFS order because fail(s) is strictly shallower
    val dfa = Array.ofDim[Int](gotos.length, 128)
    var c = 0
    while (c < 128) {
      dfa(0)(c) = gotos(0).getOrElse(c.toChar, 0); c += 1
    }
    bfs.foreach { s =>
      var c = 0
      while (c < 128) {
        dfa(s)(c) = gotos(s).getOrElse(c.toChar, dfa(fail(s))(c)); c += 1
      }
    }
    (dfa, gotos.map(_.toMap).toArray, fail, merged)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val (dfa, gotoMaps, fail, merged) = automaton
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < 128) {
        state = dfa(state)(c)
      } else {
        var st = state
        while (st != 0 && !gotoMaps(st).contains(c)) st = fail(st)
        state = gotoMaps(st).getOrElse(c, 0)
      }
      val h = merged(state)
      var k = 0
      while (k < h.length) { counts(h(k)) += 1; k += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): MultiSubstrCount =
    copy(child = newChild)
}
