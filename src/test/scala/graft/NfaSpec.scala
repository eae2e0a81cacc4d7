package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cep.{Nfa, PatternDef, PatternMatch, Step}

/** Pure-JVM NFA semantics tests with hand-computed expected matches —
  * the SiddhiSyntaxTest-style ground-truth harness (SURVEY §3.3).
  */
class NfaSpec extends AnyFunSuite {

  case class E(id: Long, ts: Long, typ: String)

  private def run(pat: PatternDef[E], evs: Seq[E]): Seq[PatternMatch[E]] = {
    val nfa = new Nfa[E](pat, _.ts)
    evs.sortBy(e => (e.ts, e.id)).flatMap(nfa.onEvent)
  }

  private def ids(m: PatternMatch[E], step: String): Seq[Long] =
    m.get(step).map(_.id)

  val AB = PatternDef[E](IndexedSeq(
    Step[E]("a", _.typ == "A"),
    Step[E]("b", _.typ == "B")))

  test("followed-by: first B after each A matches (skip till next match)") {
    val evs = Seq(E(1, 10, "A"), E(2, 20, "C"), E(3, 30, "B"), E(4, 40, "B"))
    val ms = run(AB, evs)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((1L, 3L)))
  }

  test("every: each A starts its own partial match") {
    val evs = Seq(E(1, 10, "A"), E(2, 20, "A"), E(3, 30, "B"))
    val ms = run(AB, evs)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head))
      .toSet == Set((1L, 3L), (2L, 3L)))
  }

  test("non-every: only the first match emits") {
    val pat = AB.copy(every = false)
    val evs = Seq(E(1, 10, "A"), E(2, 20, "B"), E(3, 30, "A"), E(4, 40, "B"))
    val ms = run(pat, evs)
    assert(ms.size == 1)
    assert(ids(ms.head, "a") == Seq(1L) && ids(ms.head, "b") == Seq(2L))
  }

  test("within: expired partials never complete") {
    val pat = AB.copy(withinMs = Some(15L))
    val evs = Seq(E(1, 10, "A"), E(2, 30, "B"), E(3, 35, "A"), E(4, 40, "B"))
    val ms = run(pat, evs)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((3L, 4L)))
  }

  test("within boundary is inclusive") {
    val pat = AB.copy(withinMs = Some(20L))
    val ms = run(pat, Seq(E(1, 10, "A"), E(2, 30, "B")))
    assert(ms.size == 1)
  }

  test("strict sequence: non-matching event kills the partial") {
    val pat = PatternDef[E](IndexedSeq(
      Step[E]("a", _.typ == "A"),
      Step[E]("b", _.typ == "B", strict = true)))
    val evs = Seq(
      E(1, 10, "A"), E(2, 20, "C"), E(3, 30, "B"), // A,C,B: no match
      E(4, 40, "A"), E(5, 50, "B"))                // A,B: match
    val ms = run(pat, evs)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((4L, 5L)))
  }

  test("quantifier <2:3>: collects 2..3 consecutive As then B") {
    val pat = PatternDef[E](IndexedSeq(
      Step[E]("a", _.typ == "A", minCount = 2, maxCount = 3),
      Step[E]("b", _.typ == "B")))
    val evs = Seq(E(1, 10, "A"), E(2, 20, "A"), E(3, 30, "A"), E(4, 40, "B"))
    val ms = run(pat, evs)
    // starts at ev1 (collects 2 or 3), ev2 (collects 2) — all complete at B
    val groups = ms.map(m => (ids(m, "a"), ids(m, "b").head)).toSet
    assert(groups.contains((Seq(1L, 2L, 3L), 4L)))
    assert(groups.contains((Seq(1L, 2L), 4L)))
    assert(groups.contains((Seq(2L, 3L), 4L)))
  }

  test("optional step (?): pattern completes with or without it") {
    val pat = PatternDef[E](IndexedSeq(
      Step[E]("a", _.typ == "A"),
      Step[E]("opt", _.typ == "O", minCount = 0, maxCount = 1),
      Step[E]("b", _.typ == "B")))
    val withOpt = run(pat, Seq(E(1, 10, "A"), E(2, 20, "O"), E(3, 30, "B")))
    assert(withOpt.exists(m => ids(m, "opt") == Seq(2L)))
    val withoutOpt = run(pat, Seq(E(1, 10, "A"), E(3, 30, "B")))
    assert(withoutOpt.size == 1 && withoutOpt.head.get("opt").isEmpty)
  }

  test("plus quantifier on last step emits at first qualifying event") {
    val pat = PatternDef[E](IndexedSeq(
      Step[E]("a", _.typ == "A"),
      Step[E]("b", _.typ == "B", minCount = 1, maxCount = Int.MaxValue)))
    val ms = run(pat, Seq(E(1, 10, "A"), E(2, 20, "B"), E(3, 30, "B")))
    // reluctant emit at min: first B completes; the extended branch
    // continues and emits again at the second B
    assert(ms.exists(m => ids(m, "b") == Seq(2L)))
  }

  test("partial-match cap bounds state") {
    val pat = AB.copy(maxPartialMatches = 5)
    val nfa = new Nfa[E](pat, _.ts)
    (1 to 100).foreach(i => nfa.onEvent(E(i, i * 10L, "A")))
    assert(nfa.liveCount <= 5)
  }
}
