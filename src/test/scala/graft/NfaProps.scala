package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.cep.{Nfa, PatternDef, PatternMatch, Step}

/** Property-based NFA invariants over random event streams and random
  * quantified patterns (scalacheck; SURVEY §5 item 4).
  */
object NfaProps extends Properties("Nfa") {

  case class E(id: Long, ts: Long, typ: String)

  private val genEvents: Gen[List[E]] = for {
    n <- Gen.choose(0, 60)
    typs <- Gen.listOfN(n, Gen.oneOf("A", "B", "C"))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 20L))
  } yield {
    val ts = gaps.scanLeft(0L)(_ + _).tail
    typs.lazyZip(ts).lazyZip(1L to n.toLong).map {
      case (t, s, i) => E(i, s, t)
    }.toList
  }

  private val genStep: Gen[(String, Int, Int, Boolean)] = for {
    typ <- Gen.oneOf("A", "B", "C")
    min <- Gen.choose(1, 3)
    extra <- Gen.choose(0, 2)
    strict <- Gen.oneOf(true, false)
  } yield (typ, min, min + extra, strict)

  private val genPattern: Gen[PatternDef[E]] = for {
    k <- Gen.choose(1, 3)
    specs <- Gen.listOfN(k, genStep)
    within <- Gen.option(Gen.choose(10L, 200L))
  } yield PatternDef[E](
    specs.zipWithIndex.map { case ((t, mn, mx, st), i) =>
      // first step must be non-strict-safe and non-optional (min>=1 holds)
      Step[E](s"s$i", _.typ == t, mn, mx, strict = st && i > 0)
    }.toIndexedSeq,
    withinMs = within)

  private def run(pat: PatternDef[E], evs: List[E]): (Seq[PatternMatch[E]], Nfa[E]) = {
    val nfa = new Nfa[E](pat, _.ts)
    val ms = evs.flatMap(nfa.onEvent) ++ nfa.flush()
    (ms, nfa)
  }

  property("group sizes respect quantifier bounds") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      val (ms, _) = run(pat, evs)
      Prop(ms.forall { m =>
        pat.steps.forall { case s: Step[E] =>
          val g = m.get(s.name)
          g.isEmpty || (g.size >= math.min(s.minCount, 1) && g.size <= s.maxCount)
        }
      })
    }

  property("matches complete inside `within`") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      val (ms, _) = run(pat, evs)
      Prop(pat.withinMs.forall(w => ms.forall(m => m.endTs - m.startTs <= w)))
    }

  property("bound events are time-ordered across steps") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      val (ms, _) = run(pat, evs)
      Prop(ms.forall { m =>
        val groups = pat.steps.collect { case s: Step[E] => m.get(s.name) }
          .filter(_.nonEmpty)
        val stepSpans = groups.map(g => (g.map(_.ts).min, g.map(_.ts).max))
        stepSpans.sliding(2).forall {
          case Seq((_, prevMax), (nextMin, _)) => nextMin >= prevMax
          case _ => true
        }
      })
    }

  property("live partial matches stay under the cap") =
    forAll(genEvents) { evs =>
      val pat = PatternDef[E](IndexedSeq(
        Step[E]("a", _.typ == "A"),
        Step[E]("b", _.typ == "B")), maxPartialMatches = 7)
      val nfa = new Nfa[E](pat, _.ts)
      Prop(evs.forall { e => nfa.onEvent(e); nfa.liveCount <= 7 })
    }

  property("every match's events come from the input stream") =
    forAll(genPattern, genEvents) { (pat, evs) =>
      val ids = evs.map(_.id).toSet
      val (ms, _) = run(pat, evs)
      Prop(ms.forall(_.groups.values.forall(_.forall(e => ids(e.id)))))
    }
}
