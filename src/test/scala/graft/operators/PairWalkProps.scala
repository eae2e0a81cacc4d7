package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based check of the run-batched two-pointer walk
  * ([[TextOps.pairWalk]]) against the naive per-item loop it claims to
  * reproduce — pure driver logic, no Spark session, 500 trials.
  */
object PairWalkProps extends Properties("PairWalk") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(
      graft.Soak.knob("GRAFT_PAIRWALK_GENS", 500, 5000))

  /** Per-item reference: positions 1..n desc-sorted lengths; returns
    * (pack, slot) per position with the same numbering contract —
    * pair k → pack k−1, singles numbered after pairs by position.
    */
  private def ref(lens: Seq[Long], budget: Long)
      : Map[Long, (Long, Int)] = {
    val sorted = lens.sorted(Ordering[Long].reverse).toArray
    var i = 0; var j = sorted.length - 1
    var pairs = 0L
    val out = scala.collection.mutable.Map[Long, (Long, Int)]()
    val singles = scala.collection.mutable.ArrayBuffer[Int]()
    while (i < j) {
      if (sorted(i) + sorted(j) <= budget) {
        out(i + 1L) = (pairs, 0)
        out(j + 1L) = (pairs, 1)
        pairs += 1; i += 1; j -= 1
      } else { singles += i; i += 1 }
    }
    if (i == j && sorted.nonEmpty) singles += i
    singles.sorted.zipWithIndex.foreach { case (p, k) =>
      out(p + 1L) = (pairs + k, 0)
    }
    out.toMap
  }

  /** Expand the walk's segments back to per-position assignments. */
  private def fromWalk(lens: Seq[Long], budget: Long)
      : Map[Long, (Long, Int)] = {
    val hist = lens.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(-_._1).toArray
    val n = lens.size.toLong
    val (hs, ss, nPairs) = TextOps.pairWalk(hist, budget)
    val out = scala.collection.mutable.Map[Long, (Long, Int)]()
    hs.foreach { case (lo, hi, base) =>
      (lo to hi).foreach(p => out(p) = (base + (p - lo), 0))
    }
    ss.foreach { case (lo, hi, base) =>
      (lo to hi).foreach(p => out(p) = (nPairs + base + (p - lo), 0))
    }
    ((n - nPairs + 1) to n).foreach(p => out(p) = (n - p, 1))
    out.toMap
  }

  property("run-batched walk equals the per-item two-pointer loop") =
    forAll(Gen.listOf(Gen.choose(0L, 12L)), Gen.choose(1L, 16L)) {
      (lens, budget) =>
        fromWalk(lens, budget) == ref(lens, budget)
    }

  property("every non-oversize pair fits the budget; all docs placed") =
    forAll(Gen.listOf(Gen.choose(0L, 15L)), Gen.choose(1L, 20L)) {
      (lens, budget) =>
        val asg = fromWalk(lens, budget)
        val sorted = lens.sorted(Ordering[Long].reverse)
        val byPack = asg.groupBy(_._2._1)
        asg.size == lens.size && byPack.forall { case (_, ms) =>
          ms.size <= 2 &&
            (ms.size < 2 ||
              ms.keys.map(p => sorted(p.toInt - 1)).sum <= budget)
        }
    }
}
