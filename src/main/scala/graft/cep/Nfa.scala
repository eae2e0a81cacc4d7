package graft.cep

import scala.collection.mutable.ArrayBuffer

/** Incremental NFA for [[PatternDef]] evaluation.
  *
  * Feed events in event-time order via [[onEvent]]; completed matches are
  * returned as they happen. The engine is pure in-JVM state (no Spark
  * types), so the exact same kernel runs inside a batch `flatMapGroups`
  * and a streaming `flatMapGroupsWithState` — one semantics, two
  * execution modes.
  *
  * Equivalent role in the reference: the embedded engine's pattern state
  * machines driven from the host operator's ordered event feed
  * (core/src/main/java/org/apache/flink/streaming/siddhi/operator/AbstractSiddhiOperator.java:209-247
  * orders by timestamp before delivery; the NFA itself lived in the
  * external siddhi-core dependency — rebuilt here, not copied).
  *
  * Scale: partial matches are bounded by `maxPartialMatches`; expired
  * partials are pruned on every event using `withinMs`, so per-key state
  * is O(live partials × pattern length), never O(stream).
  */
final class Nfa[E](val pattern: PatternDef[E], val tsOf: E => Long)
    extends Serializable {
  require(pattern.steps.nonEmpty, "pattern needs at least one step")
  require(pattern.steps.head.minCount >= 1,
    "first step must be non-optional")

  private val steps = pattern.steps
  private val last = steps.length - 1

  private var partials: List[Partial[E]] = Nil
  private var terminated: Boolean = false

  /** Serializable snapshot for checkpointed streaming state. */
  def snapshot: (List[Partial[E]], Boolean) = (partials, terminated)
  def restore(s: (List[Partial[E]], Boolean)): Unit = {
    partials = s._1; terminated = s._2
  }

  private def emitIfComplete(p: Partial[E], out: ArrayBuffer[PatternMatch[E]],
      endTs: Long): Boolean = {
    if (p.stepIdx == last && p.curCount >= steps(last).minCount) {
      val groups = steps.indices.flatMap { i =>
        val g = if (i < p.groups.length) p.groups(i) else Vector.empty
        if (g.nonEmpty) Some(steps(i).name -> g.toIndexedSeq) else None
      }.toMap
      out += PatternMatch(p.startTs, endTs, groups)
      if (!pattern.every) terminated = true
      true
    } else false
  }

  private def extended(p: Partial[E], e: E): Partial[E] =
    p.copy(curCount = p.curCount + 1,
      groups = p.groups.updated(p.stepIdx, p.groups(p.stepIdx) :+ e))

  private def advanced(p: Partial[E], toStep: Int, e: E): Partial[E] = {
    var g = p.groups
    while (g.length <= toStep) g = g :+ Vector.empty[E]
    Partial(toStep, 1, p.startTs, g.updated(toStep, g(toStep) :+ e))
  }

  /** Process one event (must be fed in non-decreasing ts order). */
  def onEvent(e: E): IndexedSeq[PatternMatch[E]] = {
    val t = tsOf(e)
    val out = ArrayBuffer.empty[PatternMatch[E]]
    val next = ArrayBuffer.empty[Partial[E]]

    partials.foreach { p =>
      // `within`: with ordered input, no later event can complete this
      // partial either — prune.
      if (!pattern.withinMs.exists(w => t - p.startTs > w)) {
        val s = steps(p.stepIdx)
        var moved = false
        var keepOriginal = false

        // (a) extend the current step's count group. Below minCount the
        // extension is committed; at/after minCount it is a branch — the
        // un-extended partial stays live so it can still advance on a
        // later event (A<2:3> must match both the 2-long and 3-long
        // collections).
        if (p.curCount < s.maxCount && s.predicate(e)) {
          val np = extended(p, e)
          if (!emitIfComplete(np, out, t)) next += np
          moved = true
          if (p.curCount >= s.minCount) keepOriginal = true
        }
        // (b) advance into the next step (skipping optional steps)
        if (p.curCount >= s.minCount && p.stepIdx < last) {
          var j = p.stepIdx + 1
          var scan = true
          while (scan && j <= last) {
            val sj = steps(j)
            if (sj.maxCount >= 1 && sj.predicate(e)) {
              val np = advanced(p, j, e)
              if (!emitIfComplete(np, out, t)) next += np
              moved = true
            }
            if (sj.minCount == 0) j += 1 else scan = false
          }
        }
        if (!moved) {
          // strict contiguity: the immediately-next event had to qualify
          val mustDie =
            (p.curCount < s.minCount && s.strict) ||
            (p.curCount >= s.minCount && p.stepIdx < last &&
              steps(p.stepIdx + 1).strict) ||
            (p.curCount >= s.minCount && p.stepIdx == last)
          if (!mustDie) next += p
        } else if (keepOriginal) {
          next += p
        }
      }
    }

    // start a new partial match at step 0
    if (!terminated && (pattern.every || (partials.isEmpty && next.isEmpty))) {
      if (steps.head.predicate(e)) {
        val np = Partial(0, 1, t, Vector(Vector(e)))
        if (!emitIfComplete(np, out, t)) next += np
      }
    }

    partials =
      if (next.length > pattern.maxPartialMatches)
        next.take(pattern.maxPartialMatches).toList
      else next.toList
    out.toIndexedSeq
  }

  /** Drop partials that can no longer complete at watermark `wm`. */
  def pruneExpired(wm: Long): Unit =
    pattern.withinMs.foreach { w =>
      partials = partials.filter(p => wm - p.startTs <= w)
    }

  def liveCount: Int = partials.size
}
