package graft.cep

/** Pattern AST for CEP queries — the Spark-native equivalent of the
  * SiddhiQL pattern/sequence surface the reference forwards to its
  * embedded engine (reference evidence: pattern query at
  * core/src/test/java/org/apache/flink/streaming/siddhi/SiddhiCEPITCase.java:343-348,
  * sequence + within + quantifiers at :370-374; StateInputStream handling at
  * core/src/main/java/org/apache/flink/streaming/siddhi/utils/SiddhiExecutionPlanner.java:127).
  *
  * Semantics implemented (matching Siddhi defaults):
  *  - followed-by (`->`): skip-till-next-match — a partial match advances
  *    on the FIRST later event satisfying the next step;
  *  - sequence (`,`): strict succession — the immediately-next event must
  *    satisfy the step or the partial match dies;
  *  - `every`: every event satisfying step 0 starts a new partial match;
  *  - `within t`: a match must complete within t ms of its first event;
  *  - count quantifiers `<m:n>` / `+` (min=1,max=∞) / `?` (min=0,max=1)
  *    collect consecutive qualifying events into a step group, exposed as
  *    an indexed list (Siddhi's `s1[0]` access).
  */
final case class Step[E](
    name: String,
    predicate: E => Boolean,
    minCount: Int = 1,
    maxCount: Int = 1,
    strict: Boolean = false) {
  require(minCount >= 0 && maxCount >= math.max(minCount, 1))
}

final case class PatternDef[E](
    steps: IndexedSeq[Step[E]],
    withinMs: Option[Long] = None,
    every: Boolean = true,
    /** hard cap on live partial matches per key — bounded state at scale */
    maxPartialMatches: Int = 1024)

/** A live partial match inside the NFA (also the unit of checkpointed
  * streaming state): index of the step being collected, events collected
  * so far for that step, start timestamp, and per-step event groups.
  */
final case class Partial[E](
    stepIdx: Int,
    curCount: Int,
    startTs: Long,
    groups: Vector[Vector[E]])

/** A completed match: step name → the events bound to it, in order. */
final case class PatternMatch[E](
    startTs: Long,
    endTs: Long,
    groups: Map[String, IndexedSeq[E]]) {
  def head(step: String): E = groups(step).head
  def apply(step: String, i: Int): E = groups(step)(i)
  def get(step: String): IndexedSeq[E] =
    groups.getOrElse(step, IndexedSeq.empty)
}
