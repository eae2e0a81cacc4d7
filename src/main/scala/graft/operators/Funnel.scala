package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event reports — the funnel/cohort tier above the CEP
  * operators: CEP emits per-match rows ([[graft.cep.Cep]]); these
  * aggregate the corpus-wide conversion/retention REPORTS an analyst
  * reads. All time arithmetic is integer microseconds/days, so results
  * are bit-identical under any partitioning and replay exactly in SQL.
  */
object Funnel {

  /** Greedy-earliest funnel: a user converts to step `i` when events
    * of types `steps(0..i)` occur in order, each STRICTLY after the
    * previous step's match, with step `i`'s timestamp within
    * `withinUs` of step 0's (the standard product-analytics
    * definition; greedy-earliest matching is deterministic). Output:
    * `(step, step_type, n_users)` for every step, `step` 1-based;
    * `n_users` is monotonically non-increasing.
    *
    * Shape for scale: one filtered min-aggregation per step keyed by
    * user plus a user-keyed equi-join per stage — k small shuffles on
    * the user key, no windows, no per-user event sorting; each stage's
    * relation is one row per qualifying user.
    */
  def report(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, steps: Seq[String], withinUs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(withinUs > 0, s"withinUs must be positive, got $withinUs")
    val e = events.select(col(userCol).cast("long").as("u"),
      col(typeCol).as("t"), col(tsUsCol).cast("long").as("ts"))
    // stage i = one row per user still converting at step i; each
    // stage is the previous stage joined to the next step's earliest
    // qualifying event. Everything stays LAZY — the report is one
    // unioned plan, no driver actions inside the operator.
    val stages = steps.indices.foldLeft(Vector.empty[DataFrame]) {
      case (acc, 0) =>
        acc :+ e.filter(col("t") === steps.head)
          .groupBy(col("u")).agg(min(col("ts")).as("ts0"))
          .withColumn("tsi", col("ts0"))
      case (acc, i) =>
        // earliest step-i event strictly after the user's step-(i-1)
        // match, still inside the window anchored at step 0
        acc :+ e.filter(col("t") === steps(i))
          .join(acc.last.select(col("u"), col("ts0"),
            col("tsi").as("_prev")), Seq("u"))
          .filter(col("ts") > col("_prev") &&
            col("ts") <= col("ts0") + withinUs)
          .groupBy(col("u"), col("ts0"))
          .agg(min(col("ts")).as("tsi"))
    }
    stages.zipWithIndex.map { case (s, i) =>
      s.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("step_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Max-gap sessionization report — the gaps-and-islands batch
    * complement to the streaming session window (SURVEY §2.B9): a new
    * session starts at a user's first event and at every event more
    * than `gapUs` after the previous one. Output: one row per session
    * `(user_id, session_idx, n_events, span_us, n_types, n_target)`
    * with `session_idx` 1-based per user in time order, `span_us` =
    * last−first event, `n_types` = distinct event types, and
    * `n_target` = events of `targetType` (the "did this session
    * convert" column). All integers — engine- and partitioning-exact
    * (equal-timestamp ties can't flip a boundary: their gap is 0).
    *
    * Shape for scale: two windows partitioned BY USER (lag → boundary
    * flag, running sum → session index) and one (user, session) keyed
    * aggregation — no global sort; the window carries (user, ts,
    * type), never payloads.
    */
  def sessionStats(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, gapUs: Long, targetType: String): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ts"))
    val flagged = events.select(col(userCol).cast("long").as("u"),
        col(tsUsCol).cast("long").as("ts"), col(typeCol).as("t"))
      .withColumn("_new",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapUs, 1L)
          .when(lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("_new")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
          .orderBy(col("ts")).rowsBetween(Long.MinValue, 0)))
    flagged.groupBy(col("u").as("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts")) - min(col("ts"))).as("span_us"),
        countDistinct(col("t")).as("n_types"),
        sum(when(col("t") === targetType, 1L).otherwise(0L))
          .as("n_target"))
  }

  /** Cohort retention: users cohort by their FIRST-seen integer day
    * (`ts_us div 86400000000`), and every (user, active day) pair
    * lands in `(cohort_day, day_offset)`. Output: `(cohort_day,
    * day_offset, n_users)` — the retention triangle; `day_offset = 0`
    * rows count each cohort's size.
    *
    * Shape for scale: distinct (user, day) pre-aggregates map-side,
    * the first-day election is one user-keyed min, and the triangle is
    * one (cohort, offset)-keyed count — three keyed aggregations, the
    * biggest carrying (user, day) pairs, never raw events.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsUsCol: String): DataFrame = {
    val ud = events.select(col(userCol).cast("long").as("u"),
        expr(s"cast($tsUsCol as bigint) div 86400000000").as("d"))
      .distinct()
    val first = ud.groupBy(col("u")).agg(min(col("d")).as("d0"))
    ud.join(first, Seq("u"))
      .groupBy(col("d0").as("cohort_day"),
        (col("d") - col("d0")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
