package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60000000L // one minute in µs

  test("funnel: ordering, window anchor, greedy-earliest matching") {
    val ev = Seq(
      // user 1: full A -> B -> C inside the window
      (1L, "A", 0L), (1L, "B", 1 * M), (1L, "C", 2 * M),
      // user 2: B BEFORE A never counts; no B after A -> stops at A
      (2L, "B", 0L), (2L, "A", 1 * M), (2L, "C", 2 * M),
      // user 3: B after A but C outside the window anchored at A
      (3L, "A", 0L), (3L, "B", 1 * M), (3L, "C", 100 * M),
      // user 4: greedy-earliest A is the FIRST A; its window covers B
      (4L, "A", 0L), (4L, "A", 50 * M), (4L, "B", 5 * M),
      // user 5: never enters
      (5L, "B", 0L), (5L, "C", 1 * M)
    ).toDF("user_id", "event_type", "ts_us")
    val got = Funnel.report(ev, "user_id", "event_type", "ts_us",
        Seq("A", "B", "C"), withinUs = 10 * M)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    // step 1: users 1,2,3,4; step 2 (B after A, in window): 1,3,4;
    // step 3 (C after B, in window): 1
    assert(got == Seq((1, "A", 4L), (2, "B", 3L), (3, "C", 1L)))
  }

  test("funnel: same-timestamp events do not satisfy STRICTLY after") {
    val ev = Seq((1L, "A", 5 * M), (1L, "B", 5 * M))
      .toDF("user_id", "event_type", "ts_us")
    val got = Funnel.report(ev, "user_id", "event_type", "ts_us",
        Seq("A", "B"), withinUs = 10 * M)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "A", 1L), (2, "B", 0L)))
  }

  test("cohortRetention: first-day cohorts, offsets, dedup within day") {
    val D = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 10L), (1L, D + 5L), (1L, 3 * D), // cohort 0
      (2L, D), (2L, D + 99L),                         // cohort 1, day 1 only
      (3L, 0L), (3L, 2 * D)                           // cohort 0
    ).toDF("user_id", "ts_us")
    val got = Funnel.cohortRetention(ev, "user_id", "ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L), // users 1 and 3 on their first day
      (0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L)))
    // partitioning independence
    val re = Funnel.cohortRetention(ev.repartition(7), "user_id", "ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(re == got)
  }

  test("sessionStats: gap boundary, span, types, target count") {
    val ev = Seq(
      // user 1: session 1 = events at 0, 50, 100 (gaps <= 100);
      // session 2 starts at 250 (gap 150 > 100)
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 100L, "view"),
      (1L, 250L, "purchase"),
      // user 2: single event = its own session
      (2L, 10L, "view")
    ).toDF("user_id", "ts_us", "event_type")
    val got = Funnel.sessionStats(ev, "user_id", "ts_us", "event_type",
        gapUs = 100L, targetType = "purchase")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, 100L, 2L, 0L),
      (1L, 2L, 1L, 0L, 1L, 1L),
      (2L, 1L, 1L, 0L, 1L, 0L)))
    // an exactly-gap-sized silence does NOT split (strictly greater)
    val edge = Seq((3L, 0L, "view"), (3L, 100L, "view"))
      .toDF("user_id", "ts_us", "event_type")
    val g2 = Funnel.sessionStats(edge, "user_id", "ts_us", "event_type",
        gapUs = 100L, targetType = "purchase")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(g2 == Set((3L, 1L, 2L, 100L, 1L, 0L)))
    // partitioning independence
    val re = Funnel.sessionStats(ev.repartition(5), "user_id", "ts_us",
        "event_type", gapUs = 100L, targetType = "purchase")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(re == got)
  }
}
