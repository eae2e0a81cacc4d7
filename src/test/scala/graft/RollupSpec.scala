package graft

import org.apache.spark.sql.functions._
import graft.operators.Rollup

class RollupSpec extends SparkSpec {
  import spark.implicits._

  // normalized µs timestamp whatever parquet type the generator wrote
  private def events() = Tables.eventsTsUs(spark, sfDir).drop("ts_us")

  test("cascade levels merge additively and agree with direct aggregation") {
    val e = events()
    val cascaded = Rollup.cascade(e, col("ts"), col("value"),
      Seq("minute", "hour", "day"))
    val day = Rollup.at(cascaded, "day")
      .select(col("bucket"), col("n")).as[(java.sql.Timestamp, Long)]
      .collect().toMap
    val direct = e.groupBy(date_trunc("day", col("ts")).as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(day == direct)
    // total row count conserved at every level
    val byLevel = cascaded.groupBy("granularity").agg(sum("n").as("t"))
      .as[(String, Long)].collect().toMap
    assert(byLevel.values.toSet.size == 1)
  }

  test("cubeReport: all four grouping subsets, consistent totals") {
    val ev = Seq(
      (1L, 0L, "view"), (2L, 0L, "view"), (1L, 86400000000L, "click"),
      (1L, 86400000001L, "view")
    ).toDF("user_id", "ts_us", "event_type")
    val got = Rollup.cubeReport(ev, "event_type", "ts_us", "user_id")
      .as[(Option[String], Option[Long], Long, Long, Long)]
      .collect().toSet
    assert(got.contains((Some("view"), Some(0L), 2L, 2L, 0L)))
    assert(got.contains((Some("view"), None, 3L, 2L, 1L)))   // day rolled
    assert(got.contains((None, Some(1L), 2L, 1L, 2L)))       // type rolled
    assert(got.contains((None, None, 4L, 2L, 3L)))           // grand total
    assert(got.size == 3 + 2 + 2 + 1) // (t,d) pairs + types + days + total
  }

  test("at() slices one granularity with a bucket range") {
    val e = events()
    val cascaded = Rollup.cascade(e, col("ts"), col("value"), Seq("hour", "day"))
    val hours = Rollup.at(cascaded, "hour").select("bucket")
      .as[java.sql.Timestamp].collect().sorted.toSeq
    val mid = hours(hours.size / 2)
    val sliced = Rollup.at(cascaded, "hour", from = Some(lit(mid)))
      .select("bucket").as[java.sql.Timestamp].collect()
    assert(sliced.forall(!_.before(mid)) && sliced.nonEmpty)
  }
}
