package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** B27: incremental multi-granularity aggregation — Siddhi's
  * `define aggregation … aggregate by ts every sec…year` cascade
  * (grammar pass-through in the reference, SURVEY §2.B27).
  *
  * The base table is scanned and aggregated ONCE at the finest
  * granularity; every coarser level re-aggregates the previous level's
  * partial aggregates (sums of sums, sums of counts — additive merge),
  * so a year-level rollup over 100 TB touches the raw data exactly once.
  * Spark's ReuseExchange dedups the shared shuffle across the unioned
  * branches at runtime.
  */
object Rollup {

  /** @param granularities finest-first `date_trunc` units, e.g.
    *                      Seq("minute", "hour", "day")
    * @return one row per (granularity, bucket) with additive aggregates
    *         `sum_v` and `n` (avg = sum_v / n at any level)
    */
  def cascade(df: DataFrame, ts: Column, valueCol: Column,
      granularities: Seq[String]): DataFrame = {
    require(granularities.nonEmpty)
    val base = df
      .groupBy(date_trunc(granularities.head, ts).as("bucket"))
      .agg(sum(valueCol).as("sum_v"), count(lit(1)).as("n"))
      .withColumn("granularity", lit(granularities.head))
    val levels = granularities.tail.scanLeft(base) { (prev, g) =>
      prev.groupBy(date_trunc(g, col("bucket")).as("bucket"))
        .agg(sum(col("sum_v")).as("sum_v"), sum(col("n")).as("n"))
        .withColumn("granularity", lit(g))
    }
    levels.reduce(_.unionByName(_))
  }

  /** Dimensional CUBE report — the OLAP dashboard feed next to
    * [[cascade]]'s time cascade: every subset of {type, day} rolled up
    * in ONE pass (`(type, day)`, `(type, *)`, `(*, day)`, `(*, *)`),
    * with `gid` the standard grouping-id bitmask (bit set ⇔ that
    * dimension is rolled up in the row). Measures are count and
    * distinct users — all integers, engine-exact.
    *
    * Scale shape: Spark plans CUBE as a single Expand + one hash
    * aggregation — the event scan runs once, the expand multiplies
    * rows 4× map-side, and the aggregation stays keyed by the expanded
    * grouping columns (no per-subset rescans, no driver loops). The
    * distinct-user measure adds the standard two-level distinct
    * expand, still fully keyed.
    */
  def cubeReport(events: DataFrame, typeCol: String, tsUsCol: String,
      userCol: String, dayUs: Long = 86400000000L): DataFrame = {
    require(dayUs >= 1, s"dayUs must be >= 1, got $dayUs")
    events
      .select(col(typeCol).as("event_type"),
        expr(s"$tsUsCol div $dayUs").cast("long").as("day"),
        col(userCol).as("_u"))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("_u")).as("n_users"),
        grouping_id().cast("long").as("gid"))
  }

  /** Siddhi's `from agg within <from>,<to> per '<granularity>'` read
    * surface: select one granularity (and optionally a bucket range)
    * out of a [[cascade]] result. The granularity filter prunes the
    * union branch; at rest (partitioned storage) it prunes partitions.
    */
  def at(cascaded: DataFrame, granularity: String,
      from: Option[Column] = None, to: Option[Column] = None): DataFrame = {
    val g = cascaded.filter(col("granularity") === granularity)
    val lo = from.map(f => g.filter(col("bucket") >= f)).getOrElse(g)
    to.map(t => lo.filter(col("bucket") < t)).getOrElse(lo)
  }
}
