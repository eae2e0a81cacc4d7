package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate-anomaly detection over event streams — the ops-monitoring
  * report next to [[Funnel]]'s product reports (reference scope: the
  * alerting consumer its CEP patterns feed; this is the statistical
  * complement to those exact-pattern rules). Event counts are bucketed
  * per type on a fixed time grid and each bucket is scored against the
  * trailing window with an ALL-INTEGER z-test: flag when
  * `(n·W − S)² > k²·(W·Q − S²)` where `S`/`Q` are the trailing
  * window's sum and sum-of-squares — algebraically `z² > k²` with the
  * population variance, but free of divisions, square roots, and
  * doubles, so results are bit-identical on every engine and under any
  * partitioning (zero-variance windows flag exactly when the count
  * moves at all).
  */
object Anomaly {

  /** Per-type sliding z-score anomaly flags: `(event_type, bucket, n,
    * win_sum, win_sumsq, anomaly)` for every bucket with a FULL
    * `window`-bucket trailing history (earlier buckets are warm-up and
    * are not scored; the trailing window EXCLUDES the current bucket,
    * so a spike never masks itself). Missing buckets count as zero —
    * a type going silent is as much signal as a burst.
    *
    * Scale shape: one hash aggregation to (type, bucket) counts; the
    * dense grid is types × buckets built from a broadcast 1-row range
    * and stays bounded by construction (pick `bucketUs` so the grid is
    * ≤ ~1e6 buckets per type — an explode of `sequence()`; a
    * multi-year-at-minutes grid wants a coarser bucket or a ranged
    * join). The sliding window partitions by type — no global sort.
    * The quadratic guard terms compute in decimal(38,0), so counts up
    * to ~1e9 per bucket stay exact.
    */
  def rateAnomaly(events: DataFrame, tsCol: String, typeCol: String,
      bucketUs: Long = 3600000000L, window: Int = 24,
      kSigma: Int = 3): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    require(window >= 2, s"window must be >= 2, got $window")
    require(kSigma >= 1, s"kSigma must be >= 1, got $kSigma")
    val e = events.select(col(typeCol).as("event_type"),
      expr(s"$tsCol div $bucketUs").cast("long").as("_b"))
    val cnt = e.groupBy(col("event_type"), col("_b"))
      .agg(count(lit(1)).as("n"))
    val rng = e.agg(min(col("_b")).as("_lo"), max(col("_b")).as("_hi"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(rng))
      .select(col("event_type"),
        explode(sequence(col("_lo"), col("_hi"))).as("_b"))
    val dense = grid.join(cnt, Seq("event_type", "_b"), "left")
      .select(col("event_type"), col("_b"),
        coalesce(col("n"), lit(0L)).as("n"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("_b"))
      .rowsBetween(-window.toLong, -1L)
    val ord = Window.partitionBy(col("event_type")).orderBy(col("_b"))
    val scored = dense.select(col("event_type"), col("_b").as("bucket"),
      col("n"),
      sum(col("n")).over(trail).as("win_sum"),
      sum(col("n") * col("n")).over(trail).as("win_sumsq"),
      row_number().over(ord).as("_rn"))
    val wD = lit(window.toLong).cast("decimal(38,0)")
    val nD = col("n").cast("decimal(38,0)")
    val sD = col("win_sum").cast("decimal(38,0)")
    val qD = col("win_sumsq").cast("decimal(38,0)")
    val dev = nD * wD - sD
    val varTerm = wD * qD - sD * sD
    scored.filter(col("_rn") > window)
      .select(col("event_type"), col("bucket"), col("n"),
        col("win_sum"), col("win_sumsq"),
        (dev * dev > lit(kSigma.toLong * kSigma).cast("decimal(38,0)") *
          varTerm).cast("int").as("anomaly"))
  }
}
