package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * The quadratic guard terms — including the windowed sum of
    * squares itself — compute in decimal(38,0), so counts up to ~1e9
    * per bucket stay exact; only the BIGINT `win_sumsq` diagnostic
    * column saturates (null, never silently wrong) past 2^63.
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
    // the sum of squares ACCUMULATES in decimal(38,0) — a LongType
    // sum(n*n) over 24 buckets wraps around ~6e8 events per bucket,
    // below the documented ~1e9 exactness bound; win_sum stays long
    // (24·n wraps only past ~3.8e17 per bucket)
    val nSq = col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)")
    val scored = dense.select(col("event_type"), col("_b").as("bucket"),
      col("n"),
      sum(col("n")).over(trail).as("win_sum"),
      sum(nSq).over(trail).as("_qD"),
      row_number().over(ord).as("_rn"))
    val wD = lit(window.toLong).cast("decimal(38,0)")
    val nD = col("n").cast("decimal(38,0)")
    val sD = col("win_sum").cast("decimal(38,0)")
    val qD = col("_qD")
    val dev = nD * wD - sD
    val varTerm = wD * qD - sD * sD
    scored.filter(col("_rn") > window)
      .select(col("event_type"), col("bucket"), col("n"),
        col("win_sum"),
        // the reported diagnostic column keeps its BIGINT schema; it
        // can only misrepresent (null under non-ANSI) past 2^63 where
        // the DECISION column is still exact
        col("_qD").cast("long").as("win_sumsq"),
        (dev * dev > lit(kSigma.toLong * kSigma).cast("decimal(38,0)") *
          varTerm).cast("int").as("anomaly"))
  }

  /** One scored bucket from the streaming scorer — the exact
    * [[rateAnomaly]] output row. `win_sumsq` is None past 2^63 (the
    * batch path's "null, never silently wrong" non-ANSI cast
    * behavior); the anomaly DECISION stays exact either way. */
  case class AnomalyRow(event_type: String, bucket: Long, n: Long,
    win_sum: Long, win_sumsq: Option[Long], anomaly: Int)

  /** The BIGINT `win_sumsq` diagnostic past 2^63: None (batch parity —
    * the non-ANSI decimal→long cast yields null), never a silently
    * wrapped low-64-bits value. The anomaly decision itself computes
    * in BigInt and stays exact regardless. */
  private[graft] def sumsqOrNone(q: BigInt): Option[Long] =
    if (q.isValidLong) Some(q.longValue) else None

  /** Keyed scorer state: open-bucket partial counts, the trailing
    * `window` finalized counts (newest first), and the next bucket to
    * finalize (−1 until the first event arrives). Public: the kryo
    * state encoder rejects non-public classes. */
  case class AnomState(pending: Map[Long, Long],
    ring: List[Long], next: Long)

  /** Streaming [[rateAnomaly]]: the SAME integer z-test, scored as
    * buckets FINALIZE under the event-time watermark (a bucket is
    * final once the watermark passes its end — late events inside the
    * allowed delay still land in their open bucket). Silent buckets
    * between a type's observed buckets zero-fill exactly like the
    * batch grid; the grid STARTS at each type's first observed bucket
    * (a stream cannot retroactively know the global range — when every
    * type is live in the first bucket, output is bit-identical to
    * [[rateAnomaly]], which StreamingParitySpec asserts). A type's
    * buckets finalize when its next event arrives (keyed state with no
    * timers — the cron/timeout emission tier can wake silent keys if
    * sub-bucket flag latency ever matters).
    *
    * Scale shape: state per type is the open-bucket map (bounded by
    * the watermark delay / bucket width) plus `window` longs — O(1)
    * per type; types scale out across executors on the groupByKey
    * shuffle, the only exchange in the plan.
    */
  def rateAnomalyStream(events: DataFrame, tsCol: String,
      typeCol: String, bucketUs: Long = 3600000000L, window: Int = 24,
      kSigma: Int = 3, watermarkDelay: String = "0 seconds")
      : Dataset[AnomalyRow] = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    require(window >= 2, s"window must be >= 2, got $window")
    require(kSigma >= 1, s"kSigma must be >= 1, got $kSigma")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[AnomState] = Encoders.kryo[AnomState]
    val w = window
    val k2 = kSigma.toLong * kSigma
    val src = events
      .select(col(typeCol).as("t"), col(tsCol).cast("long").as("ts_us"),
        timestamp_micros(col(tsCol).cast("long")).as("_ts"))
      .withWatermark("_ts", watermarkDelay)
      .as[(String, Long, java.sql.Timestamp)]
    src.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: String, it: Iterator[(String, Long, java.sql.Timestamp)],
          state: GroupState[AnomState]) =>
        var st = state.getOption.getOrElse(AnomState(Map.empty, Nil, -1L))
        var pending = st.pending
        it.foreach { e =>
          val b = Math.floorDiv(e._2, bucketUs)
          pending = pending.updated(b, pending.getOrElse(b, 0L) + 1L)
        }
        var next = if (st.next >= 0L) st.next
          else if (pending.nonEmpty) pending.keys.min else -1L
        var ring = st.ring // newest first, length <= window
        val out = List.newBuilder[AnomalyRow]
        if (next >= 0L) {
          // watermark in ms; bucket b is final when (b+1)*bucketUs <= wmUs
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          while ((next + 1L) * bucketUs <= wmUs) {
            val n = pending.getOrElse(next, 0L)
            pending = pending - next
            if (ring.length >= w) {
              val trail = ring.take(w)
              val s = trail.sum
              // BigInt before squaring (the batch decimal(38,0)
              // discipline): a Long x*x sum wraps around ~6e8 events
              // per bucket, below the documented ~1e9 bound
              val q = trail.map(x => BigInt(x) * x).sum
              val dev = BigInt(n) * w - s
              val vt = BigInt(w) * q - BigInt(s) * s
              out += AnomalyRow(key, next, n, s, sumsqOrNone(q),
                if (dev * dev > BigInt(k2) * vt) 1 else 0)
            }
            ring = (n :: ring).take(w)
            next += 1L
          }
        }
        state.update(AnomState(pending, ring, next))
        out.result().iterator
    }
  }
}
