package graft

import graft.operators.Anomaly

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  // events at bucketUs = 10: ts = bucket * 10 + offset
  private def ev(rows: (String, Long, Int)*) =
    rows.flatMap { case (t, b, n) =>
      (0 until n).map(i => (t, b * 10L + i % 10)) }
      .toDF("event_type", "ts_us")

  test("rateAnomaly flags a spike after a flat window, not the flat tail") {
    val df = ev(("a", 0L, 2), ("a", 1L, 2), ("a", 2L, 2), ("a", 3L, 2),
      ("a", 4L, 2), ("a", 5L, 9))
    val got = Anomaly.rateAnomaly(df, "ts_us", "event_type",
        bucketUs = 10L, window = 4, kSigma = 2)
      .as[(String, Long, Long, Long, Long, Int)].collect()
      .map(r => r._2 -> r).toMap
    // warm-up buckets 0-3 are unscored
    assert(got.keySet == Set(4L, 5L))
    // bucket 4: trail S=8 Q=16, n=2 -> dev=0, no flag
    assert(got(4L) == (("a", 4L, 2L, 8L, 16L, 0)))
    // bucket 5: trail S=8 Q=16 (buckets 1-4), n=9 -> dev=28, var=0 -> flag
    assert(got(5L) == (("a", 5L, 9L, 8L, 16L, 1)))
  }

  test("rateAnomaly: zero-variance window flags any movement at all") {
    val df = ev(("a", 0L, 2), ("a", 1L, 2), ("a", 2L, 2), ("a", 3L, 2),
      ("a", 4L, 3))
    val got = Anomaly.rateAnomaly(df, "ts_us", "event_type",
        bucketUs = 10L, window = 4, kSigma = 3)
      .as[(String, Long, Long, Long, Long, Int)].collect()
    assert(got.length == 1 && got.head._6 == 1)
  }

  test("rateAnomaly zero-fills silent buckets on the shared global grid") {
    val df = ev(("a", 0L, 1), ("a", 5L, 1), ("b", 0L, 1), ("b", 1L, 1),
      ("b", 2L, 1), ("b", 3L, 1), ("b", 4L, 1), ("b", 5L, 1))
    val got = Anomaly.rateAnomaly(df, "ts_us", "event_type",
        bucketUs = 10L, window = 4, kSigma = 2)
      .as[(String, Long, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // type a went silent buckets 1-4: trail of bucket 5 is all zeros
    // (S=0, Q=0), n=1 -> dev=4, var=0 -> flagged
    assert(got(("a", 5L)) == (("a", 5L, 1L, 0L, 0L, 1)))
    // type b is flat ones: S=4 Q=4, n=1 -> dev=0 -> no flag
    assert(got(("b", 5L)) == (("b", 5L, 1L, 4L, 4L, 0)))
    // both types score buckets 4 and 5 on the same global grid
    assert(got.keySet == Set(("a", 4L), ("a", 5L), ("b", 4L), ("b", 5L)))
  }

  test("streaming win_sumsq nulls (not wraps) past 2^63 — batch parity") {
    import graft.operators.Anomaly
    // in range: exact value
    assert(Anomaly.sumsqOrNone(BigInt(Long.MaxValue)) ==
      Some(Long.MaxValue))
    assert(Anomaly.sumsqOrNone(BigInt(42)) == Some(42L))
    // past 2^63: None, matching the batch non-ANSI decimal->long cast
    // (null, never the truncated low 64 bits)
    assert(Anomaly.sumsqOrNone(BigInt(Long.MaxValue) + 1) == None)
    assert(Anomaly.sumsqOrNone(BigInt(3100000000L) * 3100000000L * 2)
      == None)
  }
}
