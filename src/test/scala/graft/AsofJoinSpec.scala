package graft

import graft.operators.{AsofJoin, RangeJoin}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (1L, 100L, 10L), (1L, 205L, 11L), (2L, 50L, 20L))
    .toDF("k", "ts", "trade_id")
  private val quotes = Seq(
    (1L, 90L, 1.0), (1L, 100L, 2.0), (1L, 200L, 3.0), (3L, 10L, 9.0))
    .toDF("k", "qts", "px")

  test("asof picks the latest right row at or before each left ts") {
    val got = AsofJoin.asof(trades, quotes, Seq("k"), "ts", "qts", Seq("px"))
      .select("trade_id", "asof_px").as[(Long, Double)].collect().toMap
    // trade@100 sees quote@100 (>= convention); trade@205 sees quote@200;
    // k=2 has no quotes → dropped (inner)
    assert(got == Map(10L -> 2.0, 11L -> 3.0))
  }

  test("leftOuter keeps unmatched left rows with nulls") {
    val got = AsofJoin.asof(trades, quotes, Seq("k"), "ts", "qts",
        Seq("px"), leftOuter = true)
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(10L -> Some(2.0), 11L -> Some(3.0), 20L -> None))
  }

  test("multiple carried columns come from the SAME right row even when " +
      "the newest right row has a NULL value") {
    // right rows: @90 (px=1.0, sz=5), @200 (px=NULL, sz=7).
    // A per-column fill would give trade@205 px=1.0 (from @90) mixed with
    // sz=7 (from @200); struct-carry must give (NULL, 7) — all from @200.
    val q = Seq(
      (1L, 90L, Some(1.0), Some(5L)),
      (1L, 200L, None: Option[Double], Some(7L)))
      .toDF("k", "qts", "px", "sz")
    val got = AsofJoin.asof(trades, q, Seq("k"), "ts", "qts", Seq("px", "sz"))
      .select("trade_id", "asof_px", "asof_sz")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map { case (id, px, sz) => id -> ((px, sz)) }.toMap
    assert(got(11L) == ((None, Some(7L))))
    assert(got(10L) == ((Some(1.0), Some(5L))))
  }

  test("inner mode keeps a left row whose as-of match carries NULL values") {
    val q = Seq((1L, 90L, None: Option[Double])).toDF("k", "qts", "px")
    val got = AsofJoin.asof(trades, q, Seq("k"), "ts", "qts", Seq("px"))
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    // both k=1 trades matched the (NULL-valued) quote; k=2 trade dropped
    assert(got == Map(10L -> None, 11L -> None))
  }

  test("bucketed range join equals the naive interval join") {
    import graft.operators.RangeJoin
    val pts = (0L until 200L).map(i => (i, i * 7L)).toDF("pid", "pt")
    val ivs = (0L until 50L).map(i => (i, i * 23L, i * 23L + 40L))
      .toDF("iid", "lo", "hi")
    val naive = pts.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(7L, 40L, 100L)) {
      val bucketed = RangeJoin.pointInInterval(pts, ivs, "pt", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(bucketed == naive, s"bucketWidth=$w diverged")
    }
  }

  test("forward direction picks the earliest right row at or after") {
    val got = AsofJoin.asof(trades, quotes, Seq("k"), "ts", "qts",
        Seq("px"), direction = "forward")
      .select("trade_id", "asof_px").as[(Long, Double)].collect().toMap
    // trade@100 sees quote@100 (>= convention, forward side);
    // trade@205 has NO later quote → dropped (inner)
    assert(got == Map(10L -> 2.0))
  }

  test("nearest picks the closer side; exact ties go backward") {
    val q = Seq((1L, 95L, 1.0), (1L, 102L, 2.0), (1L, 300L, 3.0))
      .toDF("k", "qts", "px")
    val got = AsofJoin.asof(trades, q, Seq("k"), "ts", "qts", Seq("px"),
        direction = "nearest")
      .select("trade_id", "asof_px").as[(Long, Double)].collect().toMap
    // trade@100: backward d=5 (95) vs forward d=2 (102) → 2.0
    // trade@205: backward d=103 (102) vs forward d=95 (300) → 3.0
    assert(got == Map(10L -> 2.0, 11L -> 3.0))
    val tie = Seq((1L, 95L, 1.0), (1L, 105L, 2.0)).toDF("k", "qts", "px")
    val t = AsofJoin.asof(trades.filter($"trade_id" === 10L), tie,
        Seq("k"), "ts", "qts", Seq("px"), direction = "nearest")
      .select("asof_px").as[Double].head()
    assert(t == 1.0, "equal distance must tie to backward")
  }

  test("tolerance drops matches farther than the bound") {
    val got = AsofJoin.asof(trades, quotes, Seq("k"), "ts", "qts",
        Seq("px"), leftOuter = true, direction = "backward",
        tolerance = Some(4L))
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    // trade@100 → quote@100 d=0 kept; trade@205 → quote@200 d=5 > 4 →
    // null; k=2 unmatched
    assert(got == Map(10L -> Some(2.0), 11L -> None, 20L -> None))
  }

  test("nearest equals the naive min-distance reference on random data") {
    val rnd = new scala.util.Random(13)
    val lt = (1L to 80L).map(i => (i % 4, i, rnd.nextInt(500).toLong))
      .toDF("k", "lid", "lts")
    // unique right ts per key (the documented contract)
    val rt = (1L to 60L).map(i => (i % 4, i, i * 7 % 500))
      .groupBy(t => (t._1, t._3)).map(_._2.head).toSeq
      .toDF("k", "rid", "rts")
    val got = AsofJoin.asof(lt, rt, Seq("k"), "lts", "rts", Seq("rid"),
        leftOuter = true, direction = "nearest")
      .select("lid", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    val rm = rt.as[(Long, Long, Long)].collect()
    val exp = lt.as[(Long, Long, Long)].collect().map {
      case (k, lid, lts) =>
        val cands = rm.filter(_._1 == k)
        lid -> (if (cands.isEmpty) None
          else Some(cands.minBy(c =>
            (math.abs(c._3 - lts), if (c._3 > lts) 1 else 0))._2))
    }.toMap
    assert(got == exp)
  }

  test("intervalOverlap equals the naive nested loop at any bucket width") {
    val rnd = new scala.util.Random(11)
    val as = (1L to 60L).map { i =>
      val lo = rnd.nextInt(300).toLong; (i, lo, lo + rnd.nextInt(50))
    }.toDF("aid", "a_lo", "a_hi")
    val bs = (1L to 60L).map { i =>
      val lo = rnd.nextInt(300).toLong; (i, lo, lo + rnd.nextInt(80))
    }.toDF("bid", "b_lo", "b_hi")
    val naive = as.join(bs, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(naive.length == naive.toSet.size)
    for (w <- Seq(7L, 64L, 500L)) {
      val bucketed = RangeJoin.intervalOverlap(as, bs, "a_lo", "a_hi",
          "b_lo", "b_hi", w)
        .select("aid", "bid").as[(Long, Long)].collect()
      // exactly-once: multiset equality, not just set equality
      assert(bucketed.length == naive.length, s"w=$w duplicated pairs")
      assert(bucketed.toSet == naive.toSet, s"w=$w diverged")
    }
  }
}
