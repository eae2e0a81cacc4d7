package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import graft.cep.{Cep, PatternDef, Step}
import graft.plans.MatchRecognize
import graft.plans.MatchRecognize.{EAnd, ENotFor, EOr, EStep}

/** Random-pattern event row for the seeded plan-vs-kernel equivalence. */
case class REv(event_id: Long, ts_us: Long, user_id: Long, event_type: String)

class MatchRecognizeSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.eventsTsUs(spark, sfDir)
    .select($"event_id", $"ts_us", $"user_id", $"event_type", $"value")

  test("custom plan matches the Dataset-API CEP executor (q14 pattern)") {
    val viaPlan = MatchRecognize(events, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"event_type" === "click"),
          EStep("b", $"event_type" === "purchase")),
        withinTs = Some(600000000L))
      .select($"user_id",
        element_at($"a", 1).getField("event_id").as("a_id"),
        element_at($"b", 1).getField("event_id").as("b_id"))
      .as[(Long, Long, Long)].collect().toSet

    val pat = PatternDef[Evt](IndexedSeq(
      Step[Evt]("a", _.event_type == "click"),
      Step[Evt]("b", _.event_type == "purchase")),
      withinMs = Some(600000000L))
    val viaDataset = Cep.batch[Evt, Long, PairOut](
      events.as[Evt], _.user_id, pat, _.ts_us,
      Seq(col("ts_us"), col("event_id"))) { (k, m) =>
      Iterator.single(PairOut(k, m.head("a").event_id, m.head("b").event_id))
    }.collect().map(p => (p.user_id, p.a_id, p.b_id)).toSet

    assert(viaPlan.nonEmpty && viaPlan == viaDataset)
  }

  test("logical OR and absence elements run through the custom plan") {
    val df = Seq(
      // user 1: A at 10 then B at 20 -> or completes on B
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      // user 2: A at 10, nothing in (10, 110) -> absence fires at 110
      (3L, 10L, 2L, "A"), (4L, 500L, 2L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")

    val orOut = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("s", $"event_type" === "A"),
          EOr("b", $"event_type" === "B", "c", $"event_type" === "C")))
      .select($"user_id", size($"b").as("nb"), size($"c").as("nc"))
      .as[(Long, Int, Int)].collect().toSet
    // user 1 completes via b; user 2 via c (the C at 500)
    assert(orOut == Set((1L, 1, 0), (2L, 0, 1)))

    val absOut = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("s", $"event_type" === "A"),
          ENotFor("n", $"event_type" === "B", 100L)))
      .select($"user_id", $"match_end")
      .as[(Long, Long)].collect().toSet
    // user 1's B at 20 violates; user 2's window elapses at 110
    assert(absOut == Set((2L, 110L)))
  }

  test("quantifier <2:2> with indexed access matches the q34 shape") {
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "buy"),
      (4L, 10L, 2L, "click"), (5L, 30L, 2L, "buy"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val out = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"event_type" === "click", min = 2, max = 2),
          EStep("b", $"event_type" === "buy")))
      .select($"user_id",
        element_at($"a", 1).getField("event_id").as("a0"),
        element_at($"a", 2).getField("event_id").as("a1"),
        element_at($"b", 1).getField("event_id").as("b"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L, 3L))) // user 2 has only one click
  }

  test("plan shape: one shuffle from cold input; none when pre-partitioned") {
    // AQE wraps the plan in AdaptiveSparkPlanExec, hiding exchanges from
    // collect() until execution — inspect the static plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try testPlanShape()
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def testPlanShape(): Unit = {
    val pat = Seq(EStep("a", $"event_type" === "click"),
      EStep("b", $"event_type" === "purchase"))

    val cold = MatchRecognize(events, Seq("user_id"), "ts_us", "event_id", pat)
    val coldShuffles = cold.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(coldShuffles.length == 1, "expected exactly one hash shuffle")

    val prepart = events.repartition($"user_id")
    val warm = MatchRecognize(prepart, Seq("user_id"), "ts_us", "event_id", pat)
    val warmPlan = warm.queryExecution.executedPlan
    val warmShuffles = warmPlan.collect { case e: ShuffleExchangeExec => e }
    // the repartition's own exchange is the only one — MatchRecognizeExec
    // reuses it instead of adding a second
    assert(warmShuffles.length == 1,
      s"expected the repartition exchange only, got:\n$warmPlan")
    assert(warmPlan.collect { case s: SortExec => s }.nonEmpty,
      "expected a partition-local sort satisfying the NFA's order")
  }

  test("custom exec streams a 10^7-event hot key (bounded memory, metrics)") {
    // one key, alternating A/B: the skew worst case (bot user at
    // 100 TB). The exec must feed the sorted partition through the NFA
    // without materializing the group — state stays O(live partials),
    // and the SQL metrics count every match and key group.
    val n = 10000000L
    val df = spark.range(n).selectExpr("id AS event_id", "id * 10 AS ts_us",
      "1L AS user_id",
      "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS event_type")
    val out = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
      Seq(EStep("a", $"event_type" === "A"),
        EStep("b", $"event_type" === "B")),
      withinTs = Some(100L))
    // AQE re-plans lazily and hides the exec node — use the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = out.queryExecution
      assert(qe.executedPlan.execute().count() == n / 2)
      val exec = qe.executedPlan.collect {
        case m: graft.plans.MatchRecognizeExec => m
      }.head
      assert(exec.metrics("numMatches").value == n / 2)
      assert(exec.metrics("numGroups").value == 1L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("strategy injected via GraftExtensions resolves the node without " +
      "builder self-registration") {
    import graft.plans.{GraftExtensions, MatchRecognizeStrategy}
    // a session built withExtensions gets the strategy at construction;
    // simulate by asserting the extension wires it into extraStrategies'
    // equivalent injection point (same object identity the builder uses)
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts)
    val injected = org.apache.spark.sql.GraftSqlBridge
      .plannerStrategies(exts, spark)
    assert(injected.contains(MatchRecognizeStrategy))
  }

  test("randomized patterns: custom plan == in-memory NFA replay (8 seeds)") {
    import graft.cep.{Absence, AltSeq, GAlt, GPerm, GroupSeq, GVar, Logical, NestedGroup, Nfa, PatternDef, Permute, PermSeq, Step}
    import graft.cep.PatternElem
    import graft.plans.MatchRecognize.Elem

    for (seed <- 0 until 8) {
      val r = new scala.util.Random(seed)
      def typ() = Seq("A", "B", "C")(r.nextInt(3))
      // parallel user-facing elems + kernel elems from one random spec
      val n = 1 + r.nextInt(3)
      val specs: IndexedSeq[(Elem, PatternElem[REv])] = (0 until n).map { i =>
        // the head may not be a logical/absence element (original
        // constraint) — remap head draws 4..8 onto the round-11/12
        // group/permute/alternation elements, which ARE valid heads
        // (their generators keep minRepeat >= 1)
        val draw0 = r.nextInt(if (i == 0) 10 else 12)
        val draw = if (i == 0 && draw0 >= 4) draw0 + 2 else draw0
        draw match {
          case 11 =>
            // recursive Rx element (v1{im,ix} v2){gm,gx} — round-13
            import graft.cep.{RxElem, RxRep, RxSeq, RxVar}
            val (t1, t2) = (typ(), typ())
            val im = 1 + r.nextInt(2); val ix = im + r.nextInt(2)
            val gm = 1 + r.nextInt(2); val gx = gm + r.nextInt(2)
            (MatchRecognize.ERx(MatchRecognize.ERxRep(
                MatchRecognize.ERxSeq(Seq(
                  MatchRecognize.ERxVar(s"s${i}ra",
                    $"event_type" === t1, im, ix),
                  MatchRecognize.ERxVar(s"s${i}rb",
                    $"event_type" === t2))), gm, gx)): Elem,
              RxElem[REv](RxRep(RxSeq(IndexedSeq[graft.cep.RxNode[REv]](
                RxVar(Step[REv](s"s${i}ra", _.event_type == t1), im, ix),
                RxVar(Step[REv](s"s${i}rb", _.event_type == t2)))),
                gm, gx)): PatternElem[REv])
          case 8 =>
            // quantified PERMUTE — round-12 element
            val (t1, t2) = (typ(), typ())
            val mn = 1 + r.nextInt(2)
            val mx = mn + r.nextInt(2)
            (MatchRecognize.EPermuteQ(Seq(
                s"s${i}p" -> ($"event_type" === t1),
                s"s${i}q" -> ($"event_type" === t2)), mn, mx): Elem,
              PermSeq[REv](IndexedSeq(
                Step[REv](s"s${i}p", _.event_type == t1),
                Step[REv](s"s${i}q", _.event_type == t2)), mn, mx):
                PatternElem[REv])
          case 9 =>
            // quantified alternation — round-12 element
            val (t1, t2) = (typ(), typ())
            val mn = 1 + r.nextInt(2)
            val mx = mn + r.nextInt(3)
            (MatchRecognize.EOrQ(s"s${i}l", $"event_type" === t1,
                s"s${i}r", $"event_type" === t2, mn, mx): Elem,
              AltSeq[REv](Step[REv](s"s${i}l", _.event_type == t1),
                Step[REv](s"s${i}r", _.event_type == t2), mn, mx):
                PatternElem[REv])
          case 10 =>
            // nested group (v (x|y)){mn,mx} — round-12 element
            val (tv, t1, t2) = (typ(), typ(), typ())
            val mn = 1 + r.nextInt(2)
            val mx = mn + r.nextInt(2)
            (MatchRecognize.EGroupN(Seq(
                MatchRecognize.EGStep(s"s${i}v", $"event_type" === tv),
                MatchRecognize.EGAlt(s"s${i}x", $"event_type" === t1,
                  s"s${i}y", $"event_type" === t2)), mn, mx): Elem,
              NestedGroup[REv](IndexedSeq(
                GVar(Step[REv](s"s${i}v", _.event_type == tv)),
                GAlt(Step[REv](s"s${i}x", _.event_type == t1),
                  Step[REv](s"s${i}y", _.event_type == t2))), mn, mx):
                PatternElem[REv])
          case 6 =>
            // quantified group (x y){mn,mx} — round-11 element
            val (t1, t2) = (typ(), typ())
            val mn = 1 + r.nextInt(2)
            val mx = mn + r.nextInt(2)
            (MatchRecognize.EGroup(Seq(
                s"s${i}x" -> ($"event_type" === t1),
                s"s${i}y" -> ($"event_type" === t2)), mn, mx): Elem,
              GroupSeq[REv](IndexedSeq(
                Step[REv](s"s${i}x", _.event_type == t1),
                Step[REv](s"s${i}y", _.event_type == t2)), mn, mx):
                PatternElem[REv])
          case 7 =>
            // n-ary permute — round-11 element
            val (t1, t2, t3) = (typ(), typ(), typ())
            (MatchRecognize.EPermute(Seq(
                s"s${i}p" -> ($"event_type" === t1),
                s"s${i}q" -> ($"event_type" === t2),
                s"s${i}r" -> ($"event_type" === t3))): Elem,
              Permute[REv](IndexedSeq(
                Step[REv](s"s${i}p", _.event_type == t1),
                Step[REv](s"s${i}q", _.event_type == t2),
                Step[REv](s"s${i}r", _.event_type == t3))):
                PatternElem[REv])
          case 4 =>
            val (t1, t2, and) = (typ(), typ(), r.nextBoolean())
            val e: Elem =
              if (and) EAnd(s"s${i}l", $"event_type" === t1,
                s"s${i}r", $"event_type" === t2)
              else EOr(s"s${i}l", $"event_type" === t1,
                s"s${i}r", $"event_type" === t2)
            val k: PatternElem[REv] =
              Logical[REv](Step[REv](s"s${i}l", _.event_type == t1),
                Step[REv](s"s${i}r", _.event_type == t2), and)
            (e, k)
          case 5 =>
            val (t, d) = (typ(), 5L + r.nextInt(46))
            (ENotFor(s"s$i", $"event_type" === t, d): Elem,
              Absence[REv](Step[REv](s"s$i", _.event_type == t), d):
                PatternElem[REv])
          case _ =>
            val t = typ()
            val mn = 1 + r.nextInt(3)
            val mx = mn + r.nextInt(3)
            val strict = i > 0 && r.nextBoolean()
            (EStep(s"s$i", $"event_type" === t, mn, mx, strict): Elem,
              Step[REv](s"s$i", _.event_type == t, mn, mx, strict):
                PatternElem[REv])
        }
      }
      val within = if (r.nextBoolean()) Some(10L + r.nextInt(191)) else None
      var t = 0L
      val evs = (1 to 120).map { i =>
        t += r.nextInt(21)
        REv(i.toLong, t, r.nextInt(3).toLong, typ())
      }

      val kernelPat = PatternDef[REv](
        specs.map(_._2).toIndexedSeq, withinMs = within)
      val slotNames = kernelPat.steps.flatMap(_.names)
      val expected = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val nfa = new Nfa[REv](kernelPat, _.ts_us)
        val sorted = es.sortBy(e => (e.ts_us, e.event_id))
        (sorted.flatMap(nfa.onEvent) ++ nfa.flush()).map(m =>
          (u, m.startTs, m.endTs,
            slotNames.map(sn => sn -> m.get(sn).map(_.event_id)).toMap))
      }.sortBy(x => (x._1, x._2, x._3, x._4.toSeq.sortBy(_._1).mkString))

      val planOut = MatchRecognize(
          evs.map(e => (e.event_id, e.ts_us, e.user_id, e.event_type))
            .toDF("event_id", "ts_us", "user_id", "event_type"),
          Seq("user_id"), "ts_us",
          "event_id", specs.map(_._1), withinTs = within)
        .select(col("user_id") +: col("match_start") +: col("match_end") +:
          slotNames.map(sn =>
            transform(col(sn), s => s.getField("event_id")).as(sn)): _*)
        .collect().toSeq.map { row =>
          (row.getLong(0), row.getLong(1), row.getLong(2),
            slotNames.zipWithIndex.map { case (sn, i) =>
              sn -> row.getSeq[Long](3 + i) }.toMap)
        }.sortBy(x => (x._1, x._2, x._3, x._4.toSeq.sortBy(_._1).mkString))

      assert(planOut == expected, s"seed=$seed diverged")
    }
  }

  test("builder fails fast on unknown columns and non-long ts") {
    val df = Seq((1L, 10L, "A")).toDF("event_id", "ts_us", "event_type")
    assertThrows[IllegalArgumentException](
      MatchRecognize(df, Seq("nope"), "ts_us", "event_id",
        Seq(EStep("a", $"event_type" === "A"))))
    assertThrows[IllegalArgumentException](
      MatchRecognize(df, Seq("event_id"), "event_type", "event_id",
        Seq(EStep("a", $"event_type" === "A"))))
  }

  test("running aggregates in DEFINE: AVG/MIN/MAX/COUNT over another " +
      "variable's binding, SUM over the variable's own binding") {
    val df = Seq(
      // g1: a=(2,4) then b with v=5 > avg(a)=3 — matches
      (1L, 10L, 1L, 2.0, "A"), (2L, 20L, 1L, 4.0, "A"),
      (3L, 30L, 1L, 5.0, "B"),
      // g2: a=(1,7) then b with v=3 < avg(a)=4 — no match
      (4L, 40L, 2L, 1.0, "A"), (5L, 50L, 2L, 7.0, "A"),
      (6L, 60L, 2L, 3.0, "B"))
      .toDF("event_id", "ts_us", "user_id", "v", "event_type")
    df.createOrReplaceTempView("mr_cvagg_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cvagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a1, b.event_id AS bid
          |  PATTERN (a a2 b)
          |  DEFINE a AS event_type = 'A', a2 AS event_type = 'A',
          |         b AS event_type = 'B' AND b.v > AVG(a.v) + AVG(a2.v)
          |             - (AVG(a.v) + AVG(a2.v)) / 2 + 0.0 * (
          |               MIN(a.v) + MAX(a.v) + COUNT(a.v))
          |)""".stripMargin))
      .select($"user_id", $"a1", $"bid")
      .as[(Long, Long, Long)].collect().toSet
    // b.v > (avg(a)+avg(a2))/2 == the two-variable mean; the 0.0*
    // term exercises MIN/MAX/COUNT resolution in the same predicate
    assert(got == Set((1L, 1L, 3L)))

    // own-variable running SUM: s{2,2} binds while the running sum
    // stays <= 6, non-strict (skip-till-next) — the second s skips
    // the v=9 row (6+9 > 15? running sum 2+9=11 > 6) and binds v=3
    val df2 = Seq(
      (1L, 10L, 1L, 2.0, "V"), (2L, 20L, 1L, 9.0, "V"),
      (3L, 30L, 1L, 3.0, "V"), (4L, 40L, 1L, 1.0, "E"))
      .toDF("event_id", "ts_us", "user_id", "v", "event_type")
    df2.createOrReplaceTempView("mr_cvagg2_view")
    val got2 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cvagg2_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(s.event_id) AS s1, LAST(s.event_id) AS s2,
          |           b1.event_id AS eid
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (s{2,2} b1)
          |  DEFINE s AS event_type = 'V' AND SUM(s.v) <= 6.0,
          |         b1 AS event_type = 'E'
          |)""".stripMargin))
      .select($"s1", $"s2", $"eid")
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == Set((1L, 3L, 4L)))
  }

  test("integer tie-break column: same-ts election widens negatives " +
      "correctly; non-integral tie fails fast") {
    // event_id is IntegerType with a NEGATIVE value: the executor reads
    // the tie as a raw long slot, so without the builder's widening
    // Cast a zero-extended 32-bit read would order -2 AFTER 1 and the
    // skip election would crown the wrong leftmost candidate
    val df = Seq((-2, 10L, 1L, "A"), (1, 10L, 1L, "A"), (5, 20L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val out = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
      Seq(EStep("a", $"event_type" === "A"),
        EStep("b", $"event_type" === "B")),
      skipPastLastRow = true)
      .select(element_at($"a", 1).getField("event_id").as("a_id"))
      .as[Int].collect().toSeq
    assert(out == Seq(-2))
    // non-integral tie fails fast only when the (ts, tie) identity is
    // consumed (skip modes / reluctant / cross-var); plain every-match
    // mode keeps the raw column as the sort tie (see the dedicated
    // non-integral-tie test)
    val e = intercept[IllegalArgumentException] {
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_type",
        Seq(EStep("a", $"event_type" === "A")), skipPastLastRow = true)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("streaming deferred skip mode (cross-variable DEFINE + skip) " +
      "fails fast at plan build without WITHIN") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("event_id", "ts_ms", "user", "typ")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
    val e = intercept[IllegalArgumentException] {
      graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(EStep("a", $"typ" === "A"),
          EStep("b", ($"typ" === "B") &&
            ($"event_id" > MatchRecognize.cvFirst("a", "event_id")))),
        eventTimeCol = "etc", withinTs = None, skipPastLastRow = true)
    }
    assert(e.getMessage.contains("WITHIN"))
  }

  test("fluent env surface: from(...).matchRecognize(...) composes") {
    val env = new GraftCEP(spark)
    env.registerStream("mr_ev", Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type"))
    val out = env.from("mr_ev")
      .matchRecognize(Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"event_type" === "A"),
          EStep("b", $"event_type" === "B")))
      .select(element_at($"a", 1).getField("event_id").as("a_id"))
      .toDF
    assert(out.as[Long].collect().toSeq == Seq(1L))
  }

  test("streaming MatchRecognize: same Elem surface, watermark-ordered, " +
      "out-of-order across micro-batches, composite key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts_ms, region, user, typ)
    val input = MemoryStream[(Long, Long, String, Long, String)]
    val df = input.toDF()
      .toDF("event_id", "ts_ms", "region", "user", "typ")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
    val out = graft.plans.MatchRecognize.streaming(df,
      Seq("region", "user"), "ts_ms", "event_id",
      Seq(EStep("a", $"typ" === "A"), EStep("b", $"typ" === "B")),
      eventTimeCol = "etc", withinTs = Some(10000L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_stream").start()
    try {
      // batch 1: east's B@2000 arrives BEFORE its A@1000 (intra-batch
      // disorder) and west's A lands too; watermark still at 0
      input.addData((2L, 2000L, "east", 1L, "B"), (1L, 1000L, "east", 1L, "A"),
        (3L, 1000L, "west", 1L, "A"))
      q.processAllAvailable()
      // batch 2: west's B straddles the micro-batch boundary (still
      // inside the 10s watermark delay); the tick advances the
      // watermark to 20s, releasing both keys through their NFAs
      input.addData((5L, 1500L, "west", 1L, "B"), (6L, 30000L, "east", 9L, "X"))
      q.processAllAvailable()
      // batch 3: far-future tick flushes any remainder
      input.addData((7L, 100000L, "east", 9L, "X"))
      q.processAllAvailable()
      val got = spark.table("mr_stream")
        .select($"region", $"user", $"match_start", $"match_end",
          element_at($"binds", "a").as("a_tie"),
          element_at($"binds", "b").as("b_tie"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        ("east", 1L, 1000L, 2000L, 1L, 2L),
        ("west", 1L, 1000L, 1500L, 3L, 5L)))
    } finally q.stop()
  }

  test("streaming MatchRecognize on the transformWithState executor " +
      "(useTws) produces the same matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("event_id", "ts_ms", "user", "typ")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
    val out = graft.plans.MatchRecognize.streaming(df, Seq("user"),
      "ts_ms", "event_id",
      Seq(EStep("a", $"typ" === "A"), EStep("b", $"typ" === "B")),
      eventTimeCol = "etc", useTws = true)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_tws").start()
    try {
      input.addData((2L, 2000L, 1L, "B"), (1L, 1000L, 1L, "A"))
      q.processAllAvailable()
      input.addData((9L, 60000L, 9L, "X"))
      q.processAllAvailable()
      val got = spark.table("mr_tws")
        .select($"user", element_at($"binds", "a"), element_at($"binds", "b"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 2L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("round-12 elements on the transformWithState executor: nested " +
      "group and skip-to-var match the fMGWS executor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rows = Seq(
      (1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"),
      (3L, 3000L, 1L, "A"), (4L, 4000L, 1L, "C"), (5L, 5000L, 1L, "D"))
    def run(useTws: Boolean): Set[(Long, Int, Long)] = {
      val input = MemoryStream[(Long, Long, Long, String)]
      val df = input.toDF().toDF("event_id", "ts_ms", "user", "typ")
        .withColumn("etc", timestamp_millis($"ts_ms"))
        .withWatermark("etc", "10 seconds")
      val out = graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(MatchRecognize.EGroupN(Seq(
            MatchRecognize.EGStep("a", $"typ" === "A"),
            MatchRecognize.EGAlt("b", $"typ" === "B",
              "c", $"typ" === "C")), 2, 2),
          EStep("d", $"typ" === "D")),
        eventTimeCol = "etc", withinTs = Some(100000L), useTws = useTws,
        skipToVar = Some(("d", false)))
      val name = s"mr_tws12_$useTws"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(rows.take(2): _*)
        q.processAllAvailable()
        input.addData(rows.drop(2) :+ ((9L, 60000L, 9L, "X")): _*)
        q.processAllAvailable()
        spark.table(name)
          .select($"user", size($"a").as("n_a"),
            element_at($"d", 1).getField("event_id").as("d_id"))
          .as[(Long, Int, Long)].collect().toSet
      } finally q.stop()
    }
    def runUn(useTws: Boolean): Set[(Long, Option[Long], Long)] = {
      val input = MemoryStream[(Long, Long, Long, String)]
      val df = input.toDF().toDF("event_id", "ts_ms", "user", "typ")
        .withColumn("etc", timestamp_millis($"ts_ms"))
        .withWatermark("etc", "10 seconds")
      // cross-variable predicate + WITH UNMATCHED ROWS, both lifted
      // onto the transformWithState executor this round
      val out = graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(EStep("a", $"typ" === "A"),
          EStep("b", ($"typ" === "B") &&
            ($"event_id" > MatchRecognize.cvFirst("a", "event_id")))),
        eventTimeCol = "etc", withinTs = Some(10000L), useTws = useTws,
        withUnmatched = true)
      val name = s"mr_twsun_$useTws"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData((1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"),
          (3L, 3000L, 1L, "X"))
        q.processAllAvailable()
        input.addData((9L, 60000L, 9L, "Z"))
        q.processAllAvailable()
        spark.table(name).filter($"user" === 1L)
          .select($"user", $"match_start",
            coalesce(try_element_at($"b", lit(1)).getField("event_id"),
              $"_mr_unmatched_ev.event_id").as("which"))
          .as[(Long, Option[Long], Long)].collect().toSet
      } finally q.stop()
    }
    try {
      val tws = run(useTws = true)
      val fm = run(useTws = false)
      assert(tws == fm)
      assert(tws == Set((1L, 2, 5L)))
      val twsU = runUn(useTws = true)
      val fmU = runUn(useTws = false)
      assert(twsU == fmU)
      // matched pair (a=1, b=2) plus the never-bound X row
      assert(twsU == Set((1L, Some(1000L), 2L), (1L, None, 3L)))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("pattern anchors ^ and $: partition-boundary predicates on the " +
      "edge variables; '$' rejected on streams; quantified edges fail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "B"),
      (5L, 10L, 2L, "B"), (6L, 20L, 2L, "A"), (7L, 30L, 2L, "B"))
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_anchor_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(pattern: String): Set[(Long, Long, Long)] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_anchor_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, b.event_id AS b_id
           |  PATTERN ($pattern)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
           |)""".stripMargin))
        .select($"user_id", $"a_id", $"b_id")
        .as[(Long, Long, Long)].collect().toSet
    // unanchored: every A pairs with its next B; user 2's A at row 6
    assert(run("a b") ==
      Set((1L, 1L, 2L), (1L, 3L, 4L), (2L, 6L, 7L)))
    // ^: only matches starting at the partition's first row (user 2's
    // first row is a B, so user 2 drops out entirely)
    assert(run("^ a b") == Set((1L, 1L, 2L)))
    // $: the b must be the partition's last row (relaxed matching, so
    // BOTH user-1 As pair with the final B)
    assert(run("a b $") ==
      Set((1L, 1L, 4L), (1L, 3L, 4L), (2L, 6L, 7L)))
    // both: full-span anchoring
    assert(run("^ a b $") == Set((1L, 1L, 4L)))
    // quantified edge: fail fast with guidance
    val e1 = intercept[IllegalArgumentException] { run("^ a+ b") }
    assert(e1.getMessage.contains("plain unquantified"))
    // mid-pattern anchor: rejected
    val e2 = intercept[IllegalArgumentException] { run("a ^ b") }
    assert(e2.getMessage.contains("start/end"))
    // '$' on a stream WITHOUT WITHIN: no quiescence fence — fail fast
    // at plan build (round 19 lifted the anchor itself UNDER WITHIN;
    // the green streaming cell + batch parity live in the navigation
    // matrix test)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_anchor_stream")
    val e3 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_anchor_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b $)
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin)
    }
    assert(e3.getMessage.contains("quiescence"))
  }

  test("streaming ^ anchor: first released row per key, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_anchor_stream2")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_anchor_stream2 MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (^ a b)
          |  WITHIN 10000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_anchor_sink").start()
    try {
      // user 1 starts with A (anchored match); user 2 starts with B
      // (no match ever, even though an A-B pair follows)
      input.addData((1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"),
        (3L, 3000L, 1L, "A"), (4L, 4000L, 1L, "B"),
        (5L, 1000L, 2L, "B"), (6L, 2000L, 2L, "A"), (7L, 3000L, 2L, "B"))
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "X"))
      q.processAllAvailable()
      val got = spark.table("mr_anchor_sink")
        .select($"user_id", $"a_id", $"b_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 2L)))
    } finally q.stop()
  }

  test("MEASURES navigation: FIRST/LAST offsets, PREV/NEXT from a " +
      "bound row (full-partition), nested PREV(FIRST(...)), SUBSET " +
      "offsets, and the fail-fasts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // user 1: A(v=1) X(v=99) A(v=2) B(v=3) X(v=7) — the X rows are
    // UNBOUND, so PREV/NEXT reading them proves navigation runs over
    // the full partition, not just the match's rows
    Seq((1L, 10L, 1L, "A", 1L), (2L, 20L, 1L, "X", 99L),
      (3L, 30L, 1L, "A", 2L), (4L, 40L, 1L, "B", 3L),
      (5L, 50L, 1L, "X", 7L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_nav_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val row = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nav_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.v, 1) AS f1, LAST(a.v, 1) AS l1,
          |           LAST(a.v, 3) AS oob,
          |           PREV(a.v) AS pa, PREV(FIRST(a.v)) AS pfa,
          |           NEXT(FIRST(a.v)) AS nfa, NEXT(b.v) AS nb,
          |           PREV(a.v, 0) AS pz, NEXT(b.v, 2) AS nb2,
          |           LAST(s.v, 1) AS sl1, COUNT(*) AS n_rows
          |  PATTERN (a{2,2} b)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"f1", $"l1", $"oob", $"pa", $"pfa", $"nfa", $"nb",
        $"pz", $"nb2", $"sl1", $"n_rows").collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getLong(0) == 2L)            // FIRST(a.v, 1): 2nd binding
    assert(r.getLong(1) == 1L)            // LAST(a.v, 1): 2nd-from-last
    assert(r.isNullAt(2))                 // LAST(a.v, 3): out of range
    assert(r.getLong(3) == 99L)           // PREV(a.v): row before a's
                                          // LAST binding = unbound X
    assert(r.isNullAt(4))                 // PREV(FIRST): partition edge
    assert(r.getLong(5) == 99L)           // NEXT(FIRST(a.v)): the X row
    assert(r.getLong(6) == 7L)            // NEXT(b.v): trailing X
    assert(r.getLong(7) == 2L)            // PREV(a.v, 0): the row itself
    assert(r.isNullAt(8))                 // NEXT(b.v, 2): past the end
    assert(r.getLong(9) == 2L)            // LAST(s.v, 1) over union
                                          // [1,2,3]: middle element
    assert(r.getLong(10) == 3L)           // COUNT(*): rows in the match
    // ALL ROWS + RUNNING PREV / RUNNING COUNT(*): per output row, the
    // last-so-far binding / the rows mapped so far
    val all = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nav_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES RUNNING PREV(a.v) AS rpa,
          |           RUNNING COUNT(*) AS rn_rows
          |  ALL ROWS PER MATCH
          |  PATTERN (a{2,2} b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"event_id", $"rpa", $"rn_rows").collect()
      .map(r0 => r0.getLong(0) -> ((if (r0.isNullAt(1)) None
        else Some(r0.getLong(1))), r0.getLong(2))).toMap
    assert(all == Map(1L -> (None, 1L), 3L -> (Some(99L), 2L),
      4L -> (Some(99L), 3L)))
    // DEFINE with a cross-variable FIRST/LAST offset: b gates on the
    // SECOND binding of a (FIRST(a.v, 1) = 2; the B row's v=3 > 2)
    val cvOff = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nav_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES b.v AS bv, FIRST(a.v, 1) AS a1v
          |  PATTERN (a{2,2} b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v > FIRST(a.v, 1)
          |)""".stripMargin))
      .select($"bv", $"a1v").as[(Long, Long)].collect().toSet
    assert(cvOff == Set((3L, 2L)))
    // offsets on the variable BEING DEFINED (SQL:2016 RUNNING
    // semantics: the current row is tentatively the variable's last
    // binding). LAST(b.v, 1) = the PREVIOUS binding — the ascending-
    // run predicate: only (s=A@30, b=[B@40, X@50]) survives, the
    // start-1 chain dies on 3 > 99
    val ownLast = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nav_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES s.event_id AS s_id, FIRST(b.event_id) AS b1,
          |           LAST(b.event_id) AS b2, LAST(b.v, 1) AS prev_v
          |  PATTERN (s b{2,2})
          |  DEFINE s AS event_type = 'A',
          |         b AS event_type IN ('B', 'X')
          |           AND v > coalesce(LAST(b.v, 1), 0)
          |)""".stripMargin))
      .select($"s_id", $"b1", $"b2", $"prev_v")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ownLast == Set((3L, 4L, 5L, 3L)))
    // FIRST(b.v, 1) while defining b's 2nd binding IS the current row
    // (binding count == offset): v >= itself holds, so both starts
    // complete with their first two B/X rows
    val ownFirst = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nav_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES s.event_id AS s_id, FIRST(b.event_id) AS b1,
          |           LAST(b.event_id) AS b2
          |  PATTERN (s b{2,2})
          |  DEFINE s AS event_type = 'A',
          |         b AS event_type IN ('B', 'X')
          |           AND v >= coalesce(FIRST(b.v, 1), v)
          |)""".stripMargin))
      .select($"s_id", $"b1", $"b2")
      .as[(Long, Long, Long)].collect().toSet
    assert(ownFirst == Set((1L, 2L, 4L), (3L, 4L, 5L)))
    // unqualified PREV in MEASURES: clear error, not a misparse
    val e2 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_nav_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES PREV(v) AS pv
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin)
    }
    assert(e2.getMessage.contains("var-qualified"))
    // PREV/NEXT in MEASURES over a stream: compiles to a streaming
    // plan (exposeLags keeps the decorator-filled lag values in the
    // emitted slot structs; full parity in StreamingParitySpec)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_nav_stream")
    val navStream = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nav_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES PREV(a.event_id) AS pa
          |  PATTERN (a b)
          |  WITHIN 10000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
    assert(navStream.isStreaming && navStream.columns.contains("pa"))
  }

  test("MATCH_RECOGNIZE as a table factor: alias, JOIN, WHERE, and " +
      "GROUP BY over the match relation") {
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "B"),
      (5L, 10L, 2L, "B"), (6L, 20L, 2L, "A"), (7L, 30L, 2L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_factor_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val mr = """MATCH_RECOGNIZE (
               |  PARTITION BY user_id
               |  ORDER BY ts_us, event_id
               |  MEASURES a.event_id AS a_id, b.event_id AS b_id
               |  PATTERN (a b)
               |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
               |)""".stripMargin
    // aggregate over the match relation
    val agg = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        s"""SELECT user_id, count(*) AS n
           |FROM mr_factor_view $mr
           |GROUP BY user_id""".stripMargin))
      .as[(Long, Long)].collect().toSet
    assert(agg == Set((1L, 2L), (2L, 1L)))
    // alias + JOIN with a derived table + WHERE
    val joined = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        s"""SELECT m.user_id, u.n_ev, m.a_id, m.b_id
           |FROM mr_factor_view $mr AS m
           |JOIN (SELECT user_id, count(*) AS n_ev
           |      FROM mr_factor_view GROUP BY user_id) u
           |  ON m.user_id = u.user_id
           |WHERE m.a_id >= 3 OR m.user_id = 2""".stripMargin))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(joined == Set((1L, 4L, 3L, 4L), (2L, 3L, 6L, 7L)))
    // plain statements still delegate untouched
    assert(parser.parsePlan("SELECT 1 AS one") != null)
  }

  test("factor rewrite ignores MATCH_RECOGNIZE text inside string " +
      "literals and comments; oversized quantifier bounds fail with " +
      "pattern context") {
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def one(sql: String): org.apache.spark.sql.Row =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(sql)).collect().head
    // double-quoted string literal
    assert(one("SELECT \"demo: t match_recognize(x)\" AS s")
      .getString(0).contains("match_recognize"))
    // line comment and bracketed comment
    assert(one("SELECT 1 AS one -- t match_recognize(x)\n").getInt(0) == 1)
    assert(one("SELECT 2 AS two /* t match_recognize(x) */").getInt(0) == 2)
    // single-quoted literal
    assert(one("SELECT 't match_recognize(x)' AS s")
      .getString(0).contains("match_recognize"))
    // oversized {m,n} bound: dialect error, not NumberFormatException
    Seq((1L, 10L, 1L, "A")).toDF("event_id", "ts_us", "user_id",
      "event_type").createOrReplaceTempView("mr_guard_view")
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_guard_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a{99999999999,99999999999})
          |  DEFINE a AS event_type = 'A'
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("bad PATTERN"))
  }

  test("non-integral tie-break: allowed in plain every-match mode " +
      "(sort-only), timestamp ties widen, skip modes reject with " +
      "guidance") {
    val df = Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("tie_s", concat(lit("k"), $"event_id"))
      .withColumn("tie_t", timestamp_millis($"event_id"))
    def pat = Seq(
      MatchRecognize.EStep("a", $"event_type" === "A"),
      MatchRecognize.EStep("b", $"event_type" === "B"))
    // string tie, no skip mode: the sort still uses it, plan builds
    assert(MatchRecognize(df, Seq("user_id"), "ts_us", "tie_s", pat)
      .count() == 2)
    // timestamp tie widens to long — works even WITH a skip mode
    assert(MatchRecognize(df, Seq("user_id"), "ts_us", "tie_t", pat,
      skipPastLastRow = true).count() == 2)
    // string tie + skip mode: the election reads the long identity
    val e = intercept[IllegalArgumentException] {
      MatchRecognize(df, Seq("user_id"), "ts_us", "tie_s", pat,
        skipPastLastRow = true)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("streaming ^ anchor parity: the partition-boundary lag " +
      "predicate agrees across both stateful executors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val rows = Seq(
        (1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"),
        (3L, 3000L, 1L, "A"), (4L, 4000L, 1L, "B"),
        (5L, 1000L, 2L, "B"), (6L, 2000L, 2L, "A"), (7L, 3000L, 2L, "B"))
      def run(useTws: Boolean): Set[(Long, Long, Long)] = {
        val input = MemoryStream[(Long, Long, Long, String)]
        val df = input.toDF().toDF("event_id", "ts_ms", "user", "typ")
          .withColumn("etc", timestamp_millis($"ts_ms"))
          .withWatermark("etc", "10 seconds")
        val out = MatchRecognize.streamingFull(df, Seq("user"),
          "ts_ms", "event_id",
          Seq(EStep("a", ($"typ" === "A") &&
              col("_mr_prev_ts_ms_1").isNull),
            EStep("b", $"typ" === "B")),
          eventTimeCol = "etc", withinTs = Some(10000L),
          useTws = useTws, lagSpecs = Seq(("prev", "ts_ms", 1)))
        val name = s"mr_anchor_tws_$useTws"
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          input.addData(rows: _*)
          q.processAllAvailable()
          input.addData((9L, 300000L, 9L, "X"))
          q.processAllAvailable()
          spark.table(name)
            .select($"user",
              element_at($"a", 1).getField("event_id").as("a_id"),
              element_at($"b", 1).getField("event_id").as("b_id"))
            .as[(Long, Long, Long)].collect().toSet
        } finally q.stop()
      }
      val base = run(useTws = false)
      // user 1 starts with A → anchored match; user 2 starts with B →
      // none even though an A-B pair follows
      assert(base == Set((1L, 1L, 2L)))
      assert(run(useTws = true) == base)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming cross-variable DEFINE offset: FIRST(a.v, 1) through " +
      "the SQL path on the stateful executor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val input = MemoryStream[(Long, Long, Long, String, Long)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type", "v")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_cvoff_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cvoff_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES b.v AS bv, FIRST(a.v, 1) AS a1v
          |  PATTERN (a{2,2} b)
          |  WITHIN 10000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v > FIRST(a.v, 1)
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_cvoff_sink").start()
    try {
      // user 1: a=[v1, v2], b v=3 > FIRST(a.v,1)=2 → match;
      // user 2: a=[v5, v9], b v=7 NOT > 9 → no match
      input.addData((1L, 1000L, 1L, "A", 1L), (2L, 2000L, 1L, "A", 2L),
        (3L, 3000L, 1L, "B", 3L),
        (4L, 1000L, 2L, "A", 5L), (5L, 2000L, 2L, "A", 9L),
        (6L, 3000L, 2L, "B", 7L))
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "X", 0L))
      q.processAllAvailable()
      val got = spark.table("mr_cvoff_sink")
        .select($"user_id", $"bv", $"a1v")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 3L, 2L)))
    } finally q.stop()
  }

  test("PREV/NEXT over an expression in DEFINE: derived-column " +
      "materialization on batch and streaming; var-qualified inner " +
      "rejected; no column leak in ALL ROWS") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    Seq((1L, 10L, 1L, "A", 5L), (2L, 20L, 1L, "B", 9L),
      (3L, 30L, 1L, "A", 4L), (4L, 40L, 1L, "B", 20L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_navx_view")
    // PREV(v * 2): the previous INPUT row's doubled v — row 2 passes
    // (9 < 10), row 4 fails (20 < 8), so only the first pair matches
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v < PREV(v * 2)
          |)""".stripMargin))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    // ALL ROWS: the derived _mr_navx_* column must not leak
    val all = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  ALL ROWS PER MATCH
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v < PREV(v * 2)
          |)""".stripMargin))
    assert(!all.columns.exists(_.startsWith("_mr_navx")))
    assert(all.select($"event_id").as[Long].collect().toSet ==
      Set(1L, 2L))
    // decimal literals inside the expression are NOT var-qualified
    // references (the dot is a fraction point)
    val dec = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v < PREV(v * 2.5)
          |)""".stripMargin))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(dec == Set((1L, 2L)))
    // var-qualified references inside the expression (round-16 lift):
    // PREV(v + a.v) = the derived column v + v lagged off a's bound
    // row. Unqualified and qualified columns read the SAME row, so the
    // anchor values are 2v at the row before a's binding: seed a=id1
    // has a NULL lag (no match); seed a=id3 anchors 2·9 = 18, and
    // id4's v = 20 > 18 completes
    val vqx = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v > PREV(v + a.v)
          |)""".stripMargin))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(vqx == Set((3L, 4L)))
    // mixing two pattern variables now DISTRIBUTES (round 19) — what
    // stays rejected is a BARE column inside a mixed expression (two
    // anchors in play, no row for it to read from)
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A',
          |         b AS v < PREV(a.v + b.v + v)
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("EVERY column reference"))
    // navigating an expression over a SUBSET union (round-16 lift):
    // b is a MEMBER of s, so the merged-last bound row is the current
    // row and PREV(s.v * 2 + 1) is the previous input row's 2v + 1 —
    // anchors 11/19/9 at ids 2/3/4; only id2 (9 < 11) completes
    val es2 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v < PREV(s.v * 2 + 1)
          |)""".stripMargin))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(es2 == Set((1L, 2L)))
    // FIRST/LAST offset on a SUBSET name in DEFINE: supported as of
    // round 15 (bounded merged-order selection, cap raised to 19 in
    // round 16 — the probe showed the selection flat in k); the cap
    // keeps its targeted error
    val e2 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_navx_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a b)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A',
          |         b AS v > FIRST(s.v, 20)
          |)""".stripMargin)
    }
    assert(e2.getMessage.contains("up to 19"))
    // streaming: same expression through the release decorator
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Long)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type", "v")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_navx_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_navx_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  WITHIN 10000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v < PREV(v * 2)
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_navx_sink").start()
    try {
      input.addData((1L, 1000L, 1L, "A", 5L), (2L, 2000L, 1L, "B", 9L),
        (3L, 3000L, 1L, "A", 4L), (4L, 4000L, 1L, "B", 20L))
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "X", 0L))
      q.processAllAvailable()
      val sgot = spark.table("mr_navx_sink")
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(sgot == Set((1L, 2L)))
    } finally q.stop()
  }

  test("SUBSET union variables in DEFINE: SUM/AVG/COUNT/MIN/MAX " +
      "compose over the members; FIRST/LAST and bare refs fold the " +
      "merged (ts, tie) order") {
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    Seq((1L, 10L, 1L, "A", 3L), (2L, 20L, 1L, "B", 4L),
      (3L, 30L, 1L, "X", 6L), (4L, 40L, 1L, "X", 8L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_subdef_view")
    // c gates on aggregates over s = (a, b): needs v > SUM (7), v >
    // MAX (4), v > COUNT (2), v > AVG (3.5), v > MIN (3) — the X row
    // at v=6 fails the SUM gate, the one at v=8 passes everything
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subdef_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id, c.v AS cv
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS v > SUM(s.v) AND v > MAX(s.v)
          |           AND v > COUNT(s.v) AND v > AVG(s.v)
          |           AND v > MIN(s.v)
          |)""".stripMargin))
      .select($"c_id", $"cv").as[(Long, Long)].collect().toSet
    assert(got == Set((4L, 8L)))
    // a subset containing the DEFINED variable folds the current row
    // (member own-var semantics): v * 2 > SUM(s2.v) with s2 = (a, c)
    // at the v=6 row is 12 > 3 + 6 = 9 — first qualifying row wins
    val own = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subdef_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a c)
          |  SUBSET s2 = (a, c)
          |  DEFINE a AS event_type = 'A',
          |         c AS event_type = 'X' AND v * 2 > SUM(s2.v)
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(own == Set(3L))
    // FIRST over a subset in DEFINE: the merged (ts, tie) order folds
    // as a least() over per-member (ts, tie, value) structs — the
    // union's earliest binding is a (v=3), so c is the first X with
    // v > 3 (the v=6 row)
    val fgot = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subdef_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS v > FIRST(s.v)
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(fgot == Set(3L))
    // SKIP TO a subset name parses and runs (round-15 lift): plain
    // SKIP TO s = SKIP TO LAST s; s = (a, b)'s merged-last row is the
    // b row here, so the statement compiles and produces rows
    val sgot = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subdef_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  AFTER MATCH SKIP TO s
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'X'
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(sgot.nonEmpty)
    // bare subset reference = RUNNING LAST over the union: the latest
    // binding is b (v=4), so c is again the first X with v > 4
    val bgot = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subdef_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS v > s.v
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(bgot == Set(3L))
    // an offset over a subset in DEFINE (round-15 lift): with one
    // binding per member the merged order is [a, b], so LAST(s.v, 1)
    // is a's value — the same gate as FIRST(s.v) above
    val off = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subdef_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS v > LAST(s.v, 1)
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(off == fgot)
  }

  test("streaming DEFINE aggregates (cvAgg) on both executors: running " +
      "AVG over another variable's binding") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def runAgg(useTws: Boolean): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, Long, Long, Double, String)]
      val df = input.toDF()
        .toDF("event_id", "ts_ms", "user", "v", "typ")
        .withColumn("etc", timestamp_millis($"ts_ms"))
        .withWatermark("etc", "10 seconds")
      val out = graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(EStep("a", $"typ" === "A", 2, 2, strict = false),
          EStep("b", ($"typ" === "B") &&
            ($"v" > graft.plans.MatchRecognize.cvAgg("avg", "a", "v")))),
        eventTimeCol = "etc", withinTs = Some(100000L), useTws = useTws)
      val name = s"mr_cvagg_st_$useTws"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // a binds (v=2, v=4); the first B (v=3) fails 3 > avg=3, the
        // second (v=5) matches
        input.addData((1L, 1000L, 1L, 2.0, "A"), (2L, 2000L, 1L, 4.0, "A"),
          (3L, 3000L, 1L, 3.0, "B"))
        q.processAllAvailable()
        input.addData((4L, 4000L, 1L, 5.0, "B"))
        q.processAllAvailable()
        input.addData((9L, 60000L, 9L, 0.0, "Z"))
        q.processAllAvailable()
        spark.table(name).filter($"user" === 1L)
          .select($"user",
            try_element_at($"b", lit(1)).getField("event_id").as("b_id"))
          .as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    assert(runAgg(false) == Set((1L, 4L)))
    assert(runAgg(true) == Set((1L, 4L)))
  }

  test("absence composes with NEXT on a stream: a held violator blocks " +
      "window resolution until it feeds (both executors)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // PATTERN: a (typ=A, NEXT(v) > 0) then NOT typ=B FOR 5000 ms.
    // window1 [1000, 6000] has a HELD violator (B at 5000): the
    // watermark passes the deadline while the B is withheld for its
    // NEXT successor — the frontier cap must keep the window armed so
    // the B still violates it when it finally feeds. window2
    // [7000, 12000] resolves legitimately once the frontier passes it.
    def runAbs(useTws: Boolean): Seq[Long] = {
      val input = MemoryStream[(Long, Long, Long, Double, String)]
      val df = input.toDF()
        .toDF("event_id", "ts_ms", "user", "v", "typ")
        .withColumn("etc", timestamp_millis($"ts_ms"))
        .withWatermark("etc", "10 seconds")
      val out = graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(EStep("a", ($"typ" === "A") &&
            (graft.plans.MatchRecognize.lagCol("next", "v", 1) > 0)),
          ENotFor("nb", $"typ" === "B", 5000L)),
        eventTimeCol = "etc", withinTs = Some(100000L), useTws = useTws,
        lagSpecs = Seq(("next", "v", 1)))
      val name = s"mr_absnext_$useTws"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      def user1 = spark.table(name).filter($"user" === 1L)
        .select(element_at($"a", 1).getField("event_id")).as[Long]
      try {
        // every user-1 event arrives AHEAD of the watermark (Spark drops
        // stateful-operator input older than the watermark). Batch 1
        // leaves wm=7000: past window1's deadline 6000 but the violator
        // (B at 5000) is still HELD for its NEXT successor — the
        // frontier cap must keep the window armed instead of emitting
        input.addData((1L, 1000L, 1L, 1.0, "A"), (2L, 2000L, 1L, 1.0, "C"),
          (3L, 5000L, 1L, 1.0, "B"), (90L, 17000L, 9L, 1.0, "Z"))
        q.processAllAvailable()
        assert(user1.collect().isEmpty) // cap: no false a=1 match
        // batch 2 (wm 7000 -> 17000): e4/e5 release in the follow-up
        // trigger; feeding the B violates window1; e4 arms window2
        // [9000, 14000]; e5 becomes the new held frontier (10000)
        input.addData((4L, 9000L, 1L, 1.0, "A"), (5L, 10000L, 1L, 1.0, "C"),
          (91L, 27000L, 9L, 1.0, "Z"))
        q.processAllAvailable()
        assert(user1.collect().isEmpty) // frontier 10000 < deadline 14000
        // batch 3 (wm -> 30000): e6 feeds e5, frontier 18000 passes
        // window2's deadline — it resolves
        input.addData((6L, 18000L, 1L, 1.0, "C"),
          (92L, 40000L, 9L, 1.0, "Z"))
        q.processAllAvailable()
        user1.collect().toSeq
      } finally q.stop()
    }
    assert(runAbs(false) == Seq(4L)) // e1's window violated, e4's resolves
    assert(runAbs(true) == Seq(4L))
  }

  test("round-13 compositions on the transformWithState executor: " +
      "cv+PREV/NEXT and unmatched+NEXT match the fMGWS executor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // cv ref + PREV in one predicate: b must beat both its immediate
    // predecessor AND the seed's value — (1,4) wins, (1,2) fails cv
    def runCvLag(useTws: Boolean): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, Long, Long, Double, String)]
      val df = input.toDF()
        .toDF("event_id", "ts_ms", "user", "v", "typ")
        .withColumn("etc", timestamp_millis($"ts_ms"))
        .withWatermark("etc", "10 seconds")
      val out = graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(EStep("a", $"typ" === "A"),
          EStep("b", ($"typ" === "B") &&
            ($"v" > graft.plans.MatchRecognize.lagCol("prev", "v", 1)) &&
            ($"v" > graft.plans.MatchRecognize.cvFirst("a", "v")))),
        eventTimeCol = "etc", withinTs = Some(100000L), useTws = useTws,
        lagSpecs = Seq(("prev", "v", 1)))
      val name = s"mr_tws13cv_$useTws"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // a=1 (v=5); b candidates: e2 (v=4>prev 5? no), e3 (v=3),
        // e4 (v=9 > prev 3 and > seed 5) — only e4 binds
        input.addData((1L, 1000L, 1L, 5.0, "A"), (2L, 2000L, 1L, 4.0, "B"))
        q.processAllAvailable()
        input.addData((3L, 3000L, 1L, 3.0, "B"), (4L, 4000L, 1L, 9.0, "B"))
        q.processAllAvailable()
        input.addData((9L, 60000L, 9L, 0.0, "Z"))
        q.processAllAvailable()
        spark.table(name)
          .select($"user",
            element_at($"b", 1).getField("event_id").as("b_id"))
          .as[(Long, Long)].collect().toSet
      } finally q.stop()
    }
    // unmatched + NEXT hold-back on TWS: same hazard as the fMGWS
    // parity spec — the b row is withheld while the watermark passes
    // the a row's horizon
    def runUnLag(useTws: Boolean): Set[(Long, Option[Long], Long)] = {
      val input = MemoryStream[(Long, Long, Long, Double, String)]
      val df = input.toDF()
        .toDF("event_id", "ts_ms", "user", "v", "typ")
        .withColumn("etc", timestamp_millis($"ts_ms"))
        .withWatermark("etc", "10 seconds")
      val out = graft.plans.MatchRecognize.streamingFull(df, Seq("user"),
        "ts_ms", "event_id",
        Seq(EStep("a", $"typ" === "A"),
          EStep("b", ($"typ" === "B") &&
            (graft.plans.MatchRecognize.lagCol("next", "v", 1) > 0))),
        eventTimeCol = "etc", withinTs = Some(10000L), useTws = useTws,
        lagSpecs = Seq(("next", "v", 1)), withUnmatched = true)
      val name = s"mr_tws13un_$useTws"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData((1L, 1000L, 1L, 5.0, "A"), (2L, 2000L, 1L, 4.0, "B"),
          (91L, 35000L, 9L, 0.0, "Z"))
        q.processAllAvailable()
        input.addData((3L, 30000L, 1L, 2.0, "X"), (92L, 80000L, 9L, 0.0, "Z"))
        q.processAllAvailable()
        input.addData((4L, 75000L, 1L, 1.0, "X"), (93L, 120000L, 9L, 0.0, "Z"))
        q.processAllAvailable()
        spark.table(name).filter($"user" === 1L)
          .select($"user", $"match_start",
            coalesce(try_element_at($"b", lit(1)).getField("event_id"),
              $"_mr_unmatched_ev.event_id").as("which"))
          .as[(Long, Option[Long], Long)].collect().toSet
      } finally q.stop()
    }
    try {
      val twsCv = runCvLag(useTws = true)
      val fmCv = runCvLag(useTws = false)
      assert(twsCv == fmCv)
      assert(twsCv == Set((1L, 4L)))
      val twsU = runUnLag(useTws = true)
      val fmU = runUnLag(useTws = false)
      assert(twsU == fmU)
      // the (1,2) match emits despite the watermark passing row 1's
      // horizon while row 2 was withheld; row 3 decides unmatched
      // (row 4 stays withheld forever — no successor)
      assert(twsU == Set((1L, Some(1000L), 2L), (1L, None, 3L)))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("AFTER MATCH SKIP PAST LAST ROW: non-overlapping greedy matches") {
    // clicks at 10, 20; purchase 30; click 40; purchases 50, 60
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      (4L, 40L, 1L, "click"), (5L, 50L, 1L, "purchase"), (6L, 60L, 1L, "purchase"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val pat = Seq(EStep("a", $"event_type" === "click"),
      EStep("b", $"event_type" === "purchase"))
    def ids(skip: Boolean) =
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_id", pat,
          skipPastLastRow = skip)
        .select(element_at($"a", 1).getField("event_id").as("a_id"),
          element_at($"b", 1).getField("event_id").as("b_id"))
        .as[(Long, Long)].collect().toSet
    // default: every click pairs with its next purchase (overlap ok)
    assert(ids(skip = false) == Set((1L, 3L), (2L, 3L), (4L, 5L)))
    // skip past last row: the 20-click is consumed by the first match,
    // and only the leftmost candidate emits per completing event
    assert(ids(skip = true) == Set((1L, 3L), (4L, 5L)))
  }

  test("skip past last row drops overlapping absence resolutions too") {
    // two A's arm absence windows; the first deadline (110) emits and
    // consumes the partial started at 15 (overlap), so only one match
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 15L, 1L, "A"), (3L, 500L, 1L, "X"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val pat = Seq(EStep("s", $"event_type" === "A"),
      ENotFor("n", $"event_type" === "B", 100L))
    def ends(skip: Boolean) =
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_id", pat,
        skipPastLastRow = skip).select($"match_end")
        .as[Long].collect().toSeq.sorted
    assert(ends(skip = false) == Seq(110L, 115L))
    assert(ends(skip = true) == Seq(110L))
  }

  test("SQL: AFTER MATCH SKIP PAST LAST ROW parses; other modes rejected") {
    val df = Seq((1L, 10L, 1L, "click"), (2L, 30L, 1L, "purchase"),
      (3L, 40L, 1L, "click"), (4L, 50L, 1L, "purchase"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_skip_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(afterMatch: String) = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_skip_sql MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, b.event_id AS b_id
           |  $afterMatch
           |  PATTERN (a b)
           |  DEFINE a AS event_type = 'click',
           |         b AS event_type = 'purchase'
           |)""".stripMargin))
    assert(run("AFTER MATCH SKIP PAST LAST ROW")
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 1L, 2L), (1L, 3L, 4L)))
    // SKIP TO NEXT ROW is the explicit spelling of the overlap default
    assert(run("AFTER MATCH SKIP TO NEXT ROW")
      .as[(Long, Long, Long)].collect().toSet ==
      run("").as[(Long, Long, Long)].collect().toSet)
    // SKIP TO FIRST a now parses, but on (a b) the target IS the
    // match's first row — the standard's infinite-loop guard fires at
    // runtime (surfaced through Spark's task-failure wrapper)
    val loop = intercept[Exception](
      run("AFTER MATCH SKIP TO FIRST a").collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(loop).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("infinite loop")))
    // a SKIP TO variable missing from the pattern fails at parse time
    assertThrows[IllegalArgumentException](
      run("AFTER MATCH SKIP TO LAST zz"))
    // explicit ONE ROW PER MATCH (the only supported row mode) parses
    // and composes with the skip clause
    assert(run("ONE ROW PER MATCH\n  AFTER MATCH SKIP PAST LAST ROW")
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("SQL: ALL ROWS PER MATCH emits one row per matched event with " +
      "classifier, match bounds and FINAL measures") {
    // user 1: two overlapping matches (1→2, 3→4... within default every
    // semantics 1 pairs with 2, 3 with 4); user 2: the B never comes —
    // its A row must NOT appear (unmatched rows are omitted)
    val df = Seq((1L, 10L, 1L, "click"), (2L, 30L, 1L, "purchase"),
      (3L, 40L, 1L, "click"), (4L, 50L, 1L, "purchase"),
      (5L, 10L, 2L, "click"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_allrows_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_allrows_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  ALL ROWS PER MATCH
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase'
          |)""".stripMargin))
    assert(out.columns.toSeq == Seq("event_id", "ts_us", "user_id",
      "event_type", "classifier", "match_start", "match_end", "a_id"))
    val rows = out.select($"event_id", $"classifier", $"match_start",
      $"match_end", $"a_id")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(rows == Set(
      (1L, "a", 10L, 30L, 1L), (2L, "b", 10L, 30L, 1L),
      (3L, "a", 40L, 50L, 3L), (4L, "b", 40L, 50L, 3L)))
    // MEASURES is optional in ALL ROWS mode
    val noMeasures = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_allrows_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  ALL ROWS PER MATCH
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase'
          |)""".stripMargin))
    assert(noMeasures.count() == 4)
    // both row modes at once is rejected
    assertThrows[IllegalArgumentException](parser.parsePlan(
      """SELECT * FROM mr_allrows_sql MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_us, event_id
        |  ONE ROW PER MATCH
        |  ALL ROWS PER MATCH
        |  PATTERN (a b)
        |  DEFINE a AS event_type = 'click',
        |         b AS event_type = 'purchase'
        |)""".stripMargin))
  }

  test("ALL ROWS PER MATCH: API surface, zero-bound side omitted, " +
      "input-column collision fails fast") {
    // alternation: the unchosen side binds zero events and contributes
    // no rows to the explode
    val df = Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 10L, 2L, "A"), (4L, 20L, 2L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val out = MatchRecognize.allRows(df, Seq("user_id"), "ts_us",
        "event_id", Seq(EStep("a", $"event_type" === "A"),
          EOr("b", $"event_type" === "B", "c", $"event_type" === "C")))
      .select($"event_id", $"classifier")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")))

    val clash = df.withColumnRenamed("event_type", "classifier")
    val e = intercept[IllegalArgumentException] {
      MatchRecognize.allRows(clash, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"classifier" === "A")))
    }
    assert(e.getMessage.contains("classifier"))

    // a MEASURE alias named like a reserved column or a pattern variable
    // must also fail fast, not die later in an ambiguous-column resolve
    val one = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"event_type" === "A")))
      .withColumn("classifier", lit(1)).withColumn("a2", lit(2))
    for (bad <- Seq("classifier", "a")) {
      val em = intercept[IllegalArgumentException] {
        MatchRecognize.explodeAllRows(one, df.columns.toIndexedSeq,
          slots = Seq("a"), carryCols = Seq(bad))
      }
      assert(em.getMessage.contains("rename the measure"), s"alias $bad")
    }
  }

  test("SQL: zero-bound optional variable yields NULL measures under ANSI") {
    // b? binds nothing for user 2 — try_element_at must give NULL, not
    // an ANSI INVALID_ARRAY_INDEX crash; SUM/AVG over it are NULL too
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"),
      (4L, 10L, 2L, "A"), (5L, 30L, 2L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_opt_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_opt_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           SUM(b.ts_us) AS b_sum, AVG(b.ts_us) AS b_avg,
          |           COUNT(b.*) AS b_n, c.event_id AS c_id
          |  PATTERN (a b? c)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C'
          |)""".stripMargin))
      .select($"user_id", $"a_id", $"b_id", $"b_sum", $"b_avg", $"b_n", $"c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
        r.getInt(5), r.getLong(6))).toSet
    assert(out == Set(
      (1L, 1L, Some(2L), Some(20.0), Some(20.0), 1, 3L),
      (2L, 4L, None, None, None, 0, 5L)))
  }

  test("SQL: aliases spelled like clause keywords do not hijack clauses") {
    val df = Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_kw_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // aliases `order` and `pattern`: the positional clause scan already
    // consumed ORDER BY, and the PATTERN keyword requires a following
    // paren, so neither alias can mis-split the statement
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_kw_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.ts_us AS order, b.event_id AS pattern
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"user_id", $"order", $"pattern")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 2L)))
    // a clause placed out of canonical order names ITSELF in the
    // error instead of surfacing as an unrelated downstream failure
    // (SUBSET after EVENTTIME used to die with "PATTERN needs
    // parentheses" — the subset text glommed into the PATTERN slice)
    val eo = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_kw_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a b)
          |  WITHIN 60000
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin)
    }
    assert(eo.getMessage.contains("canonical order") &&
      eo.getMessage.contains("WITHIN before SUBSET"))
  }

  test("a source column named eventtime never triggers the clause " +
      "scan or the order diagnosis") {
    // r17 ADVICE: `a.eventtime` (qualified) satisfied the EVENTTIME
    // keyword regex — `(?<!\w)` admits a preceding '.' — and its loose
    // `\s*\w` lookahead matched ` AS`, so the diagnosis pass threw a
    // spurious "found EVENTTIME before PATTERN" on a perfectly valid
    // batch query
    val df = Seq((1L, 10L, 1L, "A", 100L), (2L, 20L, 1L, "B", 200L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "eventtime")
    df.createOrReplaceTempView("mr_evtcol_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // qualified ref in MEASURES
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_evtcol_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.eventtime AS evt, b.event_id AS b_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"user_id", $"evt", $"b_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 100L, 2L)))
    // bare ref followed by an expression continuation (IS NOT NULL)
    // inside DEFINE: the tightened lookahead must not take it for the
    // clause (the old `\s*\w` matched ` IS` and consumed the DEFINE
    // body into a bogus EVENTTIME section)
    val out2 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_evtcol_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A' AND eventtime IS NOT NULL,
          |         b AS event_type = 'B'
          |)""".stripMargin))
      .select($"user_id", $"a_id")
      .as[(Long, Long)].collect().toSet
    assert(out2 == Set((1L, 1L)))
    // r18 ADVICE: infix continuations the old exclusion list missed
    // (RLIKE / DIV) — a bare `eventtime` column followed by them must
    // not hijack the clause scan either
    for (cont <- Seq("CAST(eventtime AS STRING) RLIKE '1'",
        "eventtime DIV 2 = 50", "eventtime ILIKE '%'")) {
      val sql =
        s"""SELECT * FROM mr_evtcol_sql MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id
           |  PATTERN (a b)
           |  DEFINE a AS event_type = 'A' AND $cont,
           |         b AS event_type = 'B'
           |)""".stripMargin
      val outc = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(sql))
        .select($"user_id", $"a_id")
        .as[(Long, Long)].collect().toSet
      assert(outc == Set((1L, 1L)), s"continuation '$cont':\n$sql")
    }
  }

  test("a missing mandatory MEASURES clause is reported as missing " +
      "even when a column named measures appears in expression " +
      "position") {
    // r18 ADVICE: `DEFINE a AS x > measures` at depth 0 used to be
    // captured by the ordered scan as the MEASURES boundary (lookahead
    // was None), so the statement died with a bogus "found PATTERN
    // before MEASURES" canonical-order diagnosis instead of the real
    // missing-clause error; the head lookahead now rejects it
    Seq((1L, 10L, 1L, "A", 5L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "measures")
      .createOrReplaceTempView("mr_meascol_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val eo = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_meascol_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  PATTERN (a b)
          |  DEFINE a AS event_id > measures,
          |         b AS event_type = 'B'
          |)""".stripMargin)
    }
    assert(eo.getMessage.contains("needs a MEASURES clause") &&
      !eo.getMessage.contains("canonical order"), eo.getMessage)
    // and a VALID statement whose DEFINE uses the measures column in
    // operand position still parses and runs — the real clause head
    // (a.event_id: ident-dot) wins the scan
    val ok = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_meascol_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a)
          |  DEFINE a AS event_id < measures
          |)""".stripMargin))
      .select($"user_id", $"a_id")
      .as[(Long, Long)].collect().toSet
    assert(ok == Set((1L, 1L)))
  }

  test("a displaced mandatory clause is diagnosed by name, not by a " +
      "downstream misparse") {
    // r17 ADVICE: SUBSET written after DEFINE — the ordered scan CONSUMED
    // the misplaced SUBSET (it has a lookahead signature), DEFINE went
    // unfound, and the failure surfaced as an unrelated error; now the
    // unfound mandatory DEFINE is itself diagnosed against the found set
    Seq((1L, 10L, 1L, "A")).toDF("event_id", "ts_us", "user_id",
      "event_type").createOrReplaceTempView("mr_disp_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val eo = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_disp_sql MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |  SUBSET s = (a, b)
          |)""".stripMargin)
    }
    assert(eo.getMessage.contains("canonical order") &&
      eo.getMessage.contains("DEFINE before SUBSET"), eo.getMessage)
  }

  test("clause-permutation fuzz: every shuffled clause order either " +
      "parses canonically or raises the targeted order error") {
    // r17 VERDICT task 6: random permutations of valid clause subsets
    // must never surface as a misparse or a wrong-clause error — the
    // splitSections diagnosis must name the displaced clause for EVERY
    // clause kind (incl. the no-lookahead MEASURES / AFTER MATCH /
    // rows-mode / two-word keywords)
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_perm_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // canonical clause list (indices = canonical rank); mandatory core
    // always present so the canonical draw is a valid statement
    val canonical = Vector(
      "PARTITION BY user_id",
      "ORDER BY ts_us, event_id",
      "MEASURES a.event_id AS a_id, b.event_id AS b_id",
      "ONE ROW PER MATCH",
      "AFTER MATCH SKIP PAST LAST ROW",
      "PATTERN (a b)",
      "SUBSET s = (a, b)",
      "WITHIN 60000",
      "MODE RELAXED",
      "DEFINE a AS event_type = 'A', b AS event_type = 'B'")
    // PARTITION BY / ORDER BY / MEASURES / PATTERN / DEFINE are all
    // required by the compiler; the rows mode, AFTER MATCH, SUBSET,
    // WITHIN and MODE are the optional draws
    val mandatory = Set(0, 1, 2, 5, 9)
    def stmt(order: Seq[Int]): String =
      s"""SELECT * FROM mr_perm_sql MATCH_RECOGNIZE (
         |  ${order.map(canonical).mkString("\n  ")}
         |)""".stripMargin
    // the canonical order itself must parse and match
    val base = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt(canonical.indices)))
      .select($"user_id", $"a_id", $"b_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(base == Set((1L, 1L, 2L)))
    val fuzzSeed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
    val rnd = new scala.util.Random(fuzzSeed.getOrElse(20260817L))
    val trials = sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt * 5)
      .getOrElse(if (Soak.on) 600 else 120)
    var diagnosed = 0
    var parsedCanonical = 0
    for (_ <- 0 until trials) {
      val chosen = canonical.indices.filter(i =>
        mandatory(i) || rnd.nextBoolean())
      val perm = rnd.shuffle(chosen.toVector)
      if (perm == perm.sorted) {
        org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          parser.parsePlan(stmt(perm))).collect()
        parsedCanonical += 1
      } else {
        val eo = intercept[Exception](parser.parsePlan(stmt(perm)))
        assert(eo.getMessage != null &&
          eo.getMessage.contains("canonical order"),
          s"perm=$perm raised a non-order error:\n${eo.getMessage}\n" +
            s"statement:\n${stmt(perm)}")
        diagnosed += 1
      }
    }
    // with ≥3 mandatory + random optionals, nearly every shuffle is
    // non-canonical — the property is about those
    assert(diagnosed >= trials / 2,
      s"fuzz starved: $diagnosed diagnosed / $trials trials")
    // r18 VERDICT item 5: the EVENTTIME lookahead is a keyword
    // WHITELIST now (inverted from the round-by-round continuation
    // blacklist). Draw random keywords from the same lexer vocabulary
    // the parser reads — none may fire the clause — and random
    // non-keyword identifiers of the same shape — all must fire.
    val vocab = {
      val v = org.apache.spark.sql.catalyst.parser.SqlBaseLexer.VOCABULARY
      (1 to v.getMaxTokenType).flatMap(i => Option(v.getLiteralName(i)))
        .map(_.stripPrefix("'").stripSuffix("'"))
        .filter(_.matches("(?i)[a-z_][a-z_0-9]*"))
    }
    assert(vocab.size > 200, s"lexer vocabulary suspiciously small: " +
      s"${vocab.size} word keywords")
    for (_ <- 0 until 80) {
      val kw = vocab(rnd.nextInt(vocab.size))
      assert(!graft.plans.MatchRecognizeSql
          .eventtimeLookaheadFires(s" $kw IS NOT NULL"),
        s"EVENTTIME lookahead fired on keyword continuation '$kw'")
      assert(graft.plans.MatchRecognizeSql
          .eventtimeLookaheadFires(s" c_${kw}_x"),
        s"EVENTTIME lookahead must fire on identifier 'c_${kw}_x'")
    }
  }

  test("DIALECT navigation matrix: every qualifier x selector x " +
      "argument cell compiles and runs ON BOTH EXECUTORS, or fails " +
      "with its documented reason") {
    // r17 VERDICT task 7 — the executable form of DIALECT.md's closure
    // claim (DIALECT.md 'Documented exclusions' 1/2/7 + the DEFINE
    // section): var- and SUBSET-qualified navigation over
    // bare/FIRST/LAST(+offset)/PREV(flat & nested)/aggregates with
    // column and expression arguments all compose — round 19 also
    // mixed-variable arguments (distributed per qualifier) and
    // fully-unqualified arguments (the universal anchor); the
    // rejected cells left are mixed aggregates, bare columns inside
    // mixed navigation, and union offsets > 19. A future parser
    // change that silently reopens a cell fails this test by name.
    //
    // r18 (r17 VERDICT task 6): the matrix is parameterized over BOTH
    // modes — every supported cell also runs end-to-end on the
    // streaming executor (MemoryStream + EVENTTIME + watermark flush)
    // and must produce the same two match rows; the documented
    // rejections fire identically against the streaming view, and the
    // streaming-ONLY exclusions ('$' end anchor, MATCH_NUMBER /
    // UNMATCHED ROWS without WITHIN, EVENTTIME on batch) are pinned
    // with their own reason strings.
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((1L, 10L, 1L, "A", 2.0), (2L, 20L, 1L, "A", 3.0),
      (3L, 30L, 1L, "B", 5.0), (4L, 10L, 2L, "A", 7.0),
      (5L, 20L, 2L, "B", 11.0))
    data.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_matrix_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // WITHIN is carried in both modes: on a stream, cross-variable
    // DEFINE under SKIP PAST LAST ROW requires it (deferred leftmost
    // election — the no-WITHIN rejection is pinned below), and the
    // batch statement stays textually identical
    def stmt(table: String, streamingClauses: String, pred: String,
        within: String = "WITHIN 60000"): String =
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (a+ b)
         |  SUBSET s = (a, b)
         |  $within
         |  $streamingClauses
         |  DEFINE a AS event_type = 'A',
         |         b AS event_type = 'B' AND ($pred)
         |)""".stripMargin
    def runBatch(pred: String): Set[Long] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          parser.parsePlan(stmt("mr_matrix_sql", "", pred)))
        .select($"b_id").as[Long].collect().toSet
    // the streaming leg: same statement over a watermarked MemoryStream
    // (the ts_us values double as millis for the EVENTTIME column — the
    // release fence only needs the flush tick to outrun them)
    var streamRuns = 0
    def runStream(pred: String): Set[Long] = {
      val input = MemoryStream[(Long, Long, Long, String, Double)]
      input.toDF()
        .toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .withColumn("etc", timestamp_millis($"ts_us"))
        .withWatermark("etc", "10 seconds")
        .createOrReplaceTempView("mr_matrix_stream")
      val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_matrix_stream", "EVENTTIME etc", pred)))
      streamRuns += 1
      val name = s"mr_matrix_sink_$streamRuns"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        input.addData(data: _*)
        q.processAllAvailable()
        input.addData((99L, 1000000000L, 9L, "T", 0.0))
        q.processAllAvailable()
        spark.table(name).select($"b_id").as[Long].collect().toSet
      } finally q.stop()
    }
    // supported cells: scalar expression per (qualifier, selector,
    // argument); wrapped in a null-tolerant always-true comparison so
    // execution (not just parsing) is exercised in every cell
    val cells = (for {
      q <- Seq("a", "s")
      (sel, argKind) <- Seq(
        // selector          // argument template (c = qualified col)
        ("%s",                "col"), ("%s",                "expr"),
        ("FIRST(%s)",         "col"), ("LAST(%s)",          "col"),
        ("FIRST(%s, 2)",      "col"), ("LAST(%s, 2)",       "col"),
        ("PREV(%s)",          "col"), ("PREV(%s, 2)",       "col"),
        ("PREV(%s)",          "expr"),
        ("PREV(FIRST(%s))",   "col"), ("PREV(LAST(%s, 1), 2)", "col"),
        ("PREV(FIRST(%s))",   "expr"),
        ("SUM(%s)",           "col"), ("SUM(%s)",           "expr"))
    } yield {
      val arg = if (argKind == "col") s"$q.value"
        else if (sel.startsWith("SUM")) s"$q.value * $q.value"
        else s"$q.value * 2 + 1"
      (s"$q/$sel/$argKind", sel.format(arg))
    }) ++ Seq(
      // round-19 lift (DIALECT exclusion 1's mixed-variable half):
      // navigation over an expression MIXING variables distributes per
      // qualifier — each reference anchors at its own variable's
      // selected binding, offsets applied per anchor
      ("mixed/PREV",          "PREV(a.value + b.value)"),
      ("mixed/PREV(,2)",      "PREV(a.value + b.value, 2)"),
      ("mixed/LAST",          "LAST(b.value - a.value)"),
      ("mixed/LAST(,1)",      "LAST(a.value - b.value, 1)"),
      ("mixed/FIRST",         "FIRST(a.value * 2 - b.value)"),
      ("mixed/PREV(FIRST)",   "PREV(FIRST(a.value + b.value))"),
      ("mixed/subset",        "LAST(s.value + a.value)"),
      // single-variable selector-over-expression (new in round 19:
      // FIRST/LAST had no expression-argument path before the
      // distribution pass)
      ("a/LAST/expr",         "LAST(a.value * 2 + 1)"),
      // UNIVERSAL anchor (round 19): an unqualified expression
      // argument folds over ALL rows of the match — ISO's universal
      // row pattern variable, via the implicit all-variables SUBSET
      ("univ/LAST/expr",      "LAST(value * 2 + 1)"),
      ("univ/FIRST(,1)/expr", "FIRST(value * 2, 1)"),
      ("univ/PREV(FIRST)/expr", "PREV(FIRST(value * 2))"),
      ("univ/PREV(LAST,2)/expr", "PREV(LAST(value * 2), 2)"))
    val expected = Set(3L, 5L) // user 1's and user 2's b rows
    cells.foreach { case (cell, expr) =>
      val pred = s"COALESCE($expr >= -99999999, TRUE)"
      val batch = try runBatch(pred) catch {
        case e: Exception =>
          fail(s"cell $cell [$expr] failed on batch: ${e.getMessage}")
      }
      assert(batch == expected, s"cell $cell [$expr] batch: $batch")
      val streamed = try runStream(pred) catch {
        case e: Exception =>
          fail(s"cell $cell [$expr] failed on streaming: ${e.getMessage}")
      }
      assert(streamed == expected,
        s"cell $cell [$expr] streaming: $streamed")
    }
    // documented rejections (DIALECT.md exclusions 1, 2, 7): exact
    // reason strings, cited from the parser's fail-fast requires —
    // asserted against BOTH the batch and the streaming view (the
    // navigation surface is mode-independent). Round 19 flipped the
    // mixed-variable NAVIGATION cells to supported (above); what stays
    // rejected is a mixed AGGREGATE argument (zip semantics across two
    // bindings are genuinely undefined) and a bare column inside a
    // mixed navigation argument (two anchors in play — no row for it
    // to read from)
    val rejected = Seq(
      ("PREV(a.value + b.value + value) > 0",
        "EVERY column reference must be qualified"),
      ("LAST(a.value - value) > 0",
        "EVERY column reference must be qualified"),
      ("SUM(a.value * b.value) > 0",
        "mixing variables in one argument is undefined"),
      ("FIRST(s.value, 20) > 0", "supported up to 19"))
    rejected.foreach { case (pred, reason) =>
      val eb = intercept[Exception](
        parser.parsePlan(stmt("mr_matrix_sql", "", pred)))
      assert(eb.getMessage != null && eb.getMessage.contains(reason),
        s"[$pred] batch: expected '$reason', got:\n${eb.getMessage}")
      val es = intercept[Exception](
        parser.parsePlan(stmt("mr_matrix_stream", "EVENTTIME etc", pred)))
      assert(es.getMessage != null && es.getMessage.contains(reason),
        s"[$pred] streaming: expected '$reason', got:\n${es.getMessage}")
    }
    // streaming-specific exclusions (DIALECT.md exclusions 3 and 6 +
    // the EVENTTIME clause contract), each with its documented reason;
    // the true predicate keeps the DEFINE surface out of the picture
    def mnStmt(table: String, streamingClauses: String,
        measures: String, rows: String, pattern: String): String = {
      val define =
        if (pattern.contains("a")) "a AS event_type = 'A', " else ""
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES $measures
         |  $rows
         |  PATTERN ($pattern)
         |  $streamingClauses
         |  DEFINE ${define}b AS event_type = 'B'
         |)""".stripMargin
    }
    val streamingRejected = Seq(
      // round 19 narrowed this rejection: '$' now lifts on a stream
      // UNDER WITHIN (the quiescence horizon — green cell below);
      // without WITHIN there is no fence and it stays rejected
      (mnStmt("mr_matrix_stream", "EVENTTIME etc", "b.event_id AS b_id",
        "", "b $"),
        "'$' end anchor over a streaming table needs a WITHIN bound"),
      (mnStmt("mr_matrix_stream", "EVENTTIME etc",
        "MATCH_NUMBER() AS mn", "", "b"),
        "MATCH_NUMBER() over a streaming table needs a WITHIN bound"),
      (mnStmt("mr_matrix_stream", "EVENTTIME etc", "b.event_id AS b_id",
        "ALL ROWS PER MATCH WITH UNMATCHED ROWS", "b"),
        "WITH UNMATCHED ROWS over a streaming table needs a WITHIN"),
      (mnStmt("mr_matrix_stream", "", "b.event_id AS b_id", "", "b"),
        "needs an EVENTTIME"),
      (mnStmt("mr_matrix_sql", "EVENTTIME ts_us", "b.event_id AS b_id",
        "", "b"),
        "EVENTTIME is only valid over streaming tables"),
      // a supported cell's statement minus its WITHIN: deferred
      // leftmost election under cross-variable DEFINE is unbounded
      (stmt("mr_matrix_stream", "EVENTTIME etc",
        "COALESCE(a.value >= -99999999, TRUE)", within = ""),
        "needs a WITHIN bound"))
    streamingRejected.foreach { case (sql, reason) =>
      val eo = intercept[Exception](parser.parsePlan(sql))
      assert(eo.getMessage != null && eo.getMessage.contains(reason),
        s"expected '$reason', got:\n${eo.getMessage}\nfor:\n$sql")
    }
    // and the '$' cell on BATCH is a supported cell (the streaming
    // rejection above is executor-specific, not a parser gap): b is
    // each partition's last row here, so both matches survive
    val dollarBatch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(mnStmt("mr_matrix_sql", "",
          "b.event_id AS b_id", "", "a+ b $")))
      .select($"b_id").as[Long].collect().toSet
    assert(dollarBatch == expected, s"batch \\$$ anchor: $dollarBatch")
    // r18 ADVICE: every supported cell above carries WITHIN on the
    // batch leg too — keep the no-WITHIN batch navigation path pinned
    // with one representative cell
    val noWithinBatch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_matrix_sql", "",
          "COALESCE(PREV(FIRST(a.value)) >= -99999999, TRUE)",
          within = "")))
      .select($"b_id").as[Long].collect().toSet
    assert(noWithinBatch == expected, s"no-WITHIN batch: $noWithinBatch")
    // round-19 lift (DIALECT exclusion 3, streaming half): '$' UNDER
    // WITHIN runs on the streaming executor — the anchor decides at
    // the key's quiescence horizon (watermark past ts + WITHIN with no
    // successor), so a finite replay whose successors all arrive
    // within the bound matches batch exactly
    val dollarStreamStmt = (table: String, streaming: String) =>
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id
         |  PATTERN (a+ b $$)
         |  WITHIN 60000
         |  $streaming
         |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
         |)""".stripMargin
    val dollarBatchW = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(dollarStreamStmt("mr_matrix_sql", "")))
      .select($"b_id").as[Long].collect().toSet
    locally {
      val input = MemoryStream[(Long, Long, Long, String, Double)]
      input.toDF()
        .toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .withColumn("etc", timestamp_millis($"ts_us"))
        .withWatermark("etc", "10 seconds")
        .createOrReplaceTempView("mr_matrix_dollar_stream")
      val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(
          dollarStreamStmt("mr_matrix_dollar_stream", "EVENTTIME etc")))
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("mr_matrix_dollar_sink").start()
      try {
        input.addData(data: _*)
        q.processAllAvailable()
        input.addData((99L, 1000000000L, 9L, "T", 0.0))
        q.processAllAvailable()
        val streamed = spark.table("mr_matrix_dollar_sink")
          .select($"b_id").as[Long].collect().toSet
        assert(streamed == dollarBatchW && streamed == expected,
          s"streaming \\$$ under WITHIN: $streamed vs batch $dollarBatchW")
      } finally q.stop()
    }
  }

  test("mixed-variable navigation in MEASURES distributes per " +
      "qualifier, batch and streaming") {
    // round-19 lift: LAST(b.value - a.value) ≡ LAST(b.value) -
    // LAST(a.value) (each reference anchors at its own variable's
    // binding — the reference's `s1.x, s2.y` cross-attribute select
    // generalized with SQL:2016 selectors); PREV distributes with the
    // offset applied per anchor
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((1L, 10L, 1L, "A", 2.0), (2L, 20L, 1L, "A", 3.0),
      (3L, 30L, 1L, "B", 5.0), (4L, 10L, 2L, "A", 7.0),
      (5L, 20L, 2L, "B", 11.0))
    data.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_mixed_meas_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def stmt(table: String, streamingClauses: String): String =
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id,
         |           LAST(b.value - a.value) AS delta,
         |           FIRST(a.value + b.value) AS tot,
         |           PREV(a.value + b.value) AS psum,
         |           FIRST(s.value + b.value) AS stot,
         |           FIRST(value * 2) AS ufirst,
         |           LAST(value * 2, 1) AS upen
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (a+ b)
         |  SUBSET s = (a, b)
         |  WITHIN 60000
         |  $streamingClauses
         |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
         |)""".stripMargin
    val batch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_mixed_meas_sql", "")))
      .select($"b_id", $"delta", $"tot", $"psum", $"stot",
        $"ufirst", $"upen")
      .as[(Long, Double, Double, Option[Double], Double, Double, Double)]
      .collect().toSet
    // user 1: a = [e1(2.0), e2(3.0)], b = e3(5.0):
    //   delta = 5 - 3 = 2; tot = FIRST(a)=2 + FIRST(b)=5 = 7;
    //   psum = PREV(last a = e2) + PREV(last b = e3) = 2.0 + 3.0
    // user 2: a = [e4(7.0)], b = e5(11.0):
    //   delta = 4; tot = 18; psum = PREV(e4) + PREV(e5) = NULL + 7
    // stot mixes a SUBSET union with a variable: FIRST(s) is the
    // merged-first bound row (= the first a) and FIRST(b) the first b.
    // ufirst/upen are UNIVERSAL (unqualified) selectors over the whole
    // match: its first row, and the second row from the end
    assert(batch == Set((3L, 2.0, 7.0, Some(5.0), 7.0, 4.0, 6.0),
      (5L, 4.0, 18.0, None, 18.0, 14.0, 14.0)), s"batch: $batch")
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    input.toDF()
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("etc", timestamp_millis($"ts_us"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_mixed_meas_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_mixed_meas_stream", "EVENTTIME etc")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_mixed_meas_sink").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((99L, 1000000000L, 9L, "T", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("mr_mixed_meas_sink")
        .select($"b_id", $"delta", $"tot", $"psum", $"stot",
          $"ufirst", $"upen")
        .as[(Long, Double, Double, Option[Double], Double, Double,
          Double)].collect().toSet
      assert(streamed == batch, s"streaming: $streamed vs $batch")
    } finally q.stop()
    // RUNNING semantics in ALL ROWS mode: the distributed pieces ride
    // the per-row filtered slot arrays — LAST(b.value - a.value) is
    // NULL until b binds (NULL minus the running a-LAST)
    val running = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        s"""SELECT * FROM mr_mixed_meas_sql MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES RUNNING LAST(b.value - a.value) AS rdelta,
           |           RUNNING LAST(value * 2) AS rulast
           |  ALL ROWS PER MATCH
           |  AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN (a+ b)
           |  WITHIN 60000
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
           |)""".stripMargin))
      .select($"event_id", $"rdelta", $"rulast")
      .as[(Long, Option[Double], Double)].collect().toSet
    // rulast: the universal RUNNING LAST is the current row itself
    assert(running == Set((1L, None, 4.0), (2L, None, 6.0),
      (3L, Some(2.0), 10.0), (4L, None, 14.0), (5L, Some(4.0), 22.0)),
      s"running: $running")
  }

  test("streaming $ epoch semantics: a >WITHIN-gapped successor " +
      "arriving after the fence keeps the earlier anchor; arriving " +
      "before it, the anchor is conservatively withheld") {
    // the two arms of DIALECT exclusion 3's documented divergence —
    // the only place streaming '$' can differ from batch, and only
    // for successors more than WITHIN past the row in EVENT time
    // (in-bound successors always arrive before the fence under the
    // watermark contract)
    implicit val sqlCtx = spark.sqlContext
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def stmt(table: String, streaming: String): String =
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_ms, event_id
         |  MEASURES b.event_id AS b_id
         |  PATTERN (b $$)
         |  WITHIN 60000
         |  $streaming
         |  DEFINE b AS event_type = 'B'
         |)""".stripMargin
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_epoch_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_epoch_stream", "EVENTTIME etc")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_epoch_sink").start()
    try {
      // key 1 (divergence arm): its only row so far; key 2
      // (conservative arm): both rows — gap 65 s > WITHIN — buffered
      // together, so they RELEASE together at the first fence
      input.addData((1L, 10000L, 1L, "B"),
        (3L, 10000L, 2L, "B"), (4L, 75000L, 2L, "B"))
      q.processAllAvailable()
      // carrier pushes the watermark past every fence above: key 1's
      // lone row force-feeds with a NULL lookahead (anchor FIRES);
      // key 2's first row feeds WITH its already-arrived successor
      // (lookahead filled, anchor withheld = batch), then the
      // successor itself flushes and anchors
      input.addData((90L, 200000L, 9L, "X"))
      q.processAllAvailable()
      // key 1's >WITHIN-gapped successor arrives AFTER the fence —
      // row 1's anchor already fired (the divergence); the successor
      // becomes the next epoch's end
      input.addData((2L, 300000L, 1L, "B"))
      input.addData((91L, 1000000000L, 9L, "X")) // final flush
      q.processAllAvailable()
      val streamed = spark.table("mr_epoch_sink")
        .select($"user_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(streamed == Set((1L, 1L), (1L, 2L), (2L, 4L)),
        s"streaming epochs: $streamed")
      // batch over the same finite data: only each key's true last row
      Seq((1L, 10000L, 1L, "B"), (2L, 300000L, 1L, "B"),
        (3L, 10000L, 2L, "B"), (4L, 75000L, 2L, "B"))
        .toDF("event_id", "ts_ms", "user_id", "event_type")
        .createOrReplaceTempView("mr_epoch_batch")
      val batch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          parser.parsePlan(stmt("mr_epoch_batch", "")))
        .select($"user_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(batch == Set((1L, 2L), (2L, 4L)), s"batch: $batch")
    } finally q.stop()
  }

  test("strict checkpoint guard: same compiled shape, different DEFINE " +
      "predicate — rejected under strictRestore, adopted (documented) " +
      "under the default") {
    // r18 VERDICT item 3: PatternDef.layoutFp deliberately excludes
    // DEFINE predicates (they change which partials exist, not how
    // state decodes), so a DIFFERENT query with the same compiled
    // shape pointed at the same checkpointLocation passes the default
    // guard — Structured Streaming's standard query-evolution
    // semantics. spark.graft.matchRecognize.strictRestore folds the
    // normalized predicate sources (and skip mode/WITHIN/mode) into
    // the stored fingerprint and rejects that restore too.
    implicit val sqlCtx = spark.sqlContext
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def stmt(table: String, cut: Int): String =
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id
         |  PATTERN (a b)
         |  WITHIN 60000
         |  EVENTTIME etc
         |  DEFINE a AS event_type = 'A',
         |         b AS event_type = 'B' AND value > $cut
         |)""".stripMargin
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    def runLeg(strict: Boolean, useTws: Boolean = true): Unit = {
      spark.conf.set("spark.graft.matchRecognize.useTws",
        useTws.toString)
      spark.conf.set("spark.graft.matchRecognize.strictRestore",
        strict.toString)
      val ck = java.nio.file.Files
        .createTempDirectory(s"mr_strict_ck_$strict").toString
      try {
        // memory sink refuses checkpoint recovery; foreachBatch keyed
        // by batch id is the recoverable path. ONE MemoryStream serves
        // both starts — the checkpoint's source offsets belong to it
        val sink = new java.util.concurrent.ConcurrentHashMap[
          java.lang.Long, Seq[Long]]()
        val input = MemoryStream[(Long, Long, Long, String, Double)]
        def start(cut: Int) = {
          input.toDF()
            .toDF("event_id", "ts_us", "user_id", "event_type", "value")
            .withColumn("etc", timestamp_millis($"ts_us"))
            .withWatermark("etc", "2 seconds")
            .createOrReplaceTempView(s"mr_strict_view_$strict")
          val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
            parser.parsePlan(stmt(s"mr_strict_view_$strict", cut)))
          out.writeStream.outputMode("append")
            .option("checkpointLocation", ck)
            .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => {
              sink.put(id, b.select($"b_id").as[Long].collect().toSeq)
              ()
            })
            .start()
        }
        // leg 1: the 'a' event leaves live state for key 1
        val q1 = start(cut = 0)
        input.addData((1L, 100000L, 1L, "A", 5.0))
        q1.processAllAvailable()
        q1.stop()
        // leg 2: SAME checkpoint, same shape, predicate cut 0 -> 1
        val q2 = start(cut = 1)
        input.addData((2L, 110000L, 1L, "B", 5.0))
        if (strict) {
          val ex = intercept[Exception] { q2.processAllAvailable() }
          assert(chain(ex).exists(t => t.getMessage != null &&
              t.getMessage.contains("strict restore is on")),
            s"expected the strict-restore error, got:\n$ex")
          q2.stop()
        } else {
          // default: the old state is ADOPTED (the documented
          // query-evolution semantics) — the match completes
          q2.processAllAvailable()
          input.addData((99L, 100000000L, 9L, "T", 0.0))
          q2.processAllAvailable()
          q2.stop()
          import scala.jdk.CollectionConverters._
          val got = sink.asScala.values.flatten.toSet
          assert(got == Set(2L), s"default-adoption leg: $got")
        }
      } finally {
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(ck)); ()
      }
    }
    try {
      runLeg(strict = true)
      // the guard lives in the shared restored() — the strict arm
      // also fires on the flatMapGroupsWithState executor (eager kryo
      // decode succeeds here: same CepState schema, only the
      // fingerprint differs)
      runLeg(strict = true, useTws = false)
      runLeg(strict = false)
    } finally {
      spark.conf.unset("spark.graft.matchRecognize.strictRestore")
      spark.conf.unset("spark.graft.matchRecognize.useTws")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("step names colliding with keys or match bounds fail fast") {
    val df = Seq((1L, 10L, 1L, "A")).toDF("event_id", "ts_us", "user_id",
      "event_type")
    assertThrows[IllegalArgumentException](
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("user_id", $"event_type" === "A"))))
    assertThrows[IllegalArgumentException](
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("match_start", $"event_type" === "A"))))
  }

  test("streaming SQL MATCH_RECOGNIZE dispatches to streamingFull and " +
      "matches the batch statement") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (2L, 2000L, 1L, "B"), (1L, 1000L, 1L, "A"), // out of order in-batch
      (3L, 4000L, 1L, "A"), (4L, 5000L, 1L, "B"),
      (5L, 1000L, 2L, "A"))
    val stmt = (table: String, streamingClauses: String) =>
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_ms, event_id
         |  MEASURES a.event_id AS a_id, b.event_id AS b_id
         |  PATTERN (a b)
         |  WITHIN 10000
         |  $streamingClauses
         |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
         |)""".stripMargin
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)

    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_sql_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_sql_stream", "EVENTTIME etc")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_sql_stream_sink").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "X")) // watermark tick flushes
      q.processAllAvailable()
      val streamed = spark.table("mr_sql_stream_sink")
        .select($"user_id", $"a_id", $"b_id")
        .as[(Long, Long, Long)].collect().toSet

      rows.toDF("event_id", "ts_ms", "user_id", "event_type")
        .createOrReplaceTempView("mr_sql_batch")
      val batch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_sql_batch", "")))
        .select($"user_id", $"a_id", $"b_id")
        .as[(Long, Long, Long)].collect().toSet

      assert(streamed.nonEmpty && streamed == batch)
      assert(streamed == Set((1L, 1L, 2L), (1L, 3L, 4L)))
    } finally q.stop()
  }

  test("streaming SQL ALL ROWS PER MATCH: explode over streamingFull " +
      "matches the batch statement") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"),
      (3L, 4000L, 1L, "A"), (4L, 5000L, 1L, "B"),
      (5L, 1000L, 2L, "A"))
    val stmt = (table: String, streamingClauses: String) =>
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_ms, event_id
         |  MEASURES a.event_id AS a_id
         |  ALL ROWS PER MATCH
         |  PATTERN (a b)
         |  WITHIN 10000
         |  $streamingClauses
         |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
         |)""".stripMargin
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)

    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_ar_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_ar_stream", "EVENTTIME etc")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_ar_stream_sink").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "X")) // watermark tick flushes
      q.processAllAvailable()
      val streamed = spark.table("mr_ar_stream_sink")
        .select($"event_id", $"classifier", $"match_start", $"a_id")
        .as[(Long, String, Long, Long)].collect().toSet

      rows.toDF("event_id", "ts_ms", "user_id", "event_type")
        .createOrReplaceTempView("mr_ar_batch")
      val batch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_ar_batch", "")))
        .select($"event_id", $"classifier", $"match_start", $"a_id")
        .as[(Long, String, Long, Long)].collect().toSet

      assert(streamed.nonEmpty && streamed == batch)
      assert(streamed == Set(
        (1L, "a", 1000L, 1L), (2L, "b", 1000L, 1L),
        (3L, "a", 4000L, 3L), (4L, "b", 4000L, 3L)))
    } finally q.stop()
  }

  test("and element binds both sides in either order") {
    val df = Seq(
      (1L, 10L, 1L, "X"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "A"),
      (4L, 10L, 2L, "X"), (5L, 20L, 2L, "A"), (6L, 30L, 2L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val out = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("s", $"event_type" === "X"),
          EAnd("l", $"event_type" === "A", "r", $"event_type" === "B")))
      .select($"user_id",
        element_at($"l", 1).getField("event_id").as("l_id"),
        element_at($"r", 1).getField("event_id").as("r_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 2L), (2L, 5L, 6L)))
  }

  test("SQL PERMUTE(a,b) == programmatic EAnd (either-order binding)") {
    val df = Seq(
      (1L, 10L, 1L, "B"), (2L, 20L, 1L, "A"),   // user 1: b then a
      (3L, 10L, 2L, "A"), (4L, 20L, 2L, "B"),   // user 2: a then b
      (5L, 10L, 3L, "A"), (6L, 20L, 3L, "C"))   // user 3: never completes
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_permute_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val viaSql = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_permute_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (PERMUTE(a, b))
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSql == Set((1L, 2L, 1L), (2L, 3L, 4L)))
    val viaApi = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EAnd("a", $"event_type" === "A", "b", $"event_type" === "B")))
      .select($"user_id",
        element_at($"a", 1).getField("event_id").as("a_id"),
        element_at($"b", 1).getField("event_id").as("b_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSql == viaApi)
  }

  test("SQL n-ary PERMUTE(a,b,c): one event per variable, any order") {
    val df = Seq(
      // user 1: C B A — fully reversed order still completes
      (1L, 10L, 1L, "C"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "A"),
      // user 2: A C B with noise between
      (4L, 10L, 2L, "A"), (5L, 15L, 2L, "X"), (6L, 20L, 2L, "C"),
      (7L, 30L, 2L, "B"),
      // user 3: only two of the three types — never completes
      (8L, 10L, 3L, "A"), (9L, 20L, 3L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_permute3_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_permute3_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           c.event_id AS c_id
          |  PATTERN (PERMUTE(a, b, c))
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C'
          |)""".stripMargin))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2L, 1L), (2L, 4L, 7L, 6L)))
    // programmatic parity through EPermute
    val viaApi = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(MatchRecognize.EPermute(Seq(
          "a" -> ($"event_type" === "A"), "b" -> ($"event_type" === "B"),
          "c" -> ($"event_type" === "C")))))
      .select($"user_id",
        element_at($"a", 1).getField("event_id").as("a_id"),
        element_at($"b", 1).getField("event_id").as("b_id"),
        element_at($"c", 1).getField("event_id").as("c_id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == viaApi)
  }

  test("SQL quantified group (a b){2,2} == programmatic EGroup; " +
      "measures aggregate across iterations") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "A"),
      (4L, 40L, 1L, "B"),                       // user 1: two iterations
      (5L, 10L, 2L, "A"), (6L, 20L, 2L, "B"))   // user 2: only one
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_group_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val viaSql = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_group_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_first,
          |           LAST(a.event_id) AS a_last,
          |           COUNT(b.*) AS n_b
          |  PATTERN ((a b){2,2})
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .as[(Long, Long, Long, Int)].collect().toSet
    // only user 1 reaches two full iterations; a_first/a_last span them
    assert(viaSql == Set((1L, 1L, 3L, 2)))
    val viaApi = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(MatchRecognize.EGroup(Seq(
          "a" -> ($"event_type" === "A"),
          "b" -> ($"event_type" === "B")), 2, 2)))
      .select($"user_id",
        element_at($"a", 1).getField("event_id").as("a_first"),
        element_at($"a", -1).getField("event_id").as("a_last"),
        size($"b").as("n_b"))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(viaSql == viaApi)
  }

  test("SQL (a b)+ emits greedy-min one-iteration matches") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_groupplus_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_groupplus_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN ((a b)+)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("SQL quantified alternation (a|b){2,2} routes each iteration's " +
      "event to its matching side; (a|b)+ greedy-min") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "B"), (4L, 40L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_altq_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(pat: String) = org.apache.spark.sql.GraftSqlBridge.ofRows(
      spark, parser.parsePlan(
        s"""SELECT * FROM mr_altq_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES COUNT(a.*) AS n_a, COUNT(b.*) AS n_b,
           |           LAST(c.event_id) AS c_id
           |  AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN ($pat c)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
           |         c AS event_type = 'C'
           |)""".stripMargin))
      .select($"n_a", $"n_b", $"c_id")
      .as[(Int, Int, Long)].collect().toSet
    // {2,2}: exactly two iterations — e1 routes to a, e2 to b
    // (e3 doesn't extend past max... {2,2} binds e1,e2; c = e4)
    assert(run("(a|b){2,2}") == Set((1, 1, 4L)))
    // {3,3}: e1→a, e2→b, e3→b
    assert(run("(a|b){3,3}") == Set((1, 2, 4L)))
    // +: greedy leftmost with skip-past-last emits the longest chain
    // completing first — iterations 1..3 then c
    assert(run("(a|b)+") == Set((1, 2, 4L)))
  }

  test("SQL quantified PERMUTE(a,b){2,2}: two any-order iterations " +
      "sharing slots; programmatic EPermuteQ parity") {
    // B A A B: iteration 1 binds (b=e1, a=e2), iteration 2 (a=e3, b=e4)
    val df = Seq(
      (1L, 10L, 1L, "B"), (2L, 20L, 1L, "A"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "B"), (5L, 50L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_permq_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_permq_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a1, LAST(a.event_id) AS a2,
          |           FIRST(b.event_id) AS b1, LAST(b.event_id) AS b2,
          |           c.event_id AS c_id
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (PERMUTE(a, b){2,2} c)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C'
          |)""".stripMargin))
      .select($"a1", $"a2", $"b1", $"b2", $"c_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((2L, 3L, 1L, 4L, 5L)))
    // programmatic surface builds the same match set
    val prog = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
      Seq(MatchRecognize.EPermuteQ(Seq(
          "a" -> ($"event_type" === "A"), "b" -> ($"event_type" === "B")),
          2, 2),
        EStep("c", $"event_type" === "C")),
      skipPastLastRow = true)
      .select(
        element_at($"a", 1).getField("event_id").as("a1"),
        element_at($"a", 2).getField("event_id").as("a2"),
        element_at($"b", 1).getField("event_id").as("b1"),
        element_at($"b", 2).getField("event_id").as("b2"),
        element_at($"c", 1).getField("event_id").as("c_id"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(prog == out)
  }

  test("ALL ROWS PER MATCH WITH UNMATCHED ROWS appends NULL-tagged " +
      "complement rows; streaming rejects it") {
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "purchase"),
      (3L, 30L, 1L, "view"),                    // unmatched
      (4L, 10L, 2L, "view"), (5L, 20L, 2L, "view"))   // all unmatched
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_unmatched_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_unmatched_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  ALL ROWS PER MATCH WITH UNMATCHED ROWS
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase'
          |)""".stripMargin))
      .select($"event_id", $"classifier", $"match_start", $"a_id")
      .as[(Long, Option[String], Option[Long], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, Some("a"), Some(10L), Some(1L)),
      (2L, Some("b"), Some(10L), Some(1L)),
      (3L, None, None, None),
      (4L, None, None, None),
      (5L, None, None, None)))
    // junk after ALL ROWS PER MATCH still rejected
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_unmatched_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  ALL ROWS PER MATCH WITH EXTRA NONSENSE
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase'
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("WITH UNMATCHED ROWS"))
  }

  test("pattern exclusion {- b -}: rows suppressed from ALL ROWS " +
      "output but still matched, measured, and not 'unmatched'") {
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "purchase"),
      (3L, 30L, 1L, "view"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_excl_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(extra: String) = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_excl_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES LAST(b.event_id) AS b_id
           |  ALL ROWS PER MATCH $extra
           |  PATTERN (a {- b -})
           |  DEFINE a AS event_type = 'click',
           |         b AS event_type = 'purchase'
           |)""".stripMargin))
      .select($"event_id", $"classifier", $"b_id")
      .as[(Long, Option[String], Option[Long])].collect().toSet
    // the b row (2) is suppressed but its measure survives on the a row
    assert(run("") == Set((1L, Some("a"), Some(2L))))
    // WITH UNMATCHED ROWS must NOT resurrect the suppressed b row as
    // unmatched — only the view (3) is genuinely unmatched
    assert(run("WITH UNMATCHED ROWS") == Set(
      (1L, Some("a"), Some(2L)), (3L, None, None)))
    // exclusion over an arbitrary sub-pattern: alternation — the
    // branch that matched (b on the purchase row) is suppressed
    def runSub(pat: String, measure: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_excl_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES $measure AS m_id
           |  ALL ROWS PER MATCH
           |  PATTERN ($pat)
           |  DEFINE a AS event_type = 'click',
           |         b AS event_type = 'purchase',
           |         c AS event_type = 'view'
           |)""".stripMargin))
        .select($"event_id", $"classifier", $"m_id")
        .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(runSub("a {- (b|c) -}", "LAST(b.event_id)") ==
      Set((1L, Some("a"), Some(2L))))
    // exclusion over a group: both bound rows suppressed, measures
    // still see them
    assert(runSub("a {- (b c) -}", "LAST(c.event_id)") ==
      Set((1L, Some("a"), Some(3L))))
    // a variable both inside and outside an exclusion: suppression is
    // name-based, so this fails fast with the rename hint
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_excl_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  PATTERN (a {- b -} b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase'
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("inside and outside"))
  }

  test("README sampler: every SQL:2016 construct composed in one " +
      "statement parses and runs") {
    val df = Seq(
      (1L, 10L, 1L, 10.0), (2L, 20L, 1L, 8.0), (3L, 30L, 1L, 6.0),
      (4L, 40L, 1L, 9.0), (5L, 50L, 1L, 12.0))
      .toDF("event_id", "ts_us", "ticker", "price")
    df.createOrReplaceTempView("ticks")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan("""
        SELECT * FROM ticks MATCH_RECOGNIZE (
          PARTITION BY ticker
          ORDER BY ts_us, event_id
          MEASURES MIN(down.price) AS trough, FIRST(w.price) AS top,
                   RUNNING COUNT(down.*) AS n_down
          ALL ROWS PER MATCH WITH UNMATCHED ROWS
          AFTER MATCH SKIP TO LAST w
          PATTERN (strt {- down+ -} up)
          SUBSET w = (strt, up)
          WITHIN INTERVAL '10' MINUTE
          TSSCALE 1000
          DEFINE strt AS true,
                 down AS price < PREV(price),
                 up   AS up.price > strt.price
        )"""))
      .select($"event_id", $"classifier", $"trough", $"top", $"n_down")
      .as[(Long, Option[String], Option[Double], Option[Double],
        Option[Int])]
      .collect().toSet
    // SQL:2016 leftmost semantics (deferred skip-mode emission with
    // cross-variable DEFINE): the match STARTING EARLIEST wins even
    // though the start-2 partial completes first — strt=1 (price 10),
    // down=(2,3) (suppressed), up=5 (12 > strt's 10, the
    // CROSS-VARIABLE comparison; the start-2 candidate completing at
    // row 4 is consumed). SKIP TO LAST up resumes AT row 5; nothing
    // follows, so only row 4 is unmatched. MIN(down.price) is the
    // FINAL trough (6); FIRST(w.price) the union's head (10);
    // RUNNING COUNT grows 0 → 2.
    assert(got == Set(
      (1L, Some("strt"), Some(6.0), Some(10.0), Some(0)),
      (5L, Some("up"), Some(6.0), Some(10.0), Some(2)),
      (4L, None, None, None, None)))
  }

  test("AFTER MATCH SKIP TO resolves pattern variables case-" +
      "insensitively; subset targets resolve to the union") {
    val df = Seq(
      (1L, 10L, 1L, 10.0), (2L, 20L, 1L, 8.0), (3L, 30L, 1L, 12.0),
      (4L, 40L, 1L, 9.0), (5L, 50L, 1L, 14.0))
      .toDF("event_id", "ts_us", "ticker", "price")
    df.createOrReplaceTempView("mr_ci_ticks")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // PATTERN declares Dn/Up mixed-case; the AFTER MATCH slice is
    // case-normalized before matching, so SKIP TO LAST UP must still
    // resolve to the canonical spelling the NFA's slot lookup uses
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan("""
        SELECT * FROM mr_ci_ticks MATCH_RECOGNIZE (
          PARTITION BY ticker
          ORDER BY ts_us, event_id
          MEASURES FIRST(Dn.event_id) AS d_id, Up.event_id AS u_id
          AFTER MATCH SKIP TO LAST UP
          PATTERN (Dn Up)
          DEFINE Dn AS price < 10,
                 Up AS price > PREV(price)
        )"""))
      .select($"d_id", $"u_id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 3L), (4L, 5L)))
    // subset target in a different case: resolves case-insensitively
    // to the union (round 15 lifted the old member-variable-only
    // restriction) — w = (Dn, Up)'s merged-last row is the Up row, so
    // the result equals SKIP TO LAST UP above
    val viaSubset = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan("""
        SELECT * FROM mr_ci_ticks MATCH_RECOGNIZE (
          PARTITION BY ticker
          ORDER BY ts_us, event_id
          MEASURES FIRST(Dn.event_id) AS d_id, Up.event_id AS u_id
          AFTER MATCH SKIP TO LAST W
          PATTERN (Dn Up)
          SUBSET w = (Dn, Up)
          DEFINE Dn AS price < 10,
                 Up AS price > PREV(price)
        )"""))
      .select($"d_id", $"u_id").as[(Long, Long)].collect().toSet
    assert(viaSubset == got)
    // a target that is neither a variable nor a subset: targeted error
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan("""
        SELECT * FROM mr_ci_ticks MATCH_RECOGNIZE (
          PARTITION BY ticker
          ORDER BY ts_us, event_id
          MEASURES Up.event_id AS u_id
          AFTER MATCH SKIP TO LAST nosuch
          PATTERN (Dn Up)
          SUBSET w = (Dn, Up)
          DEFINE Dn AS price < 10,
                 Up AS price > PREV(price)
        )""")
    }
    assert(e.getMessage.contains("not a PATTERN variable or SUBSET"))
  }

  test("SUBSET union variables: measures over the merged (ts, tie)-" +
      "ordered binding; bad members fail fast") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "A"),
      (4L, 40L, 1L, "B"), (5L, 50L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_subset_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subset_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(w.event_id) AS w_first,
          |           LAST(w.event_id) AS w_last,
          |           COUNT(w.*) AS w_n, w.event_id AS w_bare,
          |           c.event_id AS c_id
          |  PATTERN ((a b){2,2} c)
          |  SUBSET w = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C'
          |)""".stripMargin))
      .as[(Long, Long, Long, Int, Long, Long)].collect().toSet
    // the union interleaves a=[1,3] and b=[2,4] back into event order
    assert(got == Set((1L, 1L, 4L, 4, 4L, 5L)))
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_subset_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(w.*) AS n
          |  PATTERN (a b)
          |  SUBSET w = (a, nope)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("unknown pattern"))
  }

  test("PREV/NEXT in DEFINE: the stock-ticker V-shape over input-row " +
      "navigation; unknown column fails fast") {
    // prices per ticker: 10 8 6 9 12 — strt at any row, down = price <
    // PREV(price), up = price > PREV(price)
    val df = Seq(
      (1L, 10L, 1L, 10.0), (2L, 20L, 1L, 8.0), (3L, 30L, 1L, 6.0),
      (4L, 40L, 1L, 9.0), (5L, 50L, 1L, 12.0),
      (6L, 10L, 2L, 5.0), (7L, 20L, 2L, 7.0))   // rises only: no match
      .toDF("event_id", "ts_us", "ticker", "price")
    df.createOrReplaceTempView("mr_prev_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id,
          |           up.event_id AS u_id, up.price AS u_price
          |  PATTERN (strt down up)
          |  DEFINE strt AS true,
          |         down AS price < PREV(price),
          |         up AS price > PREV(price)
          |)""".stripMargin))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // every row seeds (strt AS true): seeds 1 and 2 find down=3 (6<8)
    // wait — row 2 (8<10) is ALSO a down; relaxed semantics bind the
    // FIRST later down per seed, then the first later up
    assert(got.nonEmpty && got.forall(_._1 == 1L))
    // seed 1: first later down = row 2 (8 < 10), first later up after
    // it = row 4 (9 > 6); seed 2: down = row 3, up = row 4; seeds 3/4:
    // down = none later... row 4 is up not down; no match; seed 4:
    // none. ticker 2 rises only: no down ever binds.
    assert(got == Set((1L, 1L, 2L, 4L, 9.0), (1L, 2L, 3L, 4L, 9.0)))
    // unknown PREV column fails fast at parse/compile time
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true, down AS price < PREV(nope)
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("not in"))
    // var-qualified navigation in DEFINE (round-15 lift): PREV(
    // strt.price) = the partition row before strt's bound row. Only
    // the seed at row 2 (PREV = 10) finds a later cheaper row (row 3,
    // price 6 < 10); seeds 1 (PREV null), 3 (PREV 8), 4 (PREV 6) and
    // ticker 2 never do
    val vq = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true, down AS price < PREV(strt.price)
          |)""".stripMargin))
      .select($"s_id", $"d_id").as[(Long, Long)].collect().toSet
    assert(vq == Set((2L, 3L)))
    // the ISO textbook ticker query VERBATIM (own-variable qualified
    // navigation — down.price < PREV(down.price) ≡ price < PREV(price)
    // since the current row is down's last binding): same V-shapes as
    // the plain-spelling run above
    val iso = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id,
          |           up.event_id AS u_id, up.price AS u_price
          |  PATTERN (strt down up)
          |  DEFINE strt AS true,
          |         down AS down.price < PREV(down.price),
          |         up AS up.price > PREV(up.price)
          |)""".stripMargin))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(iso == got)
    // nested navigation in DEFINE (round-16 lift): strt binds ONE row
    // here, so PREV(FIRST(strt.price)) ≡ PREV(strt.price) — the nested
    // spelling must agree with the simple vq run above
    val nested = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true,
          |         down AS price < PREV(FIRST(strt.price))
          |)""".stripMargin))
      .select($"s_id", $"d_id").as[(Long, Long)].collect().toSet
    assert(nested == vq)
    // nested navigation over a SUBSET union (round-16 lift): the
    // union's merged-FIRST bound row is strt's row here, so the
    // spelling agrees with PREV(strt.price)
    val en = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id
          |  PATTERN (strt down)
          |  SUBSET w = (strt, down)
          |  DEFINE strt AS true,
          |         down AS price < PREV(FIRST(w.price))
          |)""".stripMargin))
      .select($"s_id", $"d_id").as[(Long, Long)].collect().toSet
    assert(en == vq)
    // flat navigation from the union: down is a MEMBER of w, so the
    // merged-LAST bound row is the current row under running
    // semantics and PREV(w.price) degenerates to plain PREV(price) —
    // the V-shape's down legs: rows 2 (8 < 10) and 3 (6 < 8)
    val ef = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id
          |  PATTERN (strt down)
          |  SUBSET w = (strt, down)
          |  DEFINE strt AS true,
          |         down AS price < PREV(w.price)
          |)""".stripMargin))
      .select($"s_id", $"d_id").as[(Long, Long)].collect().toSet
    assert(ef == Set((1L, 2L), (2L, 3L)))
    // expression argument inside the nested form (round-16 lift):
    // PREV(FIRST(strt.price * 2)) = the doubled value of the row
    // before strt's binding — seeds 2 (anchor 20) and 3 (anchor 16)
    // find cheaper rows, seed 4 (anchor 12) does not (12 < 12 fails)
    val ex = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true,
          |         down AS price < PREV(FIRST(strt.price * 2))
          |)""".stripMargin))
      .select($"s_id", $"d_id").as[(Long, Long)].collect().toSet
    assert(ex == Set((2L, 3L), (3L, 4L)))
    // an UNQUALIFIED nested expression now anchors at the UNIVERSAL
    // variable (round 19 — all rows of the match; with strt the first
    // bound row it coincides with the strt-qualified form above)
    val univ = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id, down.event_id AS d_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true,
          |         down AS price < PREV(FIRST(price * 2))
          |)""".stripMargin))
      .select($"s_id", $"d_id").as[(Long, Long)].collect().toSet
    assert(univ == ex, s"universal nested: $univ vs $ex")
    // fail-fasts that remain: a nested argument that is not
    // comma/paren-free, and an unknown qualifier
    val enq = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true,
          |         down AS price < PREV(FIRST(abs(price)))
          |)""".stripMargin)
    }
    assert(enq.getMessage.contains("nested navigation takes"))
    val euq = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_prev_view MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_us, event_id
          |  MEASURES strt.event_id AS s_id
          |  PATTERN (strt down)
          |  DEFINE strt AS true, down AS price < PREV(t.price)
          |)""".stripMargin)
    }
    assert(euq.getMessage.contains("not a PATTERN variable"))
  }

  test("RUNNING measures aggregate only the bindings at-or-before the " +
      "row; equal FINAL in one-row mode") {
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "view"),
      (3L, 25L, 1L, "error"),           // skipped, relaxed match
      (4L, 30L, 1L, "view"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_running_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_running_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(v.*) AS final_nv,
          |           RUNNING COUNT(v.*) AS run_nv,
          |           RUNNING SUM(v.ts_us) AS run_sum,
          |           RUNNING LAST(v.event_id) AS run_last
          |  ALL ROWS PER MATCH
          |  PATTERN (a v{2,2})
          |  DEFINE a AS event_type = 'click',
          |         v AS event_type = 'view'
          |)""".stripMargin))
      .select($"event_id", $"classifier", $"final_nv", $"run_nv",
        $"run_sum", $"run_last")
      .as[(Long, String, Int, Int, Option[Double], Option[Long])]
      .collect().toSet
    // one match: click(1) view(2) view(4); FINAL count repeats 2 on
    // every row, RUNNING counts 0/1/2 and sums/lasts grow with the row
    assert(got == Set(
      (1L, "a", 2, 0, None, None),
      (2L, "v", 2, 1, Some(20.0), Some(2L)),
      (4L, "v", 2, 2, Some(50.0), Some(4L))))
    // one-row mode: RUNNING is an alias for FINAL (the standard — the
    // single output row IS the final row, where the two coincide)
    val oneRow = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_running_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES RUNNING COUNT(v.*) AS run_nv, COUNT(v.*) AS fin_nv
          |  PATTERN (a v{2,2})
          |  DEFINE a AS event_type = 'click',
          |         v AS event_type = 'view'
          |)""".stripMargin))
      .as[(Long, Int, Int)].collect().toSet
    assert(oneRow == Set((1L, 2, 2)))
  }

  test("MATCH_NUMBER() numbers matches sequentially per partition; " +
      "FINAL by nature; batch only") {
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "view"),
      (3L, 30L, 1L, "click"), (4L, 40L, 1L, "view"),
      (5L, 15L, 2L, "click"), (6L, 25L, 2L, "view"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_mn_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_mn_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, MATCH_NUMBER() AS mn
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click', b AS event_type = 'view'
          |)""".stripMargin))
      .as[(Long, Long, Int)].collect().toSet
    // user 1 has two non-overlapping matches numbered 1, 2 in start
    // order; user 2's numbering restarts at 1
    assert(got == Set((1L, 1L, 1), (1L, 3L, 2), (2L, 5L, 1)))
    // ALL ROWS: the number repeats on every row of its match
    val all = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_mn_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES MATCH_NUMBER() AS mn
          |  ALL ROWS PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click', b AS event_type = 'view'
          |)""".stripMargin))
      .select($"event_id", $"mn").as[(Long, Int)].collect().toSet
    assert(all == Set((1L, 1), (2L, 1), (3L, 2), (4L, 2),
      (5L, 1), (6L, 1)))
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_mn_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES RUNNING MATCH_NUMBER() AS mn
          |  ALL ROWS PER MATCH
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click', b AS event_type = 'view'
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("FINAL by nature"))
  }

  test("WITHIN INTERVAL converts through TSSCALE; rejected without it") {
    val df = Seq(
      (1L, 10000000L, 1L, "click"), (2L, 500000000L, 1L, "purchase"),
      (3L, 700000000L, 1L, "click"), (4L, 1400000000L, 1L, "purchase"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_interval_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(within: String, tsscale: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_interval_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, b.event_id AS b_id
           |  PATTERN (a b)
           |  $within
           |  $tsscale
           |  DEFINE a AS event_type = 'click',
           |         b AS event_type = 'purchase'
           |)""".stripMargin))
        .as[(Long, Long, Long)].collect().toSet
    // 10 min = 600 s; pair (1,2) spans 490 s (in), (3,4) spans 700 s
    // (out) — INTERVAL through TSSCALE 1000 equals the raw-µs form
    val viaInterval = run("WITHIN INTERVAL '10' MINUTE", "TSSCALE 1000")
    val viaRaw = run("WITHIN 600000000", "")
    assert(viaInterval == Set((1L, 1L, 2L)) && viaInterval == viaRaw)
    val e = intercept[IllegalArgumentException] {
      run("WITHIN INTERVAL '10' MINUTE", "")
    }
    assert(e.getMessage.contains("TSSCALE"))
  }

  test("streaming MATCH_RECOGNIZE accepts an n-ary PERMUTE") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[REv]
    input.toDF()
      .withColumn("ets", timestamp_micros($"ts_us"))
      .withWatermark("ets", "0 seconds")
      .createOrReplaceTempView("mr_permute_stream")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_permute_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           c.event_id AS c_id
          |  PATTERN (PERMUTE(a, b, c))
          |  EVENTTIME ets
          |  TSSCALE 1000
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C'
          |)""".stripMargin))
    val q = out.writeStream.format("memory")
      .queryName("mr_permute_stream_out").outputMode("append").start()
    try {
      // reversed order across two micro-batches: C, then B and A
      input.addData(REv(1, 10000000L, 1, "C"))
      q.processAllAvailable()
      input.addData(REv(2, 20000000L, 1, "B"), REv(3, 30000000L, 1, "A"))
      q.processAllAvailable()
      input.addData(REv(9, 99000000L, 9, "Z")) // advance the watermark
      q.processAllAvailable()
      val rows = spark.table("mr_permute_stream_out")
        .select($"user_id", $"a_id", $"b_id", $"c_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 3L, 2L, 1L)))
    } finally q.stop()
  }

  test("streaming 6-member composite PERMUTE (bitmask automaton) " +
      "matches the batch statement across micro-batch splits") {
    // r17: the bitmask mask register rides rxCnt, so the lifted arity
    // flows through the streaming executor's checkpointed state
    // unchanged — pin batch/streaming parity on a 6-member composite
    // PERMUTE split across micro-batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stmt = (table: String, streamingClauses: String) =>
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES COUNT(a1.*) AS n_a1, COUNT(a2.*) AS n_a2,
         |           COUNT(b.*) AS n_b, COUNT(c1.*) AS n_c1,
         |           COUNT(c2.*) AS n_c2, COUNT(d1.*) AS n_d1,
         |           COUNT(d2.*) AS n_d2, COUNT(e.*) AS n_e,
         |           COUNT(f1.*) AS n_f1, COUNT(f2.*) AS n_f2
         |  PATTERN (PERMUTE((a1 a2), b, (c1 c2?), (d1 | d2), e,
         |                   (f1 f2)))
         |  $streamingClauses
         |  DEFINE a1 AS event_type = 'A', a2 AS event_type = 'B',
         |         b AS event_type = 'B', c1 AS event_type = 'C',
         |         c2 AS event_type = 'A', d1 AS event_type = 'D',
         |         d2 AS event_type = 'B', e AS event_type = 'E',
         |         f1 AS event_type = 'F', f2 AS event_type = 'A'
         |)""".stripMargin
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val u1 = Seq("A", "B", "B", "C", "A", "D", "E", "F", "A")
    val u2 = Seq("E", "F", "A", "D", "C", "A", "A", "B", "B")
    val evs = (u1.map((1L, _)) ++ u2.map((2L, _))).zipWithIndex.map {
      case ((u, t), i) =>
        REv(i.toLong, (i + 1).toLong * 10000000L, u, t)
    }
    evs.map(e => (e.event_id, e.ts_us, e.user_id, e.event_type))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_perm6b_sql")
    val batch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_perm6b_sql", "")))
      .collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty, "batch fixture found no matches")
    val input = MemoryStream[REv]
    input.toDF()
      .withColumn("ets", timestamp_micros($"ts_us"))
      .withWatermark("ets", "0 seconds")
      .createOrReplaceTempView("mr_perm6s_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_perm6s_stream",
        "EVENTTIME ets\n  TSSCALE 1000")))
    val q = out.writeStream.format("memory")
      .queryName("mr_perm6s_out").outputMode("append").start()
    try {
      // three uneven micro-batches so live bitmask partials cross
      // batch boundaries mid-permutation
      evs.grouped(7).foreach { g =>
        input.addData(g: _*); q.processAllAvailable()
      }
      input.addData(REv(99, 990000000L, 9, "Z"))
      q.processAllAvailable()
      val streamed = spark.table("mr_perm6s_out")
        .drop("ets").collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        s"streaming(${streamed.length}) != batch(${batch.length})\n" +
          s"streaming=${streamed.take(6)}\nbatch=${batch.take(6)}")
    } finally q.stop()
  }

  test("streaming ALL ROWS supports RUNNING measures") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[REv]
    input.toDF()
      .withColumn("ets", timestamp_micros($"ts_us"))
      .withWatermark("ets", "0 seconds")
      .createOrReplaceTempView("mr_run_stream")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_run_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES RUNNING COUNT(v.*) AS run_nv
          |  ALL ROWS PER MATCH
          |  PATTERN (a v{2,2})
          |  EVENTTIME ets
          |  TSSCALE 1000
          |  DEFINE a AS event_type = 'A', v AS event_type = 'V'
          |)""".stripMargin))
    val q = out.writeStream.format("memory")
      .queryName("mr_run_stream_out").outputMode("append").start()
    try {
      input.addData(REv(1, 10000000L, 1, "A"), REv(2, 20000000L, 1, "V"),
        REv(3, 30000000L, 1, "V"))
      q.processAllAvailable()
      input.addData(REv(9, 99000000L, 9, "Z"))
      q.processAllAvailable()
      val rows = spark.table("mr_run_stream_out")
        .select($"event_id", $"run_nv")
        .as[(Long, Int)].collect().toSet
      assert(rows == Set((1L, 0), (2L, 1), (3L, 2)))
    } finally q.stop()
  }

  test("streaming SQL MATCH_RECOGNIZE accepts a quantified group") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[REv]
    input.toDF()
      .withColumn("ets", timestamp_micros($"ts_us"))
      .withWatermark("ets", "0 seconds")
      .createOrReplaceTempView("mr_group_stream")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_group_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_first, COUNT(b.*) AS n_b
          |  PATTERN ((a b){2,2})
          |  EVENTTIME ets
          |  TSSCALE 1000
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
    val q = out.writeStream.format("memory")
      .queryName("mr_group_stream_out").outputMode("append").start()
    try {
      input.addData(REv(1, 10000000L, 1, "A"), REv(2, 20000000L, 1, "B"),
        REv(3, 30000000L, 1, "A"), REv(4, 40000000L, 1, "B"))
      q.processAllAvailable()
      input.addData(REv(9, 99000000L, 9, "Z")) // advance the watermark
      q.processAllAvailable()
      val rows = spark.table("mr_group_stream_out")
        .select($"user_id", $"a_first", $"n_b")
        .as[(Long, Long, Int)].collect().toSet
      assert(rows == Set((1L, 1L, 2)))
    } finally q.stop()
  }

  test("SQL pattern: quantified item inside a group — (a+ b){2,2}") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "A"), (3L, 30L, 1L, "B"),
      (4L, 40L, 1L, "A"), (5L, 50L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_rx_qinner_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_rx_qinner_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_first, COUNT(a.*) AS n_a,
          |           COUNT(b.*) AS n_b
          |  PATTERN ((a+ b){2,2})
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .as[(Long, Long, Int, Int)].collect().toSet
    // seeds 1 and 2 complete two full iterations at B(5)
    assert(got == Set((1L, 1L, 3, 2), (1L, 2L, 2, 2)))
  }

  test("SQL pattern: depth-2 nesting — ((a b) c){1,2} d") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"),
      (4L, 40L, 1L, "A"), (5L, 50L, 1L, "B"), (6L, 60L, 1L, "C"),
      (7L, 70L, 1L, "D"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_rx_deep_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_rx_deep_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_first, COUNT(c.*) AS n_c,
          |           d.event_id AS d_id
          |  PATTERN (((a b) c){1,2} d)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C', d AS event_type = 'D'
          |)""".stripMargin))
      .as[(Long, Long, Int, Long)].collect().toSet
    // seed 1: the 1-iteration and 2-iteration boundaries both advance
    // into d; seed 4: one iteration
    assert(got == Set((1L, 1L, 1, 7L), (1L, 1L, 2, 7L), (1L, 4L, 1, 7L)))
  }

  test("SQL pattern: alternation of sequences — (a b | c d)") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "C"), (3L, 30L, 1L, "D"),
      (4L, 40L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_rx_altseq_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_rx_altseq_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           c.event_id AS c_id, d.event_id AS d_id
          |  PATTERN ((a b | c d))
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C', d AS event_type = 'D'
          |)""".stripMargin))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, Some(1L), Some(4L), None, None),
      (1L, None, None, Some(2L), Some(3L))))
  }

  test("SQL pattern: a variable occurring twice — (a b a) compiles " +
      "whole-pattern recursive with a shared slot") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "A"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_rx_dupvar_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_rx_dupvar_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_first,
          |           LAST(a.event_id) AS a_last, b.event_id AS b_id
          |  PATTERN (a b a)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L, 2L)))
  }

  test("SQL pattern: reluctant a+? elects the shortest same-start " +
      "candidate under SKIP PAST LAST ROW (greedy elects longest)") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "A"), (3L, 30L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_rx_rel_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(q: String): Set[(Long, String)] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_rx_rel_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.event_id) AS a_first
           |  ALL ROWS PER MATCH
           |  AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN ($q b)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
           |)""".stripMargin))
        .select($"event_id", $"classifier")
        .as[(Long, String)].collect().toSet
    // greedy: one 3-row match (a=[1,2], b=3); reluctant: the 2-row
    // match (a=[1], b=3) is elected — different ALL ROWS row counts
    assert(run("a+") == Set((1L, "a"), (2L, "a"), (3L, "b")))
    assert(run("a+?") == Set((1L, "a"), (3L, "b")))
  }

  test("streaming SQL pattern: quantified item inside a group matches " +
      "batch — (a+ b){2,2}") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[REv]
    input.toDF()
      .withColumn("ets", timestamp_micros($"ts_us"))
      .withWatermark("ets", "0 seconds")
      .createOrReplaceTempView("mr_rx_stream")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_rx_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_first, COUNT(a.*) AS n_a,
          |           COUNT(b.*) AS n_b
          |  PATTERN ((a+ b){2,2})
          |  EVENTTIME ets
          |  TSSCALE 1000
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
    val q = out.writeStream.format("memory")
      .queryName("mr_rx_stream_out").outputMode("append").start()
    try {
      input.addData(REv(1, 10000000L, 1, "A"), REv(2, 20000000L, 1, "A"),
        REv(3, 30000000L, 1, "B"))
      q.processAllAvailable()
      input.addData(REv(4, 40000000L, 1, "A"), REv(5, 50000000L, 1, "B"))
      q.processAllAvailable()
      input.addData(REv(9, 99000000L, 9, "Z")) // advance the watermark
      q.processAllAvailable()
      val rows = spark.table("mr_rx_stream_out")
        .select($"a_first", $"n_a", $"n_b")
        .as[(Long, Int, Int)].collect().toSet
      // the batch test's result set, straddling micro-batches
      assert(rows == Set((1L, 3, 2), (2L, 2, 2)))
    } finally q.stop()
  }

  test("WITH UNMATCHED ROWS: a NULL partition key does not double-report " +
      "its matched rows (null-safe identity join)") {
    // the NFA groups NULL keys and matches them normally; the unmatched
    // complement must use <=> identity or the null-keyed matched rows
    // reappear as unmatched
    val df = Seq(
      (1L, 10L, Some(1L), "click"), (2L, 20L, Some(1L), "purchase"),
      (3L, 10L, None, "click"), (4L, 20L, None, "purchase"),
      (5L, 30L, None, "view")) // genuinely unmatched, null key
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_nullkey_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nullkey_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id
          |  ALL ROWS PER MATCH WITH UNMATCHED ROWS
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase'
          |)""".stripMargin))
      .select($"event_id", $"classifier")
      .as[(Long, Option[String])].collect().toList.sorted
    // exactly one row per input event; null-keyed matches keep their
    // classifier, only event 5 is unmatched
    assert(got == List(
      (1L, Some("a")), (2L, Some("b")),
      (3L, Some("a")), (4L, Some("b")),
      (5L, None)))
  }

  test("pattern exclusion admits brace quantifiers: {- b{1,2} -}") {
    val df = Seq(
      (1L, 10L, 1L, "click"), (2L, 20L, 1L, "purchase"),
      (3L, 30L, 1L, "purchase"), (4L, 40L, 1L, "view"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_exclq_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_exclq_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(b.*) AS n_b
          |  ALL ROWS PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a {- b{2,2} -} c)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'purchase',
          |         c AS event_type = 'view'
          |)""".stripMargin))
      .select($"event_id", $"classifier", $"n_b")
      .as[(Long, String, Int)].collect().toSet
    // both purchase rows bound to b (quantifier honored, measure sees
    // them) but their rows are suppressed from ALL ROWS output
    assert(got == Set((1L, "a", 2), (4L, "c", 2)))
  }

  test("keepSlots clash: input column named like a pattern variable " +
      "fails fast with a rename message") {
    val df = Seq((1L, 10L, 1L, "click", 5L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "a")
    df.createOrReplaceTempView("mr_slotclash_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(
          """SELECT * FROM mr_slotclash_view MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts_us, event_id
            |  MEASURES RUNNING COUNT(a.*) AS n_run
            |  ALL ROWS PER MATCH
            |  PATTERN (a)
            |  DEFINE a AS event_type = 'click'
            |)""".stripMargin)).collect()
    }
    assert(e.getMessage.contains("rename the pattern variable"))
  }

  test("cross-variable DEFINE predicates: programmatic cvLast/cvFirst " +
      "bind against the partial match") {
    // a (type A), b (type B with value below a's), c (type C with value
    // above b's last) — e3 (B, 9) must NOT bind b (9 > 5), yet c still
    // binds later (skip-till-next)
    val df = Seq(
      (1L, 10L, 1L, "A", 5.0), (2L, 20L, 1L, "B", 3.0),
      (3L, 30L, 1L, "B", 9.0), (4L, 40L, 1L, "C", 6.0))
      .toDF("event_id", "ts_us", "user_id", "typ", "value")
    val got = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
      Seq(
        EStep("a", $"typ" === "A"),
        EStep("b", $"typ" === "B" &&
          $"value" < MatchRecognize.cvLast("a", "value")),
        EStep("c", $"typ" === "C" &&
          $"value" > MatchRecognize.cvLast("b", "value"))))
      .select(
        element_at($"a", 1).getField("event_id").as("a_id"),
        element_at($"b", 1).getField("event_id").as("b_id"),
        element_at($"c", 1).getField("event_id").as("c_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 4L)))
    // unknown variable in a marker fails fast
    val e = intercept[IllegalArgumentException] {
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"typ" === "A"),
          EStep("b", $"value" < MatchRecognize.cvFirst("zz", "value"))))
    }
    assert(e.getMessage.contains("unknown pattern variable"))
  }

  test("SQL cross-variable DEFINE == programmatic; own-var FIRST " +
      "coalesces to the current row on the first binding") {
    val df = Seq(
      (1L, 10L, 1L, "A", 5.0), (2L, 20L, 1L, "B", 3.0),
      (3L, 30L, 1L, "B", 9.0), (4L, 40L, 1L, "C", 6.0),
      // user 2: down-run then recovery above the run's start
      (5L, 10L, 2L, "A", 8.0), (6L, 20L, 2L, "B", 7.0),
      (7L, 30L, 2L, "B", 6.0), (8L, 40L, 2L, "C", 9.0))
      .toDF("event_id", "ts_us", "user_id", "typ", "value")
    df.createOrReplaceTempView("mr_cv_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cv_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, COUNT(b.*) AS n_b,
          |           c.event_id AS c_id
          |  PATTERN (a b+ c)
          |  DEFINE a AS typ = 'A',
          |         b AS typ = 'B' AND b.value < LAST(a.value)
          |                       AND b.value <= FIRST(b.value),
          |         c AS typ = 'C' AND c.value > FIRST(a.value)
          |)""".stripMargin))
      .select($"user_id", $"a_id", $"n_b", $"c_id")
      .as[(Long, Long, Int, Long)].collect().toSet
    // user 1: b binds only e2 (e3's 9.0 fails b.value < a's 5.0);
    //   c needs value > 5.0 → e4 (6.0). user 2: b run is 7.0 then 6.0
    //   (6.0 <= FIRST(b)=7.0 holds), c is 9.0 > 8.0.
    assert(got.contains((2L, 5L, 2, 8L)))
    assert(got.contains((1L, 1L, 1, 4L)))
    // b+ branches also emit the shorter user-2 match (b = [e6] only)
    assert(got == Set((1L, 1L, 1, 4L), (2L, 5L, 2, 8L), (2L, 5L, 1, 8L)))
  }

  test("AFTER MATCH SKIP TO LAST b: counts differ from both SKIP TO " +
      "NEXT ROW and SKIP PAST LAST ROW on one fixture") {
    // A1 A2 B3 A4 C5 B6 C7 (one user): overlap finds (1,3,5) (2,3,5)
    // (4,6,7); skip-to-last-b resumes AT row 3 after emitting (1,3,5),
    // so (2,3,5) is consumed but the a4 seed survives → 2 matches;
    // skip-past-last-row clears everything past row 5 → 1 match
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "A"), (3L, 30L, 1L, "B"),
      (4L, 40L, 1L, "A"), (5L, 50L, 1L, "C"), (6L, 60L, 1L, "B"),
      (7L, 70L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_skipto_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(afterMatch: String) = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_skipto_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
           |           c.event_id AS c_id
           |  $afterMatch
           |  PATTERN (a b c)
           |  DEFINE a AS event_type = 'A',
           |         b AS event_type = 'B',
           |         c AS event_type = 'C'
           |)""".stripMargin))
      .select($"a_id", $"b_id", $"c_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(run("AFTER MATCH SKIP TO NEXT ROW") ==
      Set((1L, 3L, 5L), (2L, 3L, 5L), (4L, 6L, 7L)))
    assert(run("AFTER MATCH SKIP PAST LAST ROW") == Set((1L, 3L, 5L)))
    assert(run("AFTER MATCH SKIP TO LAST b") ==
      Set((1L, 3L, 5L), (4L, 6L, 7L)))
    // SKIP TO b == SKIP TO LAST b (the standard's default)
    assert(run("AFTER MATCH SKIP TO b") ==
      run("AFTER MATCH SKIP TO LAST b"))
    // FIRST and LAST agree when the variable binds once
    assert(run("AFTER MATCH SKIP TO FIRST b") ==
      run("AFTER MATCH SKIP TO LAST b"))
  }

  test("SKIP TO errors: unbound target variable is a runtime error; " +
      "programmatic surface composes") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    // b? binds nothing: SKIP TO LAST b must error per the standard
    val got = MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
      Seq(EStep("a", $"event_type" === "A"),
        EStep("b", $"event_type" === "B", min = 0, max = 1),
        EStep("c", $"event_type" === "C")),
      skipToVar = Some(("b", false)))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val e = intercept[Exception](got.collect())
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("bound no rows")))
    // unknown variable rejected at build time
    val e2 = intercept[IllegalArgumentException] {
      MatchRecognize(df, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"event_type" === "A")),
        skipToVar = Some(("zz", true)))
    }
    assert(e2.getMessage.contains("unknown pattern variable"))
  }

  test("MEASURES MIN/MAX over a quantified variable: FINAL and RUNNING " +
      "forms; min != first != last on the fixture") {
    // v binds values 7, 2, 9 → FIRST=7, LAST=9, MIN=2, MAX=9
    val df = Seq(
      (1L, 10L, 1L, "A", 5.0), (2L, 20L, 1L, "V", 7.0),
      (3L, 30L, 1L, "V", 2.0), (4L, 40L, 1L, "V", 9.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    df.createOrReplaceTempView("mr_minmax_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val one = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_minmax_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES MIN(v.value) AS min_v, MAX(v.value) AS max_v,
          |           FIRST(v.value) AS first_v, LAST(v.value) AS last_v
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a v{3,3})
          |  DEFINE a AS event_type = 'A', v AS event_type = 'V'
          |)""".stripMargin))
      .select($"min_v", $"max_v", $"first_v", $"last_v")
      .as[(Double, Double, Double, Double)].collect().toSet
    assert(one == Set((2.0, 9.0, 7.0, 9.0)))
    // RUNNING MIN/MAX grow row-by-row in ALL ROWS mode
    val run = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_minmax_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES MIN(v.value) AS fin_min,
          |           RUNNING MIN(v.value) AS run_min,
          |           RUNNING MAX(v.value) AS run_max
          |  ALL ROWS PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a v{3,3})
          |  DEFINE a AS event_type = 'A', v AS event_type = 'V'
          |)""".stripMargin))
      .select($"event_id", $"fin_min", $"run_min", $"run_max")
      .as[(Long, Double, Option[Double], Option[Double])]
      .collect().toSet
    assert(run == Set(
      (1L, 2.0, None, None),              // the a row: no v bound yet
      (2L, 2.0, Some(7.0), Some(7.0)),
      (3L, 2.0, Some(2.0), Some(7.0)),
      (4L, 2.0, Some(2.0), Some(9.0))))
  }

  test("SQL nested groups: (a (b|c)){2,2} and (a PERMUTE(d,e)){2,2} " +
      "iterate heterogeneous items; streaming accepts them") {
    val df = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"),
      (3L, 30L, 1L, "A"), (4L, 40L, 1L, "C"), (5L, 50L, 1L, "D"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df.createOrReplaceTempView("mr_nested_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nested_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(a.*) AS n_a, FIRST(b.event_id) AS b_id,
          |           FIRST(c.event_id) AS c_id, d.event_id AS d_id
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN ((a (b|c)){2,2} d)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C', d AS event_type = 'D'
          |)""".stripMargin))
      .select($"n_a", $"b_id", $"c_id", $"d_id")
      .as[(Int, Option[Long], Option[Long], Long)].collect().toSet
    // iter 1 routes B to b, iter 2 routes C to c; both iterations
    // share a's slot
    assert(got == Set((2, Some(2L), Some(4L), 5L)))

    val df2 = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "E"), (3L, 30L, 1L, "D"),
      (4L, 40L, 1L, "A"), (5L, 50L, 1L, "D"), (6L, 60L, 1L, "E"),
      (7L, 70L, 1L, "F"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    df2.createOrReplaceTempView("mr_nested2_view")
    val got2 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nested2_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a1, LAST(a.event_id) AS a2,
          |           FIRST(d.event_id) AS d1, LAST(d.event_id) AS d2,
          |           FIRST(e.event_id) AS e1, LAST(e.event_id) AS e2,
          |           f.event_id AS f_id
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN ((a PERMUTE(d, e)){2,2} f)
          |  DEFINE a AS event_type = 'A', d AS event_type = 'D',
          |         e AS event_type = 'E', f AS event_type = 'F'
          |)""".stripMargin))
      .select($"a1", $"a2", $"d1", $"d2", $"e1", $"e2", $"f_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // iter 1: a=1 then (e=2, d=3) any order; iter 2: a=4, d=5, e=6
    assert(got2 == Set((1L, 4L, 3L, 5L, 2L, 6L, 7L)))

    // the same nested statement compiles onto the streaming executor
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_nested_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nested_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES COUNT(a.*) AS n_a, FIRST(b.event_id) AS b_id,
          |           FIRST(c.event_id) AS c_id, d.event_id AS d_id
          |  PATTERN ((a (b|c)){2,2} d)
          |  WITHIN 100000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C', d AS event_type = 'D'
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_nested_sink").start()
    try {
      input.addData((1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"))
      q.processAllAvailable()
      input.addData((3L, 3000L, 1L, "A"), (4L, 4000L, 1L, "C"),
        (5L, 5000L, 1L, "D"), (91L, 60000L, 9L, "X"))
      q.processAllAvailable()
      val streamed = spark.table("mr_nested_sink")
        .select($"n_a", $"b_id", $"c_id", $"d_id")
        .as[(Int, Option[Long], Option[Long], Long)].collect().toSet
      assert(streamed == Set((2, Some(2L), Some(4L), 5L)))
    } finally q.stop()
  }

  test("cross-variable DEFINE inside a quantified variable: the run " +
      "keeps climbing above the seed (ctxPred on a b+ step)") {
    // v+ collects values strictly above the seed a's — e3 (4.0 < 5.0)
    // breaks nothing but never binds; SQL and programmatic agree
    val df = Seq(
      (1L, 10L, 1L, "A", 5.0), (2L, 20L, 1L, "V", 7.0),
      (3L, 30L, 1L, "V", 4.0), (4L, 40L, 1L, "V", 9.0),
      (5L, 50L, 1L, "Z", 0.0))
      .toDF("event_id", "ts_us", "user_id", "typ", "value")
    df.createOrReplaceTempView("mr_cvq_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cvq_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(v.*) AS n_v, MIN(v.value) AS min_v
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a v+ z)
          |  DEFINE a AS typ = 'A',
          |         v AS typ = 'V' AND v.value > a.value,
          |         z AS typ = 'Z'
          |)""".stripMargin))
      .select($"n_v", $"min_v")
      .as[(Int, Double)].collect().toSet
    // v binds e2 (7 > 5) and e4 (9 > 5); e3 is skipped (4 < 5)
    assert(got == Set((2, 7.0)))
    // a quantified GROUP's inner variable referencing another variable
    val got2 = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cvq_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(v.*) AS n_v
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN ((v){2,2} z)
          |  DEFINE v AS typ = 'V' AND v.value >= FIRST(v.value),
          |         z AS typ = 'Z'
          |)""".stripMargin))
      .select($"n_v").as[Int].collect().toSet
    // own-var FIRST coalesces to the current row on the first binding
    // (7 >= 7 admits it); the second must reach 7 → e4 (9), e3 (4)
    // skipped
    assert(got2 == Set(2))
  }

  test("streaming cross-variable DEFINE == batch (interpreted " +
      "per-partial evaluator); binds-only streaming() still rejects") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // prices per ticker: the down/up recovery shape of q175 — down
    // below the seed's price, up above it, both via bindings, with
    // the micro-batch boundary between the seed and its down row
    val rows = Seq( // (event_id, ts_ms, user_id, price)
      (1L, 1000L, 1L, 10.0), (2L, 2000L, 1L, 8.0),
      (3L, 3000L, 1L, 12.0), (4L, 1500L, 2L, 5.0))
    val ticks = Seq((91L, 30000L, 9L, 0.0))
    val stmt = (table: String, streamingClauses: String) =>
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_ms, event_id
         |  MEASURES strt.event_id AS s_id, down.event_id AS d_id,
         |           up.event_id AS u_id
         |  PATTERN (strt down up)
         |  WITHIN 100000
         |  $streamingClauses
         |  DEFINE strt AS true,
         |         down AS down.price < strt.price,
         |         up AS up.price > strt.price
         |)""".stripMargin
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val input = MemoryStream[(Long, Long, Long, Double)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "price")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_cv_stream_view")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_cv_stream_view", "EVENTTIME etc")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_cv_stream_sink").start()
    try {
      input.addData(rows.take(1): _*)
      q.processAllAvailable()
      input.addData(rows.drop(1) ++ ticks: _*)
      q.processAllAvailable()
      val streamed = spark.table("mr_cv_stream_sink")
        .select($"user_id", $"s_id", $"d_id", $"u_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      (rows ++ ticks).toDF("event_id", "ts_ms", "user_id", "price")
        .createOrReplaceTempView("mr_cv_batch_view")
      val batch = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_cv_batch_view", "")))
        .select($"user_id", $"s_id", $"d_id", $"u_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 1L, 2L, 3L)))
    } finally q.stop()
    // the binds-only streaming() surface cannot evaluate markers
    val sdf2 = input.toDF()
      .toDF("event_id", "ts_us", "user_id", "price")
      .withColumn("ets", timestamp_micros($"ts_us"))
    val e2 = intercept[IllegalArgumentException] {
      MatchRecognize.streaming(sdf2, Seq("user_id"), "ts_us", "event_id",
        Seq(EStep("a", $"price" > 0),
          EStep("b", $"price" > MatchRecognize.cvFirst("a", "price"))),
        "ets")
    }
    assert(e2.getMessage.contains("batch operator"))
  }

  test("SQL:2016 brace quantifier forms: {n} exact, {n,} unbounded, " +
      "{,n} zero-floor — each equals its explicit {m,n} spelling") {
    // reuses mr_nav_view: A(1) X(99) A(2) B(3) X(7)
    Seq((1L, 10L, 1L, "A", 1L), (2L, 20L, 1L, "X", 99L),
      (3L, 30L, 1L, "A", 2L), (4L, 40L, 1L, "B", 3L),
      (5L, 50L, 1L, "X", 7L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_brace_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(q: String): Set[(Long, Long, Long)] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_brace_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.event_id) AS a0, LAST(a.event_id) AS a1,
           |           b.event_id AS b_id
           |  PATTERN (a$q b)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
           |)""".stripMargin))
        .select($"a0", $"a1", $"b_id")
        .as[(Long, Long, Long)].collect().toSet
    assert(run("{2}") == run("{2,2}"))
    assert(run("{2}") == Set((1L, 3L, 4L)))
    assert(run("{2,}") == run("{2,2}"))   // only two A rows exist
    // {,n} (zero floor) is only legal past the first element — the
    // engine rejects a zero-width match start
    def run2(q: String): Set[(Long, Option[Long], Long)] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_brace_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, LAST(b.event_id) AS b1,
           |           x.event_id AS x_id
           |  PATTERN (a b$q x)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
           |         x AS event_type = 'X'
           |)""".stripMargin))
        .select($"a_id", $"b1", $"x_id")
        .as[(Long, Option[Long], Long)].collect().toSet
    assert(run2("{,2}") == run2("{0,2}"))
    assert(run2("{,2}").nonEmpty)
    // reluctant composes: {2}? == {2,2}? (exact bound, lazy no-op)
    assert(run("{2}?") == run("{2,2}?"))
    // exclusion admits the new forms
    val excl = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_brace_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES LAST(a.event_id) AS a1
          |  ALL ROWS PER MATCH
          |  PATTERN ({- a{2} -} b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"event_id", $"a1").as[(Long, Long)].collect().toSet
    assert(excl == Set((4L, 3L)))
    // {0} stays rejected
    val e = intercept[IllegalArgumentException](run("{0}"))
    assert(e.getMessage.contains("bad quantifier"))
  }

  test("ALL ROWS PER MATCH OMIT EMPTY MATCHES parses (the standing " +
      "behavior); SHOW EMPTY MATCHES gets the targeted error") {
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_empty_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(mode: String) = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_empty_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id
           |  ALL ROWS PER MATCH $mode
           |  PATTERN (a b)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
           |)""".stripMargin))
      .select($"event_id", $"classifier")
      .as[(Long, String)].collect().toSet
    assert(run("OMIT EMPTY MATCHES") == run(""))
    assert(run("") == Set((1L, "a"), (2L, "b")))
    val e = intercept[IllegalArgumentException](run("SHOW EMPTY MATCHES"))
    assert(e.getMessage.contains("OMIT EMPTY"))
  }

  test("CLASSIFIER() in MEASURES: per-row in ALL ROWS mode, the " +
      "last-bound variable in ONE ROW mode") {
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "A"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_cls_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // ONE ROW: the match's last row binds b — CLASSIFIER() = 'b'
    val one = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cls_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, CLASSIFIER() AS cls
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"a_id", $"cls").as[(Long, String)].collect().toSet
    assert(one == Set((1L, "b")))
    // ALL ROWS: per-row variable, same value as the classifier column
    val all = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_cls_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES CLASSIFIER() AS cls
          |  ALL ROWS PER MATCH
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"event_id", $"cls", $"classifier")
      .as[(Long, String, String)].collect().toSet
    assert(all == Set((1L, "a", "a"), (2L, "b", "b")))
  }

  test("aggregates over expressions in MEASURES: SUM(v.col * 2), " +
      "COUNT(v.col), RUNNING forms; two-variable arguments rejected") {
    Seq((1L, 10L, 1L, "A", 1L), (2L, 20L, 1L, "X", 99L),
      (3L, 30L, 1L, "A", 2L), (4L, 40L, 1L, "B", 3L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_exagg_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val one = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_exagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES SUM(a.v * 2) AS s2, COUNT(a.v) AS nc,
          |           MAX(a.v - 1) AS mx, AVG(2 * a.v) AS av
          |  PATTERN (a{2,2} b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"s2", $"nc", $"mx", $"av")
      .as[(Double, Long, Long, Double)].collect().toSet
    assert(one == Set((6.0, 2L, 1L, 3.0)))
    // RUNNING SUM over an expression: so-far semantics per output row
    val run = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_exagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES RUNNING SUM(a.v * 2) AS rs
          |  ALL ROWS PER MATCH
          |  PATTERN (a{2,2} b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
      .select($"event_id", $"rs")
      .as[(Long, Double)].collect().toSet
    assert(run == Set((1L, 2.0), (3L, 6.0), (4L, 6.0)))
    // one aggregate argument, one variable
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_exagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES SUM(a.v + b.v) AS bad
          |  PATTERN (a{2,2} b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin)
    }
    assert(e.getMessage.contains("ONE"))
    // a variable name that is a SUFFIX of another (b / ab) must not
    // anchor the other's references — each expression aggregate is
    // handled by its owning variable's pass
    val sfx = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_exagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES SUM(ab.v * 2) AS sab, SUM(b.v * 2) AS sb
          |  PATTERN (b{2,2} ab)
          |  DEFINE b AS event_type = 'A', ab AS event_type = 'B'
          |)""".stripMargin))
      .select($"sab", $"sb").as[(Double, Double)].collect().toSet
    assert(sfx == Set((6.0, 6.0)))
    // round-15 lift: expression aggregates also work in DEFINE (the
    // derived-column + running-marker path) — min(a.v * 2) over the
    // two settled a bindings is 2, so b (v=3) completes
    val dagg = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_exagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES b.event_id AS b_id
          |  PATTERN (a{2,2} b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND v > MIN(a.v * 2)
          |)""".stripMargin))
      .select($"b_id").as[Long].collect().toSet
    assert(dagg == Set(4L))
  }

  test("nested var-qualified navigation in DEFINE: PREV(FIRST|LAST(" +
      "a.col)[, j], k) anchors at the selected binding; streaming " +
      "agrees") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    Seq((1L, 10L, 1L, 10.0), (2L, 20L, 1L, 8.0), (3L, 30L, 1L, 6.0),
      (4L, 40L, 1L, 9.0), (5L, 50L, 1L, 12.0))
      .toDF("event_id", "ts_us", "ticker", "price")
      .createOrReplaceTempView("mr_nnav_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(cond: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_nnav_view MATCH_RECOGNIZE (
           |  PARTITION BY ticker
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.event_id) AS a_id, b.event_id AS b_id
           |  PATTERN (a{2,2} b)
           |  DEFINE a AS true, b AS $cond
           |)""".stripMargin))
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // LAST anchor (≡ the simple form): lag off a's SECOND binding —
    // seed a=[1,2] anchors price@1 = 10, so b = row 3 (6 < 10)
    assert(run("price < PREV(LAST(a.price))") == Set((1L, 3L)))
    assert(run("price < PREV(a.price)") == Set((1L, 3L)))
    // FIRST anchor: lag off a's FIRST binding — seed a=[2,3] anchors
    // price@1 = 10, so b = row 4 (9 < 10); seed [1,2] has a NULL lag
    assert(run("price < PREV(FIRST(a.price))") == Set((2L, 4L)))
    // inner offset: LAST(a.price, 1) is the binding before the last —
    // the first of two, so the spelling agrees with the FIRST anchor
    assert(run("price < PREV(LAST(a.price, 1))") == Set((2L, 4L)))
    // outer offset: two rows before a's first binding — seed a=[3,4]
    // anchors price@1 = 10 and row 5 (12 > 10) completes
    assert(run("price > PREV(FIRST(a.price), 2)") == Set((3L, 5L)))
    // streaming parity for the FIRST anchor
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    input.toDF().toDF("event_id", "ts_ms", "ticker", "price")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_nnav_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_nnav_stream MATCH_RECOGNIZE (
          |  PARTITION BY ticker
          |  ORDER BY ts_ms, event_id
          |  MEASURES FIRST(a.event_id) AS a_id, b.event_id AS b_id
          |  PATTERN (a{2,2} b)
          |  WITHIN 60000
          |  EVENTTIME etc
          |  DEFINE a AS true, b AS price < PREV(FIRST(a.price))
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_nnav_sink").start()
    try {
      input.addData((1L, 1000L, 1L, 10.0), (2L, 2000L, 1L, 8.0))
      q.processAllAvailable()
      input.addData((3L, 3000L, 1L, 6.0), (4L, 4000L, 1L, 9.0),
        (5L, 5000L, 1L, 12.0))
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, 0.0))
      q.processAllAvailable()
      val got = spark.table("mr_nnav_sink")
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(got == Set((2L, 4L)))
    } finally q.stop()
  }

  test("aggregates over SUBSET-union expression arguments in DEFINE: " +
      "SUM(s.v * s.w) expands per member over one derived column; " +
      "streaming agrees") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    Seq((1L, 10L, 1L, "A", 2L, 3L), (2L, 20L, 1L, "A", 1L, 4L),
      (3L, 30L, 1L, "B", 5L, 2L), (4L, 40L, 1L, "C", 0L, 0L),
      (5L, 10L, 2L, "A", 1L, 1L), (6L, 20L, 2L, "A", 1L, 1L),
      (7L, 30L, 2L, "B", 1L, 1L), (8L, 40L, 2L, "C", 0L, 0L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v", "w")
      .createOrReplaceTempView("mr_sxagg_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // user 1: sum over s = a[6, 4] + b[10] = 20 → c completes;
    // user 2: 1 + 1 + 1 = 3 → no match. The condition CHANGES the
    // match set (both users match with the guard dropped).
    def run(cond: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_sxagg_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.event_id) AS a_id, c.event_id AS c_id
           |  PATTERN (a{2,2} b c)
           |  SUBSET s = (a, b)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
           |         c AS event_type = 'C' AND $cond
           |)""".stripMargin))
        .select($"user_id", $"a_id", $"c_id")
        .as[(Long, Long, Long)].collect().toSet
    assert(run("true") == Set((1L, 1L, 4L), (2L, 5L, 8L)))
    assert(run("SUM(s.v * s.w) >= 20") == Set((1L, 1L, 4L)))
    // own-member folding: b is IN s, so its running predicate folds
    // the current row's v*w (10) into a's settled 10 — user 1 passes
    val own = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_sxagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES FIRST(a.event_id) AS a_id, b.event_id AS b_id
          |  PATTERN (a{2,2} b)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND SUM(s.v * s.w) >= 20
          |)""".stripMargin))
      .select($"user_id", $"a_id", $"b_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(own == Set((1L, 1L, 3L)))
    // AVG/COUNT/MIN/MAX compose through the same expansion
    val more = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_sxagg_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a{2,2} b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C'
          |           AND COUNT(s.v + s.w) = 3
          |           AND MAX(s.v * s.w) = 10 AND MIN(s.w - s.v) = -3
          |           AND AVG(s.v * s.w) > 6.5
          |)""".stripMargin))
      .select($"user_id", $"c_id").as[(Long, Long)].collect().toSet
    assert(more == Set((1L, 4L)))
    // streaming parity for the settled-members guard
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Long, Long)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type",
        "v", "w")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_sxagg_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_sxagg_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES FIRST(a.event_id) AS a_id, c.event_id AS c_id
          |  PATTERN (a{2,2} b c)
          |  SUBSET s = (a, b)
          |  WITHIN 60000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C' AND SUM(s.v * s.w) >= 20
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_sxagg_sink").start()
    try {
      input.addData((1L, 1000L, 1L, "A", 2L, 3L),
        (2L, 2000L, 1L, "A", 1L, 4L))
      q.processAllAvailable()
      input.addData((3L, 3000L, 1L, "B", 5L, 2L),
        (4L, 4000L, 1L, "C", 0L, 0L),
        (5L, 1000L, 2L, "A", 1L, 1L), (6L, 2000L, 2L, "A", 1L, 1L),
        (7L, 3000L, 2L, "B", 1L, 1L), (8L, 4000L, 2L, "C", 0L, 0L))
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "Z", 0L, 0L))
      q.processAllAvailable()
      val got = spark.table("mr_sxagg_sink")
        .select($"user_id", $"a_id", $"c_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 4L)))
    } finally q.stop()
  }

  test("MODE STRICT: ISO contiguous matching — intervening rows fail " +
      "the attempt; relaxed default skips them; streaming agrees") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "X"), (3L, 30L, 1L, "B"),
      (4L, 10L, 2L, "A"), (5L, 20L, 2L, "B"),
      (6L, 10L, 3L, "A"), (7L, 20L, 3L, "A"), (8L, 30L, 3L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_strict_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(pat: String, mode: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_strict_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.event_id) AS a_id, b.event_id AS b_id
           |  PATTERN ($pat)
           |  $mode
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
           |)""".stripMargin))
        .select($"user_id", $"a_id", $"b_id")
        .as[(Long, Long, Long)].collect().toSet
    // relaxed: user 1's X is skipped; strict: the attempt fails on it
    assert(run("a b", "") ==
      Set((1L, 1L, 3L), (2L, 4L, 5L), (3L, 6L, 8L), (3L, 7L, 8L)))
    assert(run("a b", "MODE STRICT") ==
      Set((2L, 4L, 5L), (3L, 7L, 8L)))
    assert(run("a b", "MODE RELAXED") == run("a b", ""))
    // strict quantifier: both A rows must be adjacent, then B
    assert(run("a{2,2} b", "MODE STRICT") == Set((3L, 6L, 8L)))
    // composite elements compose under STRICT too (the one NFA-level
    // flag covers every pattern shape): the alternation must bind the
    // IMMEDIATELY next row — user 3's first A dies on the adjacent A
    val alt = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_strict_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, LAST(b.event_id) AS b_id,
          |           LAST(c.event_id) AS c_id
          |  PATTERN (a (b|c))
          |  MODE STRICT
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'X'
          |)""".stripMargin))
      .select($"user_id", $"a_id", $"b_id", $"c_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(alt == Set(
      (1L, 1L, None, Some(2L)),    // the X right after A binds c
      (2L, 4L, Some(5L), None),
      (3L, 7L, Some(8L), None)))   // A@6 died on the adjacent A@7
    // streaming parity for the strict two-step
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_strict_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_strict_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES FIRST(a.event_id) AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  WITHIN 10000
          |  EVENTTIME etc
          |  MODE STRICT
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_strict_sink").start()
    try {
      input.addData((1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "X"))
      q.processAllAvailable()
      input.addData((3L, 3000L, 1L, "B"), (4L, 1000L, 2L, "A"),
        (5L, 2000L, 2L, "B"), (9L, 60000L, 9L, "Z"))
      q.processAllAvailable()
      input.addData((10L, 120000L, 9L, "Z"))
      q.processAllAvailable()
      val got = spark.table("mr_strict_sink")
        .select($"user_id", $"a_id", $"b_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((2L, 4L, 5L)))   // user 1's X breaks the run
    } finally q.stop()
  }

  test("seeded statement fuzz: ONE ROW and ALL ROWS describe the " +
      "same match spans, across random patterns, quantifier forms, " +
      "anchors, skip modes, and MODE STRICT") {
    // one invariant that must hold for ANY statement: both row modes
    // describe the SAME matches, so the set of (user_id, match_start,
    // match_end) spans must be identical between them (counts can
    // differ legitimately: overlap mode emits same-span ALTERNATIVES
    // as separate ONE ROW rows — see DIALECT.md). Statements draw
    // from the dialect surface: brace forms, alternations, reluctant
    // quantifiers, strict mode.
    // fixed in-suite seed; soaks diversify via env (the per-feature
    // counter floor is only asserted on the default seed — an
    // arbitrary seed can legitimately starve a gated draw)
    val fuzzSeed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
    val rnd = new scala.util.Random(fuzzSeed.getOrElse(20260815L))
    val types = Vector("A", "B", "X")
    val rows = (1L to 60L).map { i =>
      (i, i * 10L, 1L + (i % 3), types(rnd.nextInt(3)),
        rnd.nextInt(20).toDouble)
    }
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_fuzz_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val quants = Vector("", "+", "?", "{1,2}", "{2}", "{1,}", "{,2}",
      "+?", "{1,3}?")
    def q(allowZero: Boolean): String = {
      val s = quants(rnd.nextInt(quants.length))
      if (!allowZero && (s == "?" || s == "{,2}")) "" else s
    }
    var checked = 0
    var subsetSkips = 0
    var exprAggs = 0
    var varNavs = 0
    var nestedNavs = 0
    var navExprs = 0
    var subsetOffsets = 0
    var subsetExprAggs = 0
    var subsetNavs = 0
    var nestedNavExprs = 0
    // in-suite default 25; GRAFT_SOAK=1 raises to the off-suite 120
    val nTrials = Soak.knob("GRAFT_FUZZ_TRIALS", 25, 120)
    for (trial <- 1 to nTrials) {
      val nVars = 1 + rnd.nextInt(3)
      val vars = (0 until nVars).map(i => s"v$i")
      val itemPairs = vars.zipWithIndex.flatMap { case (v, i) =>
        if (i > 0 && rnd.nextBoolean() && i + 1 < nVars) None // skip
        else Some((v, q(allowZero = i > 0)))
      }
      val items = itemPairs.map { case (v, s) => v + s }
      val usedAlt = items.length >= 2 && rnd.nextBoolean()
      val pat =
        if (usedAlt)
          s"${items.head} (${items(1)}${
            if (items.length > 2) " | " + items(2) else ""})" +
            (if (items.length > 2) "" else "")
        else items.mkString(" ")
      val usedVars = vars.filter(v => pat.contains(v))
      if (usedVars.nonEmpty) {
        // SKIP TO LAST over a SUBSET union (round-15 draw) needs two
        // always-bound (non-zero-min, non-alternation) variables, so
        // the resume row can never be the match's first row (the
        // standard's infinite-loop runtime error) or unbound
        val boundVars =
          if (usedAlt) itemPairs.take(1).map(_._1)
          else itemPairs.collect {
            case (v, s) if s != "?" && s != "{,2}" => v }
        // a subset for the DEFINE-side draws (offsets / expression
        // aggregates over the union) — declared whenever two variables
        // exist; unbound members coalesce inside the draws
        val defSubset =
          if (usedVars.length >= 2) Some("sfz") else None
        // DEFINE-conjunct draws across the dialect surface — the span
        // invariant must survive each like any predicate: expression
        // aggregates (round 15), var-qualified / nested / expression
        // PREV-NEXT navigation and SUBSET offset / expression
        // aggregates (rounds 15-16)
        val defs = usedVars.map { v =>
          val base = s"$v AS event_type = '${types(rnd.nextInt(3))}'"
          def anchor = usedVars(rnd.nextInt(usedVars.length))
          def kind = if (rnd.nextBoolean()) "PREV" else "NEXT"
          rnd.nextInt(8) match {
            case 0 =>
              exprAggs += 1
              s"$base AND SUM($v.value * 2) < ${20 + rnd.nextInt(60)}"
            case 1 =>
              varNavs += 1
              s"$base AND coalesce($kind($anchor.value), 0) < " +
                s"${5 + rnd.nextInt(20)}"
            case 2 =>
              nestedNavs += 1
              val sel = if (rnd.nextBoolean()) "FIRST" else "LAST"
              s"$base AND coalesce($kind($sel($anchor.value), " +
                s"${1 + rnd.nextInt(2)}), 0) < ${5 + rnd.nextInt(20)}"
            case 3 =>
              navExprs += 1
              s"$base AND coalesce($kind($anchor.value + value), 0) " +
                s"< ${10 + rnd.nextInt(40)}"
            case 4 if defSubset.nonEmpty =>
              subsetOffsets += 1
              val sel = if (rnd.nextBoolean()) "FIRST" else "LAST"
              s"$base AND coalesce($sel(sfz.value, ${rnd.nextInt(3)})" +
                s", 0) < ${5 + rnd.nextInt(20)}"
            case 5 if defSubset.nonEmpty =>
              subsetExprAggs += 1
              s"$base AND SUM(sfz.value * 2) < ${20 + rnd.nextInt(80)}"
            case 6 if defSubset.nonEmpty =>
              subsetNavs += 1
              s"$base AND coalesce($kind(sfz.value), 0) < " +
                s"${5 + rnd.nextInt(20)}"
            case 7 =>
              nestedNavExprs += 1
              val sel = if (rnd.nextBoolean()) "FIRST" else "LAST"
              s"$base AND coalesce($kind($sel($anchor.value + value))" +
                s", 0) < ${10 + rnd.nextInt(40)}"
            case _ => base
          }
        }.mkString(", ")
        val mode = rnd.nextInt(3) match {
          case 0 => "MODE STRICT"
          case 1 => "MODE RELAXED"
          case _ => ""
        }
        val within =
          if (rnd.nextBoolean()) s"WITHIN ${100 + rnd.nextInt(400)}"
          else ""
        // deterministic rotation over the skip modes (a pure random
        // draw can starve the two-bound-vars-gated subset case on an
        // unlucky stream); everything else in the statement stays
        // randomly drawn
        val (skipClause, skipSubsetDecl) = trial % 5 match {
          case 0 => ("AFTER MATCH SKIP PAST LAST ROW", None)
          case 1 => ("AFTER MATCH SKIP TO NEXT ROW", None)
          case 2 | 3 if boundVars.length >= 2 =>
            subsetSkips += 1
            ("AFTER MATCH SKIP TO LAST wfz",
              Some(s"wfz = (${boundVars.take(2).mkString(", ")})"))
          case _ => ("", None)
        }
        val subsetDecls =
          defSubset.map(n => s"$n = (${usedVars.take(2).mkString(", ")})")
            .toList ++ skipSubsetDecl.toList
        val subsetClause =
          if (subsetDecls.isEmpty) ""
          else "SUBSET " + subsetDecls.mkString(", ")
        val anchored = if (rnd.nextInt(5) == 0) s"^ $pat" else pat
        // span fingerprint via measures (ONE ROW output has no
        // match_start/match_end columns): the head variable binds the
        // match's first row; the last bound row is the max LAST ts
        // across variables (unbound optionals coalesce to the losing
        // -1)
        val eTs =
          if (usedVars.length == 1)
            s"coalesce(LAST(${usedVars.head}.ts_us), -1)"
          else usedVars.map(v => s"coalesce(LAST($v.ts_us), -1)")
            .mkString("greatest(", ", ", ")")
        def stmt(rowMode: String) =
          s"""SELECT * FROM mr_fuzz_view MATCH_RECOGNIZE (
             |  PARTITION BY user_id
             |  ORDER BY ts_us, event_id
             |  MEASURES FIRST(${usedVars.head}.ts_us) AS s_ts,
             |           $eTs AS e_ts
             |  $rowMode
             |  $skipClause
             |  PATTERN ($anchored)
             |  $subsetClause
             |  $within
             |  $mode
             |  DEFINE $defs
             |)""".stripMargin
        try {
          val one = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
            parser.parsePlan(stmt("ONE ROW PER MATCH")))
            .select($"user_id", $"s_ts", $"e_ts")
            .as[(Long, Long, Long)].collect()
          val all = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
            parser.parsePlan(stmt("ALL ROWS PER MATCH")))
            .select($"user_id", $"match_start", $"match_end")
            .as[(Long, Long, Long)].collect()
          assert(one.toSet == all.toSet,
            s"trial $trial: ONE ROW spans ${one.toSet.size} != ALL " +
              s"ROWS spans ${all.toSet.size} for PATTERN ($pat) " +
              s"$mode $within")
          // and every span appears at least as often as its ONE ROW
          // multiplicity claims matches exist
          assert(one.nonEmpty || all.isEmpty)
          checked += 1
        } catch {
          // statements the dialect legitimately rejects (zero-width
          // first element etc.) must fail with ITS error type, not
          // a misparse deeper in Spark
          case _: IllegalArgumentException => ()
        }
      }
    }
    assert(checked >= nTrials * 2 / 5,
      s"only $checked of $nTrials fuzz statements ran")
    val draws = Map("exprAgg" -> exprAggs, "subsetSkip" -> subsetSkips,
      "varNav" -> varNavs, "nestedNav" -> nestedNavs,
      "navExpr" -> navExprs, "subsetOffset" -> subsetOffsets,
      "subsetExprAgg" -> subsetExprAggs, "subsetNav" -> subsetNavs,
      "nestedNavExpr" -> nestedNavExprs)
    if (fuzzSeed.isEmpty)
      assert(draws.values.forall(_ >= 1), s"fixture weak: $draws")
    else println(s"[fuzz] seed=${fuzzSeed.get} draws=$draws")
  }

  test("seeded PERMUTE residual-tie fuzz: same-span equal-slot-count " +
      "alternatives keep a stable row set across runs, with per-user " +
      "1..n numbering and contiguous numbers inside each tie group") {
    // DIALECT.md documents the MATCH_NUMBER residual tie (equal span
    // AND equal per-slot counts — exactly what two PERMUTE orderings
    // over the same rows produce) as unspecified RELATIVE order. This
    // fuzz pins what IS specified: the match row set (numbers
    // dropped) is identical across runs, numbers are a 1..n
    // permutation per user, and tied alternatives occupy CONSECUTIVE
    // numbers (they are adjacent in the (start, end, counts) sort).
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val rnd = new scala.util.Random(424215L)
    var tieGroupsSeen = 0
    for (trial <- 1 to 6) {
      // every row satisfies BOTH x and y, so each composite-PERMUTE
      // attempt (the {1,1} forces the k!-alternation expansion, the
      // path where both orderings are distinct automaton branches)
      // completes with both orderings — guaranteed residual ties;
      // duplicated timestamps stress the tie-break path too
      val rows = (1L to 14L).map { i =>
        (i, (i - (i % 2)) * 10L + trial, 1L + (i % 2),
          if (rnd.nextBoolean()) "A" else "B")
      }
      rows.toDF("event_id", "ts_us", "user_id", "event_type")
        .createOrReplaceTempView(s"mr_permtie_$trial")
      def run() = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(
          s"""SELECT * FROM mr_permtie_$trial MATCH_RECOGNIZE (
             |  PARTITION BY user_id
             |  ORDER BY ts_us, event_id
             |  MEASURES MATCH_NUMBER() AS mn, x.event_id AS x_id,
             |           y.event_id AS y_id, FIRST(x.ts_us) AS x_ts,
             |           FIRST(y.ts_us) AS y_ts
             |  PATTERN (PERMUTE(x{1,1}, y))
             |  WITHIN 200
             |  DEFINE x AS event_type IN ('A', 'B'),
             |         y AS event_type IN ('A', 'B')
             |)""".stripMargin))
        .select($"user_id", $"mn", $"x_id", $"y_id", $"x_ts", $"y_ts")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val a = run()
      val b = run()
      def noMn(r: (Long, Long, Long, Long, Long, Long)) =
        (r._1, r._3, r._4, r._5, r._6)
      // (1) row set stable across runs, numbers dropped
      assert(a.map(noMn).toSet == b.map(noMn).toSet,
        s"trial $trial: match row set drifted between runs")
      assert(a.length == b.length)
      for (res <- Seq(a, b)) {
        res.groupBy(_._1).foreach { case (u, ms) =>
          // (2) numbering is a 1..n permutation per user
          assert(ms.map(_._2).sorted.toSeq == (1L to ms.length).toSeq,
            s"trial $trial user $u: numbering not 1..n")
          // (3) same-span tie groups get consecutive numbers; the two
          // orderings bind the same row PAIR (span identity = the
          // unordered id pair)
          ms.groupBy(m => Set(m._3, m._4)).foreach { case (_, g) =>
            if (g.length > 1) {
              tieGroupsSeen += 1
              val mns = g.map(_._2).sorted
              assert(mns.last - mns.head == mns.length - 1,
                s"trial $trial user $u: tie group numbers $mns not " +
                  "contiguous")
            }
          }
        }
      }
    }
    assert(tieGroupsSeen >= 6,
      s"fixture weak: only $tieGroupsSeen residual tie groups drawn")
  }

  test("composite PERMUTE bitmask parity: PERMUTE(m1..mk) == the " +
      "recursive ordering expansion under relaxed matching, == the " +
      "flat k! alternation under MODE STRICT, across random member " +
      "shapes and streams") {
    // r17 VERDICT task 1 evidence. The members-seen bitmask automaton
    // (cep.RxPermute) replaced rounds 15-16's RECURSIVE prefix-sharing
    // expansion — its semantic twin (both merge the next-member choice
    // into one state, so a relaxed-mode partial takes any event that
    // extends SOME remaining member: skip-till-NEXT-match has no
    // deferral). The oracle here is therefore that recursive
    // expansion, written out in SQL — identical MULTISETS pin the
    // lift as behavior-preserving. The flat k!-way alternation
    // additionally explores ordering-committed DEFERRAL (a branch
    // whose next member ignores an event another member could take)
    // and legitimately finds a superset under relaxed matching — see
    // DIALECT.md "PERMUTE and ordering commitment"; under MODE STRICT
    // a deferring partial dies on the skipped event, so ALL THREE
    // forms must coincide exactly, and both properties are asserted.
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val fuzzSeed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
    val rnd = new scala.util.Random(fuzzSeed.getOrElse(20260818L))
    val trials = Soak.knob("GRAFT_FUZZ_TRIALS", 14, 56)
    val alphabet = Vector("A", "B", "C", "D")
    // the round-<=16 recursive prefix-sharing expansion, in SQL form
    def recur(rem: Vector[String]): String =
      if (rem.length == 1) rem.head
      else rem.indices.map(i =>
        s"(${rem(i)} ${recur(rem.patch(i, Vector(), 1))})")
        .mkString("(", " | ", ")")
    var compositeDrawn = 0
    var overlapDrawn = 0
    var strictNonEmpty = 0
    var relaxedNonEmpty = 0
    for (trial <- 0 until trials) {
      val k = 2 + rnd.nextInt(3) // 2..4 members (alternation ≤ 24-way)
      var vi = 0
      def newVar(): String = { vi += 1; s"v$vi" }
      // member shapes: plain var / two-var sequence / optional tail /
      // two-var alternation — at least one member composite so the
      // PERMUTE routes to the Rx path (plain sets ride EPermute)
      val members = (0 until k).map { i =>
        rnd.nextInt(4) match {
          case 0 if i > 0 => newVar()
          case 1 => s"(${newVar()} ${newVar()})"
          case 2 => s"(${newVar()} ${newVar()}?)"
          case _ => s"(${newVar()} | ${newVar()})"
        }
      }.toVector
      if (members.exists(_.startsWith("("))) compositeDrawn += 1
      val vars = (1 to vi).map(i => s"v$i")
      // overlapping predicates (several vars share a type) stress
      // ordering ambiguity — exactly where the automata could diverge
      val types = vars.map(_ => alphabet(rnd.nextInt(alphabet.length)))
      if (types.distinct.length < types.length) overlapDrawn += 1
      val typeOf = vars.zip(types).toMap
      val defines = vars.zip(types).map { case (v, t) =>
        s"$v AS event_type = '$t'" }.mkString(",\n  ")
      val measures = vars.map(v => s"COUNT($v.*) AS n_$v")
        .mkString(", ")
      // random stream, with a planted contiguous full permutation in
      // half the trials so MODE STRICT draws are not vacuous
      val planted: Seq[String] =
        if (rnd.nextBoolean()) Vector.empty
        else rnd.shuffle(members).flatMap { m =>
          """v\d+""".r.findAllIn(m).toSeq
            .filterNot(v => m.contains(s"$v?") && rnd.nextBoolean())
            .map(typeOf)
        }
      val noise = (1 to 12).map(_ => alphabet(rnd.nextInt(4)))
      val stream = rnd.shuffle((noise ++ Seq("PLANT")).toVector)
        .flatMap(t => if (t == "PLANT") planted else Seq(t))
      val rows = stream.zipWithIndex.map { case (t, i) =>
        ((i + 1).toLong, (i + 1).toLong * 10L, 1L, t) }
      rows.toDF("event_id", "ts_us", "user_id", "event_type")
        .createOrReplaceTempView("mr_permpar_sql")
      def run(pattern: String, mode: String): Seq[String] =
        org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          parser.parsePlan(
            s"""SELECT * FROM mr_permpar_sql MATCH_RECOGNIZE (
               |  PARTITION BY user_id
               |  ORDER BY ts_us, event_id
               |  MEASURES $measures
               |  PATTERN ($pattern)
               |  WITHIN 400
               |  $mode
               |  DEFINE $defines
               |)""".stripMargin))
          .collect().map(_.toString).sorted.toSeq
      val permuteP = s"PERMUTE(${members.mkString(", ")})"
      val flatP = members.permutations.map(_.mkString(" "))
        .mkString(" | ")
      // relaxed: bitmask == recursive expansion (multisets)
      val bm = run(permuteP, "")
      val rec = run(recur(members), "")
      if (bm.nonEmpty) relaxedNonEmpty += 1
      assert(bm == rec,
        s"trial $trial k=$k members=${members.mkString(", ")} " +
          s"types=${types.mkString(",")} stream=${stream.mkString(",")}" +
          s":\nbitmask(${bm.length})  =${bm.take(8)}\n" +
          s"recursive(${rec.length})=${rec.take(8)}")
      // strict: all three coincide
      val bmS = run(permuteP, "MODE STRICT")
      val recS = run(recur(members), "MODE STRICT")
      val flatS = run(flatP, "MODE STRICT")
      if (bmS.nonEmpty) strictNonEmpty += 1
      assert(bmS == recS && bmS == flatS,
        s"trial $trial STRICT diverged: bm(${bmS.length}) " +
          s"rec(${recS.length}) flat(${flatS.length}) " +
          s"members=${members.mkString(", ")} " +
          s"types=${types.mkString(",")} stream=${stream.mkString(",")}")
    }
    assert(compositeDrawn >= trials / 2 && overlapDrawn >= 2 &&
      relaxedNonEmpty >= trials / 3 && strictNonEmpty >= 2,
      s"fuzz starved: composite=$compositeDrawn overlap=$overlapDrawn " +
        s"relaxedNonEmpty=$relaxedNonEmpty strictNonEmpty=$strictNonEmpty")
  }

  test("6-member composite PERMUTE (beyond the old 5 cap) == the " +
      "720-way ordering alternation") {
    // the lift itself: 6 composite members compile (old cap: k! = 720
    // branches rejected) and match BOTH expansion forms — on this
    // fixture (one clean permutation per user) the recursive and flat
    // expansions coincide, so all three are asserted equal
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def recur(rem: Vector[String]): String =
      if (rem.length == 1) rem.head
      else rem.indices.map(i =>
        s"(${rem(i)} ${recur(rem.patch(i, Vector(), 1))})")
        .mkString("(", " | ", ")")
    val members = Vector("(a1 a2)", "b", "(c1 c2?)", "(d1 | d2)", "e",
      "(f1 f2)")
    val vars = Seq("a1", "a2", "b", "c1", "c2", "d1", "d2", "e",
      "f1", "f2")
    val typeOf = Map("a1" -> "A", "a2" -> "B", "b" -> "B", "c1" -> "C",
      "c2" -> "A", "d1" -> "D", "d2" -> "B", "e" -> "E", "f1" -> "F",
      "f2" -> "A")
    val defines = vars.map(v =>
      s"$v AS event_type = '${typeOf(v)}'").mkString(",\n  ")
    val measures = vars.map(v => s"COUNT($v.*) AS n_$v").mkString(", ")
    // one clean full permutation per user, scrambled differently, plus
    // noise rows that extend no member
    val u1 = Seq("A", "B", "B", "C", "A", "D", "E", "F", "A")
    val u2 = Seq("E", "F", "A", "D", "C", "A", "A", "B", "B")
    val rows = (u1.map(("u", _)) ++ u2.map(("w", _))).zipWithIndex.map {
      case ((u, t), i) => (i.toLong, i.toLong * 10L,
        if (u == "u") 1L else 2L, t)
    }
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_perm6_sql")
    def run(pattern: String): Seq[String] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(
          s"""SELECT * FROM mr_perm6_sql MATCH_RECOGNIZE (
             |  PARTITION BY user_id
             |  ORDER BY ts_us, event_id
             |  MEASURES $measures
             |  PATTERN ($pattern)
             |  DEFINE $defines
             |)""".stripMargin))
        .collect().map(_.toString).sorted.toSeq
    val bitmask = run(s"PERMUTE(${members.mkString(", ")})")
    val expansion = run(members.permutations
      .map(_.mkString(" ")).mkString(" | "))
    val recursive = run(recur(members))
    assert(bitmask.nonEmpty, "6-member PERMUTE found no matches")
    assert(bitmask == expansion,
      s"bitmask(${bitmask.length}) != flat(${expansion.length})")
    assert(bitmask == recursive,
      s"bitmask(${bitmask.length}) != recursive(${recursive.length})")
  }

  test("maskSql tracks backslash-escaped quotes: the factor scan never " +
      "fires inside a literal, and a real factor beside one still " +
      "rewrites") {
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def one(sql: String): org.apache.spark.sql.Row =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(sql)).collect().head
    // without the escape-aware mask, the scan desynchronizes at \' and
    // the (unmasked) trailing text fires the factor rewrite
    assert(one("SELECT 'don\\'t t match_recognize(x)' AS s")
      .getString(0) == "don't t match_recognize(x)")
    // the same literal + a REAL factor in one statement: the literal
    // stays masked, the factor still rewrites
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_esc_view")
    val r = one(
      """SELECT 'don\'t match_recognize(y)' AS s, m.a_id
        |FROM mr_esc_view MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_us, event_id
        |  MEASURES a.event_id AS a_id
        |  PATTERN (a b)
        |  DEFINE a AS event_type = 'A', b AS event_type = 'B'
        |) AS m""".stripMargin)
    assert(r.getString(0) == "don't match_recognize(y)" && r.getLong(1) == 1L)
    // maskLiterals (the body clause scan) follows the same lexing: an
    // escaped quote inside a DEFINE literal must not swallow the rest
    // of the body
    val esc = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_esc_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id
          |  PATTERN (a b)
          |  DEFINE a AS event_type = 'A' AND event_type != 'don\'t',
          |         b AS event_type = 'B'
          |)""".stripMargin))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(esc == Set((1L, 2L)))
  }

  test("legacy escapedStringLiterals=true: scanners keep tracking the " +
      "lexer — quote PAIRING is conf-independent in Spark") {
    // Spark's lexer consumes \<char> as an escape pair when pairing
    // quotes under BOTH settings of the legacy conf (the conf changes
    // only value unescaping: the backslash stays in the string). A
    // conf-dependent mask (round 14's) desynchronized here and fired
    // the factor rewrite INSIDE the literal.
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_legacy_esc_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try {
      // factor path: the quoted match_recognize( must NOT fire, and the
      // legacy VALUE keeps the raw backslash
      val s = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(
          """SELECT 'don\'t x match_recognize(y)' AS s"""))
        .collect().head.getString(0)
      assert(s == """don\'t x match_recognize(y)""")
      // body-clause path: the escaped quote inside a DEFINE literal must
      // not swallow the comma split; the predicate compares against the
      // legacy raw value
      val r = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(
          """SELECT * FROM mr_legacy_esc_view MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts_us, event_id
            |  MEASURES a.event_id AS a_id, b.event_id AS b_id
            |  PATTERN (a b)
            |  DEFINE a AS event_type = 'A' AND event_type != 'don\'t',
            |         b AS event_type = 'B'
            |)""".stripMargin))
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(r == Set((1L, 2L)))
    } finally
      spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
  }

  test("reluctant quantifiers under MODE STRICT keep the true max: " +
      "contiguity can force growth, election still prefers fewer") {
    // user 1 needs b+? to grow to TWO rows for contiguity — under the
    // old bind-exactly-min compile (max forced to 1) the strict
    // attempt died at the second B and user 1 had NO match. Relaxed
    // keeps the capped lazy form: b binds once, the second B is
    // skipped (growth is never forced when gaps are allowed).
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "B"),
      (4L, 40L, 1L, "C"),
      (5L, 10L, 2L, "A"), (6L, 20L, 2L, "B"), (7L, 30L, 2L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_rel_strict_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(mode: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_rel_strict_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.event_id) AS a_id,
           |           count(b.event_id) AS n_b,
           |           c.event_id AS c_id
           |  AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN (a b+? c)
           |  $mode
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
           |         c AS event_type = 'C'
           |)""".stripMargin))
        .select($"user_id", $"a_id", $"n_b", $"c_id")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run("MODE STRICT") ==
      Set((1L, 1L, 2L, 4L), (2L, 5L, 1L, 7L)))
    assert(run("") == Set((1L, 1L, 1L, 4L), (2L, 5L, 1L, 7L)))
    // leftmost-start still outranks reluctance (ISO preferment order):
    // over b,b,c both (b@10 b@20 c) and (b@20 c) complete on c — the
    // earlier START wins even though it binds MORE reluctant rows.
    // (The old bind-exactly-min compile killed the start-10 attempt
    // outright and could only ever emit the later start.)
    Seq((1L, 10L, 1L, "B"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_rel_strict2_view")
    val short = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_rel_strict2_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES count(b.event_id) AS n_b, c.event_id AS c_id
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (b+? c)
          |  MODE STRICT
          |  DEFINE b AS event_type = 'B', c AS event_type = 'C'
          |)""".stripMargin))
      .select($"n_b", $"c_id").as[(Long, Long)].collect().toSet
    assert(short == Set((2L, 3L)))
  }

  test("FIRST/LAST offsets over a SUBSET union in DEFINE select the " +
      "k-th element of the members' merged (ts, tie) order") {
    // merged order of s = (a, b) over a{2,2} b{2,2}: a1(v=10) a2(v=20)
    // b1(v=30) b2(v=40). FIRST(s.v, 2) = 30 (the first b), LAST(s.v,
    // 1) = 30 (second from the end); out-of-range offsets are NULL.
    Seq((1L, 10L, 1L, "A", 10L), (2L, 20L, 1L, "A", 20L),
      (3L, 30L, 1L, "B", 30L), (4L, 40L, 1L, "B", 40L),
      (5L, 50L, 1L, "C", 30L), (6L, 60L, 1L, "C", 99L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_suboff_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    // c gates on BOTH the merged 3rd element (FIRST offset 2 = 30)
    // and the merged second-from-last (LAST offset 1 = 30): only the
    // v=30 C row completes
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_suboff_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a{2,2} b{2,2} c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C' AND v = FIRST(s.v, 2)
          |           AND v = LAST(s.v, 1)
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(got == Set(5L))
    // out-of-range union offset is NULL (the comparison never holds)
    val oob = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_suboff_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a{2,2} b{2,2} c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C' AND v = FIRST(s.v, 7)
          |)""".stripMargin))
      .count()
    assert(oob == 0L)
    // deep offsets (cap raised to 19 in round 16): 10 A's then 10 B's
    // merge as a1..a10 b1..b10, so FIRST(s.v, 19) is the 20th value
    // (20), FIRST(s.v, 12) the 13th (13), LAST(s.v, 19) the 1st (1)
    val deepRows =
      (1L to 10L).map(i => (i, i * 10L, 1L, "A", i)) ++
        (11L to 20L).map(i => (i, i * 10L, 1L, "B", i)) ++
        Seq((21L, 210L, 1L, "C", 99L))
    deepRows.toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_suboff_deep")
    val deep = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_suboff_deep MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES c.event_id AS c_id
          |  PATTERN (a{10,10} b{10,10} c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C' AND FIRST(s.v, 19) = 20
          |           AND FIRST(s.v, 12) = 13 AND LAST(s.v, 19) = 1
          |)""".stripMargin))
      .select($"c_id").as[Long].collect().toSet
    assert(deep == Set(21L))
  }

  test("navigation from a SUBSET union in DEFINE: PREV(s.col) anchors " +
      "at the merged-LAST bound row, nested FIRST/offset forms at the " +
      "selected merged element; streaming agrees") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // a@1 b@2, an X row between b and c: the lag anchors at the BOUND
    // rows (lag@2 = 5, lag@1 = NULL), never at c's own row
    Seq((1L, 10L, 1L, "A", 5L), (2L, 20L, 1L, "B", 7L),
      (3L, 30L, 1L, "X", 100L), (4L, 40L, 1L, "C", 9L),
      (5L, 10L, 2L, "A", 50L), (6L, 20L, 2L, "B", 7L),
      (7L, 30L, 2L, "C", 9L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "v")
      .createOrReplaceTempView("mr_subnav_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(cond: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_subnav_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, c.event_id AS c_id
           |  PATTERN (a b c)
           |  SUBSET s = (a, b)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
           |         c AS event_type = 'C' AND $cond
           |)""".stripMargin))
        .select($"user_id", $"a_id", $"c_id")
        .as[(Long, Long, Long)].collect().toSet
    // merged-LAST of s = b's row: lag@b is a's v (5 and 50) — user 1
    // passes (9 > 5), user 2 does not (9 > 50 fails)
    assert(run("v > PREV(s.v)") == Set((1L, 1L, 4L)))
    // lag 2 at b's row is NULL (b is each user's second row)
    assert(run("v > PREV(s.v, 2)") == Set.empty)
    // nested FIRST: the merged-first bound row is a's — lag@a is NULL
    assert(run("PREV(FIRST(s.v)) IS NULL") ==
      Set((1L, 1L, 4L), (2L, 5L, 7L)))
    // inner offset: merged element 1 (0-based) is b's row — same
    // anchor as the flat merged-LAST spelling
    assert(run("v > PREV(FIRST(s.v, 1), 1)") == Set((1L, 1L, 4L)))
    // streaming parity for the flat merged-LAST anchor
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Long)]
    input.toDF().toDF("event_id", "ts_ms", "user_id", "event_type", "v")
      .withColumn("etc", timestamp_millis($"ts_ms"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_subnav_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_subnav_stream MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_ms, event_id
          |  MEASURES a.event_id AS a_id, c.event_id AS c_id
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  WITHIN 60000
          |  EVENTTIME etc
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C' AND v > PREV(s.v)
          |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_subnav_sink").start()
    try {
      input.addData((1L, 1000L, 1L, "A", 5L), (2L, 2000L, 1L, "B", 7L))
      q.processAllAvailable()
      input.addData((3L, 3000L, 1L, "X", 100L), (4L, 4000L, 1L, "C", 9L),
        (5L, 1000L, 2L, "A", 50L), (6L, 2000L, 2L, "B", 7L),
        (7L, 3000L, 2L, "C", 9L))
      q.processAllAvailable()
      input.addData((9L, 300000L, 9L, "Z", 0L))
      q.processAllAvailable()
      val got = spark.table("mr_subnav_sink")
        .select($"user_id", $"a_id", $"c_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 4L)))
    } finally q.stop()
  }

  test("aggregate-over-expression in DEFINE: running fold over the " +
      "variable's own bindings and settled folds over other variables") {
    // t+ grows while the RUNNING sum of x*y (current row folded in)
    // stays under 10: products 4, 5, 3 -> running 4, 9, 12, so t binds
    // exactly the first two T rows; the trailing u settles the greedy
    // growth before the match completes
    Seq((1L, 10L, 1L, "S", 0L, 0L), (2L, 20L, 1L, "T", 2L, 2L),
      (3L, 30L, 1L, "T", 1L, 5L), (4L, 40L, 1L, "T", 1L, 3L),
      (5L, 50L, 1L, "U", 0L, 0L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "x", "y")
      .createOrReplaceTempView("mr_xagg_own_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val own = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_xagg_own_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES s.event_id AS s_id, COUNT(t.*) AS n_t,
          |           LAST(t.event_id) AS t_last
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (s t+ u)
          |  DEFINE s AS event_type = 'S',
          |         t AS event_type = 'T' AND SUM(t.x * t.y) < 10,
          |         u AS event_type = 'U'
          |)""".stripMargin))
      .select($"s_id", $"n_t", $"t_last")
      .as[(Long, Long, Long)].collect().toSet
    assert(own == Set((1L, 2L, 3L)))
    // settled fold over ANOTHER variable, discriminating binding
    // counts: avg(a.x + a.y) is 3 over a=[1] and 4.5 over a=[1,2], so
    // x=4 completes ONLY the two-binding alternative
    Seq((1L, 10L, 1L, "A", 1L, 2L), (2L, 20L, 1L, "A", 2L, 4L),
      (3L, 30L, 1L, "B", 4L, 0L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "x", "y")
      .createOrReplaceTempView("mr_xagg_other_view")
    val other = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_xagg_other_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(a.*) AS n_a, b.event_id AS b_id
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a+ b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND x < AVG(a.x + a.y)
          |)""".stripMargin))
      .select($"n_a", $"b_id").as[(Long, Long)].collect().toSet
    assert(other == Set((2L, 3L)))
    // mixing two variables in one argument: the targeted error
    val e1 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        """SELECT * FROM mr_xagg_other_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES b.event_id AS b_id
          |  PATTERN (a b c)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS SUM(a.x + b.y) > 0
          |)""".stripMargin)
    }
    assert(e1.getMessage.contains("ONE"))
    // SUBSET-qualified expression argument (round-16 lift): the
    // derived column 2x expands per member with b's own row folded
    // in — 2 + 4 over a=[1,2] plus 8 for b clears the >= 14 gate,
    // the one-binding alternative (2 + 8) does not
    val sub = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_xagg_other_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES COUNT(a.*) AS n_a, b.event_id AS b_id
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a+ b)
          |  SUBSET w = (a, b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B' AND SUM(w.x * 2) >= 14
          |)""".stripMargin))
      .select($"n_a", $"b_id").as[(Long, Long)].collect().toSet
    assert(sub == Set((2L, 3L)))
  }

  test("AFTER MATCH SKIP TO LAST <subset>: the resume row is the " +
      "members' merged-last bound row, whichever member bound it") {
    // pattern (a (b|d) c), SUBSET w = (b, d): match 1 binds the b
    // branch, match 2 the d branch — the resume row must track the
    // BOUND member each time. The A@25 seed lies between match 1's w
    // row (ts 20) and its end (ts 30): SKIP PAST LAST ROW would
    // consume it; SKIP TO LAST w keeps it alive to seed match 2.
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"),
      (4L, 25L, 1L, "A"), (5L, 35L, 1L, "D"), (6L, 40L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_skipsub_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val r = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_skipsub_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           d.event_id AS d_id, c.event_id AS c_id
          |  AFTER MATCH SKIP TO LAST w
          |  PATTERN (a (b | d) c)
          |  SUBSET w = (b, d)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C', d AS event_type = 'D'
          |)""".stripMargin))
      .select($"a_id", $"b_id", $"d_id", $"c_id")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSet
    assert(r == Set(
      (1L, Some(2L), None, 3L),
      (4L, None, Some(5L), 6L)))
  }

  test("SKIP TO FIRST vs LAST <subset> resume at different merged rows " +
      "when several members bind") {
    // pattern (a b d c), w = (b, d): FIRST w = the b row (ts 20),
    // LAST w = the d row (ts 30). The A@25 seed sits between them —
    // alive under FIRST, consumed under LAST.
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "D"),
      (4L, 40L, 1L, "C"), (5L, 25L, 1L, "A"), (6L, 45L, 1L, "A"),
      (7L, 50L, 1L, "B"), (8L, 60L, 1L, "D"), (9L, 70L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_skipsub_fl_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run(mode: String) =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_skipsub_fl_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
           |           d.event_id AS d_id, c.event_id AS c_id
           |  AFTER MATCH SKIP TO $mode w
           |  PATTERN (a b d c)
           |  SUBSET w = (b, d)
           |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
           |         c AS event_type = 'C', d AS event_type = 'D'
           |)""".stripMargin))
        .select($"a_id", $"b_id", $"d_id", $"c_id")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run("FIRST") == Set((1L, 2L, 3L, 4L), (5L, 7L, 8L, 9L)))
    assert(run("LAST") == Set((1L, 2L, 3L, 4L), (6L, 7L, 8L, 9L)))
  }

  test("SKIP TO <subset> whose members bound no rows hits the " +
      "standard's unbound-variable runtime error") {
    Seq((1L, 10L, 1L, "A"), (2L, 30L, 1L, "C"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_skipsub_ub_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val e = intercept[Exception] {
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        """SELECT * FROM mr_skipsub_ub_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, c.event_id AS c_id
          |  AFTER MATCH SKIP TO LAST w
          |  PATTERN (a (b | d){0,1} c)
          |  SUBSET w = (b, d)
          |  DEFINE a AS event_type = 'A', b AS event_type = 'B',
          |         c AS event_type = 'C', d AS event_type = 'D'
          |)""".stripMargin)).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("bound no rows")))
  }

  test("MATCH_NUMBER() numbers same-span every-mode alternatives by " +
      "slot-count tiebreakers, deterministically across runs") {
    // the X row satisfies BOTH a+ (extension, which keeps the
    // original branch live) and b — so the attempt at A@10 emits two
    // SAME-SPAN (10,30) alternatives, a=[10,20] vs a=[10], exactly
    // the every-mode tie the slot-count tiebreaker must order
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "X"), (3L, 30L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_mn_tie_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def run() =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        """SELECT * FROM mr_mn_tie_view MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES MATCH_NUMBER() AS mn, count(a.event_id) AS n_a,
          |           count(b.event_id) AS n_b
          |  PATTERN (a+ b)
          |  DEFINE a AS event_type IN ('A', 'X'),
          |         b AS event_type IN ('X', 'B')
          |)""".stripMargin))
        .select($"mn", $"n_a", $"n_b").as[(Long, Long, Long)]
        .collect().toSet
    val first = run()
    // spans in order: (10,20) → mn 1; the same-span (10,30) pair by
    // size(a) fewer-first: a=1 → mn 2, a=2 → mn 3; (20,30) → mn 4
    assert(first == Set((1L, 1L, 1L), (2L, 1L, 1L), (3L, 2L, 1L),
      (4L, 1L, 1L)))
    (1 to 3).foreach(_ => assert(run() == first))
  }

  test("streaming-state restore guard: wrong-version, undecodable or " +
      "layout-mismatched CepState is rejected with the " +
      "fresh-checkpoint error") {
    import graft.cep.Cep
    val ok = Cep.restored[Evt](0L)(Some(Cep.CepState.empty[Evt]))
    assert(ok.version == Cep.CepState.VERSION)
    assert(Cep.restored[Evt](0L)(None).version == Cep.CepState.VERSION)
    val stale = Cep.CepState.empty[Evt].copy(version = 1)
    val e1 = intercept[IllegalStateException] {
      Cep.restored[Evt](0L)(Some(stale))
    }
    assert(e1.getMessage.contains("checkpointLocation"))
    val e2 = intercept[IllegalStateException] {
      Cep.restored[Evt](0L)(throw new RuntimeException("kryo boom"))
    }
    assert(e2.getMessage.contains("checkpointLocation") &&
      e2.getCause.getMessage == "kryo boom")
    // r18 ADVICE: same schema version, different compiled-automaton
    // layout — the state's ids would be silently reinterpreted, so
    // the restore must fail with the layout-specific error
    val foreign = Cep.CepState.empty[Evt].copy(layoutFp = 0x1234L)
    val e3 = intercept[IllegalStateException] {
      Cep.restored[Evt](0x9999L)(Some(foreign))
    }
    assert(e3.getMessage.contains("automaton layout") &&
      e3.getMessage.contains("checkpointLocation"), e3.getMessage)
  }

  test("PatternDef.layoutFp: stable across instances, blind to " +
      "behavior knobs, sensitive to structure") {
    import graft.cep._
    def stepOf(t: String) = Step[Evt](t.toLowerCase,
      (e: Evt) => e.event_type == t)
    def perm(k: Int) = PatternDef[Evt](IndexedSeq(RxElem(RxPermute(
      (0 until k).map(i => RxSeq(IndexedSeq(
        RxVar(stepOf(('A' + i).toChar.toString)),
        RxVar(stepOf(('A' + i).toChar.toString), 0, 1))))))))
    // deterministic: a fresh structurally-identical pattern (different
    // predicate lambda INSTANCES) fingerprints identically
    assert(perm(3).layoutFp == perm(3).layoutFp)
    assert(perm(3).layoutFp == perm(3).copy(withinMs = Some(99L),
      every = false, skipPastLastRow = true).layoutFp,
      "behavior knobs must not move the layout fingerprint")
    // structure moves it: arity, quantifier bounds, element kind
    assert(perm(3).layoutFp != perm(4).layoutFp)
    val seq = PatternDef[Evt](IndexedSeq(stepOf("A"), stepOf("B")))
    val seqQ = PatternDef[Evt](IndexedSeq(
      stepOf("A").copy(maxCount = 3), stepOf("B")))
    assert(seq.layoutFp != seqQ.layoutFp)
    assert(seq.layoutFp != PatternDef[Evt](
      IndexedSeq(Logical.and(stepOf("A"), stepOf("B")))).layoutFp)
  }

  test("string literals inside navigation/selector/aggregate arguments " +
      "are shielded: dotted, keyword-shaped and escaped-quote content " +
      "never contributes qualifiers or bare columns (round 20)") {
    // r19 VERDICT hygiene item 2: the textual rewrite passes used to
    // chunk-split on quotes, so a call whose ARGUMENT contains a
    // literal was invisible to the mixed/universal distribution and
    // died downstream as 'undefined function prev/last'. The shield
    // pass keeps the text contiguous; literal content (dots, SQL
    // keywords, `first(`-shaped text, escaped quotes) is inert.
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((1L, 10L, 1L, "A", 2.0), (2L, 20L, 1L, "A", 3.0),
      (3L, 30L, 1L, "B", 5.0), (4L, 10L, 2L, "A", 7.0),
      (5L, 20L, 2L, "B", 11.0))
    data.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_lit_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def stmt(table: String, streamingClauses: String): String =
      s"""SELECT * FROM $table MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id,
         |           LAST(CASE WHEN b.event_type = 'x.y'
         |                THEN b.value ELSE a.value END) AS m_dot,
         |           LAST(CASE WHEN b.event_type = 'first('
         |                THEN b.value ELSE a.value END) AS m_kw,
         |           LAST(CASE WHEN b.event_type = 'don\\'t'
         |                THEN b.value ELSE a.value END) AS m_esc,
         |           FIRST(CASE WHEN event_type = 'A'
         |                 THEN value ELSE 0.0 END) AS m_univ,
         |           LAST(a.value BETWEEN -1 AND 99999) AS m_btwn
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (a+ b)
         |  WITHIN 60000
         |  $streamingClauses
         |  DEFINE a AS event_type = 'A',
         |         b AS event_type = 'B' AND
         |           COALESCE(LAST(CASE WHEN a.event_type = 'x.y'
         |             THEN a.value ELSE b.value END) > 0, TRUE) AND
         |           COALESCE(PREV(          FIRST(a.value * 2) )
         |             >= -99999999, TRUE)
         |)""".stripMargin
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"b_id", $"m_dot", $"m_kw", $"m_esc", $"m_univ",
          $"m_btwn")
        .as[(Long, Double, Double, Double, Double, Boolean)]
        .collect().toSet
    val batch = canon(org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_lit_sql", ""))))
    // user 1: a = [e1(2.0), e2(3.0)], b = e3(5.0). The literal
    // comparisons are all false (event_type is 'B'), so each CASE
    // takes its ELSE branch anchored per qualifier: m_dot/m_kw/m_esc =
    // LAST over (... ELSE a.value) = 3.0 with b.value untaken; m_univ
    // = first match row = e1 ('A', 2.0) -> 2.0; m_btwn distributes
    // LAST over the BETWEEN operand (the shared keyword set); the
    // whitespace-stressed kept nested form PREV(          FIRST(...))
    // rides b's DEFINE conjunct (the r19 ADVICE lookbehind hole:
    // 10+ whitespace chars between PREV( and FIRST)
    assert(batch == Set(
      (3L, 3.0, 3.0, 3.0, 2.0, true),
      (5L, 7.0, 7.0, 7.0, 7.0, true)), s"batch: $batch")
    // same statement on the streaming executor
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    input.toDF()
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("etc", timestamp_millis($"ts_us"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_lit_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(stmt("mr_lit_stream", "EVENTTIME etc")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_lit_sink").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((99L, 1000000000L, 9L, "T", 0.0))
      q.processAllAvailable()
      val streamed = canon(spark.table("mr_lit_sink"))
      assert(streamed == batch, s"streaming: $streamed")
    } finally q.stop()
    // a literal whose content is a BOUND variable qualifier must stay
    // inert: 'a.value' inside the argument is text, not a reference
    val inert = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt("mr_lit_sql", "").replace(
          "= 'x.y'", "= 'a.value'")))
      .select($"b_id").as[Long].collect().toSet
    assert(inert == Set(3L, 5L), s"inert-literal: $inert")
  }

  test("literals at the BOUNDARY of navigation arguments survive the " +
      "rewrite: leading, trailing and literal-only forms (r20 ADVICE " +
      "high — String.trim used to strip the shield markers)") {
    // String.trim strips every char <= U+0020 including the U+0007
    // shield markers, so `LAST('P' || ...)` lost its leading marker
    // (PARSE_SYNTAX_ERROR on the corrupted placeholder) and `LAST('x')`
    // lost BOTH markers and silently compiled to the placeholder INDEX
    // — wrong results with no error. wsTrim (shield-safe) fixes all
    // nine group-trim sites; this is the end-to-end regression.
    val data = Seq((1L, 10L, 1L, "A", 2.0), (2L, 20L, 1L, "A", 3.0),
      (3L, 30L, 1L, "B", 5.0), (4L, 10L, 2L, "A", 7.0),
      (5L, 20L, 2L, "B", 11.0))
    data.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_lit_bound")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        """SELECT * FROM mr_lit_bound MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES b.event_id AS b_id,
          |           LAST('P' || a.event_type || b.event_type) AS m_lead,
          |           LAST(a.event_type || '-S') AS m_trail,
          |           LAST('x') AS m_only
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (a+ b)
          |  DEFINE a AS event_type = 'A',
          |         b AS event_type = 'B'
          |)""".stripMargin))
      .select($"b_id", $"m_lead", $"m_trail", $"m_only")
      .as[(Long, String, String, String)].collect().toSet
    assert(out == Set(
      (3L, "PAB", "A-S", "x"),
      (5L, "PAB", "A-S", "x")), s"got: $out")
  }

  test("fail-fast messages from shielded rewrite passes show the " +
      "user's literal text, not placeholder markers") {
    implicit val sqlCtx = spark.sqlContext
    Seq((1L, 10L, 1L, "A", 2.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_literr_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def stmtWith(pred: String): String =
      s"""SELECT * FROM mr_literr_sql MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id
         |  PATTERN (a b)
         |  DEFINE a AS event_type = 'A',
         |         b AS event_type = 'B' AND ($pred)
         |)""".stripMargin
    // unbound qualifier inside a literal-bearing mixed navigation:
    // the rejection must quote the original argument verbatim
    val e1 = intercept[Exception](parser.parsePlan(stmtWith(
      "LAST(CASE WHEN t = 'x.y' THEN a.value ELSE zz.value END) > 0")))
    assert(e1.getMessage.contains("'zz' is not a PATTERN variable") &&
      e1.getMessage.contains("'x.y'") &&
      !e1.getMessage.contains("\u0007"), e1.getMessage)
    // zip-semantics aggregate rejection with a literal in the argument
    val e2 = intercept[Exception](parser.parsePlan(stmtWith(
      "SUM(CASE WHEN t = 'x.y' THEN a.value ELSE b.value END) > 0")))
    assert(e2.getMessage.contains("'x.y'") &&
      !e2.getMessage.contains("\u0007"), e2.getMessage)
  }

  test("EVENTTIME followed by a SQL keyword raises the targeted " +
      "alias-to-non-keyword error; the aliased column works (round 20)") {
    // r19 ADVICE: the whitelist lookahead correctly refuses
    // `EVENTTIME timestamp`, but the text then glommed into the
    // neighboring clause and died with an unrelated error. The
    // targeted diagnosis names the keyword and the workaround.
    implicit val sqlCtx = spark.sqlContext
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    Seq((1L, 10L, 1L, "B")).toDF("event_id", "ts_us", "user_id",
      "event_type").createOrReplaceTempView("mr_evtkw_sql")
    def stmtWith(evt: String): String =
      s"""SELECT * FROM mr_evtkw_sql MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES b.event_id AS b_id
         |  PATTERN (b)
         |  WITHIN 60000
         |  EVENTTIME $evt
         |  DEFINE b AS event_type = 'B'
         |)""".stripMargin
    for (kw <- Seq("timestamp", "current_date", "user")) {
      val e = intercept[Exception](parser.parsePlan(stmtWith(kw)))
      assert(e.getMessage != null &&
        e.getMessage.contains(s"'$kw' is a SQL keyword") &&
        e.getMessage.contains("alias the event-time column"),
        s"EVENTTIME $kw: expected the targeted keyword error, got:\n" +
          e.getMessage)
    }
    // r20 ADVICE (low): a malformed statement MISSING the PATTERN
    // clause whose text happens to contain `eventtime <keyword>
    // define` must surface the real missing-clause error, not the
    // misleading alias diagnosis (patEnd.forall was vacuously true
    // when PATTERN went unfound — now patEnd.exists)
    locally {
      val noPat = intercept[Exception](parser.parsePlan(
        s"""SELECT * FROM mr_evtkw_sql MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES b.event_id AS b_id
           |  EVENTTIME timestamp
           |  DEFINE b AS event_type = 'B'
           |)""".stripMargin))
      assert(noPat.getMessage != null &&
        !noPat.getMessage.contains("alias the event-time column"),
        "missing-PATTERN statement must not surface the alias " +
          s"diagnosis, got:\n${noPat.getMessage}")
    }
    // a column genuinely NAMED `eventtime` used bare in expression
    // text must NOT trip the diagnosis (the three-condition guard:
    // unfound clause + after PATTERN + before DEFINE)
    Seq((1L, 10L, 1L, "B", 5L)).toDF("event_id", "ts_us", "user_id",
      "event_type", "eventtime")
      .createOrReplaceTempView("mr_evtcol_sql")
    val colUse = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        s"""SELECT * FROM mr_evtcol_sql MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES b.event_id AS b_id
           |  PATTERN (b)
           |  DEFINE b AS eventtime IS NOT NULL AND event_type = 'B'
           |)""".stripMargin))
      .select($"b_id").as[Long].collect().toSet
    assert(colUse == Set(1L), s"bare eventtime column: $colUse")
    // the documented workaround: alias the keyword-named column to a
    // non-keyword name before MATCH_RECOGNIZE, then EVENTTIME works
    val input = MemoryStream[(Long, Long, Long, String)]
    input.toDF().toDF("event_id", "timestamp", "user_id", "event_type")
      .withColumn("event_ts", $"timestamp")
      .withColumn("etc", timestamp_millis($"event_ts"))
      .withWatermark("etc", "10 seconds")
      .createOrReplaceTempView("mr_evtkw_stream")
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan(
        s"""SELECT * FROM mr_evtkw_stream MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY event_ts, event_id
           |  MEASURES b.event_id AS b_id
           |  PATTERN (b)
           |  WITHIN 60000
           |  EVENTTIME etc
           |  DEFINE b AS event_type = 'B'
           |)""".stripMargin))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("mr_evtkw_sink").start()
    try {
      input.addData((1L, 10L, 1L, "B"))
      q.processAllAvailable()
      input.addData((99L, 1000000000L, 9L, "T"))
      q.processAllAvailable()
      val got = spark.table("mr_evtkw_sink")
        .select($"b_id").as[Long].collect().toSet
      assert(got == Set(1L), s"aliased workaround: $got")
    } finally q.stop()
  }

  test("equivalence fuzz: mixed-variable and universal navigation " +
      "rewrites match hand-distributed per-variable statements") {
    // r19 VERDICT round-20 task 6: the round-19 distribution passes
    // shipped with point tests; this fuzz draws random expression
    // arguments and asserts the COMPACT form (what the rewriter
    // distributes) produces byte-identical measures to the HAND-BUILT
    // distributed form (per-variable selectors composed with the same
    // arithmetic), and the universal form to its explicit-SUBSET
    // spelling — the textual pass's semantics, not just its parse.
    implicit val sqlCtx = spark.sqlContext
    // 3 users x varied run lengths so offsets land both in and out of
    // range (NULL legs exercised), plus a literal-bearing CASE draw
    val data = Seq(
      (1L, 10L, 1L, "A", 2.0), (2L, 20L, 1L, "A", 3.0),
      (3L, 30L, 1L, "B", 5.0),
      (4L, 10L, 2L, "A", 7.0), (5L, 20L, 2L, "B", 11.0),
      (6L, 10L, 3L, "A", 1.0), (7L, 20L, 3L, "A", 4.0),
      (8L, 30L, 3L, "A", 9.0), (9L, 40L, 3L, "B", 6.0))
    data.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_eqfuzz_sql")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    val fuzzSeed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
    val rnd = new scala.util.Random(fuzzSeed.getOrElse(20260816L))
    val trials = Soak.knob("GRAFT_EQFUZZ_TRIALS", 40, 160)
    def run(measure: String, define: String): Seq[(Long, Option[Double])] =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          parser.parsePlan(
            s"""SELECT * FROM mr_eqfuzz_sql MATCH_RECOGNIZE (
               |  PARTITION BY user_id
               |  ORDER BY ts_us, event_id
               |  MEASURES b.event_id AS b_id, $measure AS m
               |  AFTER MATCH SKIP PAST LAST ROW
               |  PATTERN (a+ b)
               |  SUBSET u = (a, b)
               |  WITHIN 60000
               |  DEFINE a AS event_type = 'A',
               |         b AS event_type = 'B' AND ($define)
               |)""".stripMargin))
        .select($"b_id", $"m").as[(Long, Option[Double])]
        .collect().sortBy(_._1).toSeq
    var ran = 0
    for (trial <- 1 to trials) {
      val op = if (rnd.nextBoolean()) "+" else "-"
      val c1 = 1 + rnd.nextInt(4)
      val c2 = rnd.nextInt(7)
      val selCase = rnd.nextInt(4)
      val j = rnd.nextInt(3)
      val k = 1 + rnd.nextInt(2)
      val sel: String => String = selCase match {
        case 0 => e => s"FIRST($e, $j)"
        case 1 => e => s"LAST($e, $j)"
        case 2 => e => s"PREV($e, $k)"
        case _ => e => s"PREV(FIRST($e), $k)"
      }
      // PREV-flavored selectors in MEASURES only take mixed arguments
      // (single-variable and universal flat-PREV expressions are the
      // DEFINE-side derived-column path; the MEASURES guard names
      // them) -- restrict those draws to the mixed kinds
      val kind =
        if (selCase >= 2) (if (rnd.nextBoolean()) 0 else 3)
        else rnd.nextInt(4)
      val compactSel = sel
      val handSel = sel
      val (compact, hand) = kind match {
        case 0 => // mixed two-variable argument
          (compactSel(s"a.value $op b.value * $c1"),
            s"(${handSel("a.value")} $op ${handSel("b.value")} * $c1)")
        case 1 => // single-variable expression argument
          (compactSel(s"a.value * $c1 $op $c2"),
            s"(${handSel("a.value")} * $c1 $op $c2)")
        case 2 => // universal (unqualified) vs explicit-SUBSET spelling
          (compactSel(s"value * $c1 $op $c2"),
            s"(${handSel("u.value")} * $c1 $op $c2)")
        case _ => // literal-bearing CASE inside a mixed argument
          (compactSel(s"CASE WHEN a.event_type = 'x.y' THEN " +
            s"a.value ELSE b.value $op $c2 END"),
            s"(CASE WHEN ${handSel("a.event_type")} = 'x.y' THEN " +
              s"${handSel("a.value")} ELSE " +
              s"${handSel("b.value")} $op $c2 END)")
      }
      val defPred = s"COALESCE($compact < ${5 + rnd.nextInt(40)}, TRUE)"
      val defHand = defPred.replace(compact, hand)
      val got = run(compact, defPred)
      val want = run(hand, defHand)
      assert(got == want,
        s"trial $trial: compact [$compact] -> $got\n" +
          s"hand [$hand] -> $want")
      ran += 1
    }
    assert(ran == trials, s"only $ran of $trials equivalence trials ran")
  }
}
