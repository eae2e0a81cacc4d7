package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.functions.Hll

/** Ad-hoc N× scale probe for the curation operators (the BASELINE.md
  * "growth at 10× data" table): replicates the documents/events tables
  * N times with shifted ids — exact-copy replication is deliberately
  * the WORST case for dedup-family operators (every chunk/gram/band
  * bucket gets N copies) — and times each operator end-to-end with a
  * noop sink. Prints one JSON line per operator.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_COPIES=10
  *        sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, idCol: String): DataFrame =
      (0 until copies).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i.toLong * 1000000000L)))
        .reduce(_ unionByName _)

    val docs = replicate(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang"), "doc_id")
    val events = replicate(
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_type"), col("user_id")), "user_id")

    // builder-side iteration filter (comma-separated op names); the
    // BASELINE.md tables come from unfiltered runs
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def time(name: String)(mk: => DataFrame): Unit = {
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"$name","copies":$copies,"sec":$dt%.2f}""")
      }
    }

    // warm-up: touch both inputs once
    docs.count(); events.count()

    time("chunk_dedup")(TextOps.chunkDedupStats(docs, "text", "doc_id"))
    time("topk_sample")(TextOps.topKSample(docs, "doc_id", "lang", 5))
    time("ngram_jaccard")(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      ngram = 3, threshold = 0.5, numHashes = 4, bands = 1))
    time("hll_distinct")(events.groupBy(col("event_type"))
      .agg(Hll.sketch(col("user_id")).as("r"))
      .select(col("event_type"), Hll.estimate(col("r")).as("est")))
    time("countmin")(events.groupBy(col("event_type"))
      .agg(graft.functions.CountMin.sketch(col("user_id"), 4, 1024)
        .as("sk")))
    // 1e9 id shift is a multiple of 50, so the bench subset replicates
    // with the corpus — bench-side growth is the bloom worst case
    time("bloom_decontaminate")(TextOps.bloomDecontaminate(docs,
      docs.filter(col("doc_id") % 50 === 0), "text", "doc_id"))
    time("bm25")(TextOps.bm25Rank(docs, "text", "doc_id",
      Seq("join", "vector", "stream")))
    time("window_dup")(TextOps.windowDupStats(docs, "text", "doc_id",
      windowWords = 30, strideWords = 10))
    time("chunk_rebuild")(TextOps.chunkDedupRebuild(docs, "text", "doc_id"))
    time("seq_packing")(TextOps.packSequences(docs, "text", "doc_id",
      "lang", budget = 2048, shards = 32))
    time("split_shuffle")(TextOps.splitAssign(docs, "doc_id",
      Seq(("train", 900), ("val", 50), ("test", 50)), nFiles = 64))
    time("salient_terms")(TextOps.salientTerms(docs, "text", "doc_id", 5))
    val vecs = replicate(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")), "vec_id")
    time("kmeans")(graft.operators.Similarity.kmeansAssign(
      vecs, "embedding", "vec_id", k = 8, iters = 2))
    // replication stacks near-identical vectors into every cell: the
    // intra-cell pair join is the SemDeDup worst case by construction
    time("semdedup")(graft.operators.Similarity.semDedup(
      vecs, "embedding", "vec_id", k = 8, threshold = 0.3))
    // the q102 chain: LSH-banded near-dup pairs (replication puts N
    // near-identical copies in every plane bucket — the pair worst
    // case) → checkpointed connected components → split election
    time("leakage_split") {
      val pairs = Dedup.embeddingPairs(vecs, "embedding", "vec_id",
        dim = 64, threshold = 0.35, nPlanes = 8)
      Dedup.leakageSafeSplit(vecs, "vec_id", pairs, "id_a", "id_b",
        Seq(("train", 900), ("val", 50), ("test", 50)))
    }
    time("pq_codes")(graft.operators.Similarity.pqCodes(
      vecs, "embedding", "vec_id", dim = 64, m = 2, k = 4))
    // queries replicate with the corpus (1e9 shift % 2000 = 0 picks the
    // same base queries in every copy) — probe fan-out is the worst case
    time("ivf_pq_topk")(graft.operators.Similarity.ivfPqTopK(
      vecs, vecs.filter(col("vec_id") % 2000 === 0), "embedding",
      "vec_id", dim = 64, m = 2, k = 4, nCells = 8, nProbe = 2,
      topK = 3))
    time("ivf_pq_residual")(graft.operators.Similarity.ivfPqTopK(
      vecs, vecs.filter(col("vec_id") % 2000 === 0), "embedding",
      "vec_id", dim = 64, m = 2, k = 4, nCells = 8, nProbe = 2,
      topK = 3, residual = true))
    time("pq_rerank")(graft.operators.Similarity.pqRerank(
      vecs, vecs.filter(col("vec_id") % 2000 === 0), "embedding",
      "vec_id", dim = 64, m = 2, k = 4, topK = 3, rerankDepth = 10))
    // the full q100 chain (three k-means trainings + ADC + exact
    // refine) — the heaviest intrinsic-cost query; queries replicate
    // with the corpus, so shortlist work grows N² while trainings
    // grow N — the 100× decade run proves the bound holds
    time("ivf_pq_rerank")(graft.operators.Similarity.ivfPqRerank(
      vecs, vecs.filter(col("vec_id") % 2000 === 0), "embedding",
      "vec_id", dim = 64, m = 2, k = 4, nCells = 8, nProbe = 2,
      topK = 3, rerankDepth = 8))
    // replication multiplies every bigram type's count by N but adds no
    // new types: the model tables stay fixed-size while the probe join
    // fans out — the worst case for the gram-key shuffles
    time("bigram_lm")(TextOps.bigramLmScore(docs, "text", "doc_id"))
    time("epoch_upsample")(TextOps.epochUpsample(docs, "doc_id", 2300))
    // replication multiplies bucket counts by N but the model table
    // stays 1024 rows — growth isolates the per-doc count shuffles
    time("dsir_weights")(TextOps.dsirWeights(docs, "text", "doc_id",
      col("lang") === "en"))
    time("dsir_resample")(TextOps.dsirResample(docs, "text", "doc_id",
      col("lang") === "en", k = 100))
    // stratum centroids: the (group, dim) bank stays fixed-size while
    // the distance projection scales with the corpus
    time("group_centroid")(graft.operators.Similarity.groupCentroidDistance(
      vecs.join(docs.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id")),
      "embedding", "vec_id", "lang"))
    // replication multiplies every signature N× — every band bucket
    // gets N copies of each member, the LSH worst case (production
    // maxBucket caps it; the probe runs the capped call)
    time("incremental_minhash")(Dedup.incrementalMinhash(
      docs.filter(col("doc_id") % 5 === 0),
      Dedup.minhashSignatures(docs.filter(col("doc_id") % 3 === 0),
        "text", "doc_id", shingleK = 5, numHashes = 8),
      "text", "doc_id", shingleK = 5, numHashes = 8, bands = 2,
      threshold = 0.5, maxBucket = 1000))
    time("c4_line_filter")(TextOps.c4LineFilter(docs, "text", "doc_id"))
    // exact-copy replication duplicates EVERY gram N×: the election
    // window sees N rows per fingerprint and all but copy 0 turn into
    // full-document dup spans — the worst case for the span merge
    time("substring_dedup")(TextOps.substringDupStats(docs, "text",
      "doc_id", k = 8))
    // vocabulary stays fixed under replication — only the word-count
    // aggregation sees more rows
    time("bpe_pairs")(TextOps.bpePairCounts(docs, "text", topK = 50))
    // full chain: bounded top-V election + driver merge loop + frozen
    // encode — the vocabulary stays fixed under replication, so growth
    // isolates the word-count aggregation and the O(n) encode scan
    time("bpe_encode") {
      val model = graft.operators.Bpe.bpeTrain(docs, "text", nMerges = 6)
      graft.operators.Bpe.tokenCounts(docs, "text", "doc_id", model)
    }
    // replication multiplies gram counts but adds no new types: model
    // tables stay fixed-size while the per-doc count shuffle and the
    // five gram-key hash joins scale with the corpus
    time("trigram_lm")(TextOps.trigramLmScore(docs, "text", "doc_id",
      isTrain = col("lang") === "en"))
    // domain family over synthesized URLs (fixed domain cardinality —
    // growth isolates the scan-side extraction + the keyed aggregation)
    def withUrl(d: DataFrame) = d.withColumn("url",
      concat(lit("https://www.d"), pmod(col("doc_id"), lit(97L)),
        lit(".example.com/p/"), col("doc_id")))
    time("domain_stats")(graft.operators.UrlOps.domainStats(
      withUrl(docs), "url", "text"))
    time("domain_mixture") {
      import spark.implicits._
      graft.operators.UrlOps.domainMixture(
        graft.operators.UrlOps.blocklistFilter(withUrl(docs), "url",
          Seq("d13.example.com", "d42.example.com").toDF("domain")),
        "url", topK = 10)
    }
    // the rebuild pays the stats tier's election PLUS word rows through
    // the anti-join; exact-copy replication turns every non-first copy
    // into a full-document removal — the worst case for covered-position
    // explode AND the rebuild shuffle
    time("substring_rebuild")(TextOps.substringDedupRebuild(docs, "text",
      "doc_id", k = 8))
    // ≤buckets-group aggregation however large the corpus: growth
    // isolates the gram explode's map-side combine
    time("feature_shift")(TextOps.featureShift(docs, "text",
      isA = col("lang") === "en", isB = col("lang") =!= "en"))
    // scan-side segmentation + gates; only kept block text reaches the
    // per-doc reassembly shuffle — boilerplate (the nav/footer here)
    // costs a counter, never bandwidth
    time("html_extract") {
      val pages = docs.withColumn("html", concat(
        lit("<nav><a href=\"/\">home</a> <a href=\"/a\">about</a> " +
          "<a href=\"/b\">contact</a></nav><p>"),
        col("text"),
        lit("</p><footer><a href=\"/t\">terms of use</a> " +
          "<a href=\"/p\">privacy policy</a> sitemap</footer>")))
      graft.operators.HtmlOps.extractMainText(pages, "html", "doc_id")
    }
    // exact-copy replication gives every asset N identical dHashes:
    // every pigeonhole segment bucket holds N copies — the banding
    // worst case (probe runs the capped production path)
    time("image_neardup") {
      import spark.implicits._
      val bin = docs.select(col("doc_id").as("id"),
        col("text").cast("binary").as("payload"))
        .as[graft.operators.Multimodal.BinAsset]
      val hashed = graft.operators.Multimodal.dHashAssets(bin).toDF()
        .filter(col("dhash").isNotNull)
      graft.operators.Dedup.hammingPairs(hashed, "dhash", "id",
        maxHamming = 3, pieces = 4, maxBucket = 1000)
    }
    // zero-shuffle scan projection: growth is the pure regex cost
    time("pii_scrub")(graft.operators.Pii.scrub(docs, "text", "doc_id"))
    // bench replicates with the corpus (1e9 % 50 = 0): 10× bench grams
    // AND 10× corpus grams — every bench hit happens 10×, the
    // broadcast-probe + span-merge worst case
    time("substring_decon")(TextOps.substringDecontaminate(docs,
      docs.filter(col("doc_id") % 50 === 0), "text", "doc_id", k = 8))
    // replication multiplies nodes AND edges 10×: per-iteration joins
    // and the dst-keyed aggregation scale with the graph; the hub
    // nodes' in-degree grows 10× (skewed dst keys — the worst case
    // for the rank-sum shuffle)
    time("pagerank") {
      val ids = docs.select(col("doc_id"))
      val e = ids.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 1) % 50000).as("dst"))
        .unionByName(ids.select(col("doc_id").as("src"),
          (col("doc_id") % 10).as("dst")))
        .filter(col("src") =!= col("dst"))
      graft.operators.Graphs.pageRank(e, "src", "dst", iters = 5)
    }
    // exact-copy replication duplicates every competing line N×: the
    // election sees N rows per fingerprint and every non-first copy
    // drops — worst case for the loser anti-join AND the rebuild
    time("line_dedup") {
      val pages = docs.withColumn("text", concat_ws("\n",
        lit("Home About Contact Products News Archive"), col("text"),
        lit("copyright 2024 example site all rights reserved")))
      TextOps.lineDedup(pages, "text", "doc_id")
    }
    // canonicalization is scan-side; replication multiplies alias-group
    // sizes N× — the election aggregation's worst case
    time("url_dedup")(graft.operators.UrlOps.urlDedup(withUrl(docs),
      "url", "doc_id"))
    // vocabulary stays fixed under replication: the first-doc election
    // shuffles N× rows over the same token keys
    time("vocab_growth")(TextOps.vocabGrowth(docs, "text", "doc_id",
      stepDocs = 1000L))
    // replication multiplies BOTH sides' gram rows: the train-gram
    // distinct and the semi-join probe scale together
    time("split_contamination")(TextOps.splitContamination(docs, "text",
      "doc_id", Seq(("train", 900), ("val", 50), ("test", 50))))
    val eventsTs = replicate(graft.Tables.eventsTsUs(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us")), "user_id")
    // user-shifted replication multiplies sessions N× — the
    // user-partitioned windows stay per-user-sized
    time("session_stats")(graft.operators.Funnel.sessionStats(eventsTs,
      "user_id", "ts_us", "event_type", gapUs = 1800000000L,
      targetType = "purchase"))
    // the time range is fixed under replication: bucket counts grow N×
    // but the grid (types × buckets) does not — growth isolates the
    // count aggregation
    time("rate_anomaly")(graft.operators.Anomaly.rateAnomaly(eventsTs,
      "ts_us", "event_type"))

    // the batch MATCH_RECOGNIZE operator: user-shifted replication
    // multiplies KEYS N× while per-key event density stays constant —
    // the partitioned-NFA scale model (one hash shuffle + per-key
    // sorted scan, O(live partials) memory per key), so growth must
    // be the shuffle+sort's row-linear cost with a flat NFA term
    val eventsCep = {
      val base = graft.Tables.eventsTsUs(spark, sfDir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
      (0 until copies).map(i =>
        base.withColumn("user_id",
            col("user_id") + lit(i.toLong * 1000000000L))
          .withColumn("event_id",
            col("event_id") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionByName _)
    }
    import graft.plans.MatchRecognize
    import graft.plans.MatchRecognize.EStep
    time("mr_cep")(MatchRecognize(eventsCep, Seq("user_id"), "ts_us",
      "event_id",
      Seq(EStep("a", col("event_type") === "click"),
        EStep("b", col("event_type") === "purchase")),
      withinTs = Some(600000000L)))
    // the interpreted ctxPred path (cross-variable DEFINE): per-event
    // cost adds the per-partial predicate evaluation; still key-local
    time("mr_cep_crossvar")(MatchRecognize(eventsCep, Seq("user_id"),
      "ts_us", "event_id",
      Seq(EStep("strt", lit(true)),
        EStep("down", col("value") < MatchRecognize.cvFirst("strt", "value")),
        EStep("up", col("value") > MatchRecognize.cvFirst("strt", "value"))),
      withinTs = Some(7200000000L)))
    // the recursive composite-PERMUTE expansion (q208's shape):
    // 5! = 120 ordering branches sharing prefixes, MODE STRICT — the
    // k!-expansion NFA's decade model is the same partitioned-NFA
    // shape (keys multiply, per-key density constant), so growth must
    // stay row-linear with the branch seeding a flat per-key term
    time("mr_cep_permute5") {
      eventsCep.createOrReplaceTempView("probe_perm5")
      val parser = new graft.plans.GraftSqlParser(
        spark.sessionState.sqlParser, spark)
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        """SELECT * FROM probe_perm5 MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           c.event_id AS c_id, d.event_id AS d_id,
          |           e.event_id AS e_id
          |  PATTERN (PERMUTE(a{1,1}, b, c, d, e))
          |  MODE STRICT
          |  DEFINE a AS event_type = 'click', b AS event_type = 'view',
          |         c AS event_type = 'purchase',
          |         d AS event_type = 'signup', e AS event_type = 'error'
          |)""".stripMargin))
    }
    // round 17's members-seen bitmask automaton at SIX members
    // (q217's shape — beyond the old k!-expansion cap): same
    // partitioned-NFA decade model; the mask register replaces branch
    // seeding, so growth must stay row-linear with a flat per-key term
    time("mr_cep_permute6") {
      eventsCep.createOrReplaceTempView("probe_perm6")
      val parser = new graft.plans.GraftSqlParser(
        spark.sessionState.sqlParser, spark)
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        """SELECT * FROM probe_perm6 MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           c.event_id AS c_id, d.event_id AS d_id,
          |           e.event_id AS e_id, f.event_id AS f_id
          |  PATTERN (PERMUTE(a{1,1}, b, c, d, e, f))
          |  MODE STRICT
          |  DEFINE a AS event_type = 'click', b AS event_type = 'view',
          |         c AS event_type = 'purchase',
          |         d AS event_type = 'signup',
          |         e AS event_type = 'error' AND value <= 50,
          |         f AS event_type = 'error' AND value > 50
          |)""".stripMargin))
    }
    // round-18 PERMUTE arity stress (the cap-16 evidence beyond k=6):
    // one shared statement builder — {1,1} on the first member forces
    // the composite/RxPermute route (the bitmask automaton), matching
    // the permute5/6 probes above
    def permuteStmt(view: String, members: Seq[(String, String)]): String = {
      val names = members.map(_._1)
      s"""SELECT * FROM $view MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES ${names.map(n => s"$n.event_id AS ${n}_id")
                       .mkString(", ")}
         |  PATTERN (PERMUTE(${names.head}{1,1}, ${names.tail
                       .mkString(", ")}))
         |  MODE STRICT
         |  DEFINE ${members.map { case (n, p) => s"$n AS $p" }
                       .mkString(", ")}
         |)""".stripMargin
    }
    def runPermute(tag: String, view: String, df: DataFrame,
        members: Seq[(String, String)]): Unit =
      time(tag) {
        df.createOrReplaceTempView(view)
        val parser = new graft.plans.GraftSqlParser(
          spark.sessionState.sqlParser, spark)
        org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          parser.parsePlan(permuteStmt(view, members)))
      }
    // k=8 over the REAL events table (4 types x 2 value bands; signup
    // rows are STRICT-contiguity breakers): the user-shifted decade
    // model again — keys multiply, per-key density constant
    def band(t: String): Seq[(String, String)] = Seq(
      (s"${t.head}l", s"event_type = '$t' AND value <= 150"),
      (s"${t.head}h", s"event_type = '$t' AND value > 150"))
    runPermute("mr_cep_permute8", "probe_perm8", eventsCep,
      Seq("click", "view", "purchase", "error").flatMap(band))
    // k=10: full type coverage x 2 bands — every event is SOME member
    runPermute("mr_cep_permute10", "probe_perm10", eventsCep,
      Seq("click", "view", "purchase", "signup", "error").flatMap(band))
    // ADVERSARIAL interleaving: per key the classes rotate t0..t(k-1)
    // and every 3rd event is a WILDCARD 'w' satisfying EVERY member —
    // each wildcard forks a live partial per unseen member, the
    // C(k, k/2) mask-branching worst case the cap's comment cites
    // (Pattern.scala RxPermute). Under MODE STRICT a partial lives at
    // most k events, so live partials per key are bounded by the
    // branch tree over the last k events (and, above that, by
    // maxPartialMatches' documented best-effort drop). Keys scale
    // with `copies`: the decade model is keys x fixed per-key work.
    def advEvents(k: Int): DataFrame = {
      val nKeys = 100L * copies
      val perKey = 600L
      spark.range(nKeys * perKey).select(
        (col("id") / perKey).cast("long").as("user_id"),
        (col("id") % perKey).as("seq"))
        .select(col("user_id"),
          (col("seq") * 1000L).as("ts_us"),
          (col("user_id") * 1000000L + col("seq")).as("event_id"),
          when(col("seq") % 3 === 2, lit("w"))
            .otherwise(concat(lit("t"), pmod(col("seq"), lit(k))))
            .as("event_type"))
    }
    def wildMembers(k: Int): Seq[(String, String)] =
      (0 until k).map(i =>
        (s"m$i", s"(event_type = 't$i' OR event_type = 'w')"))
    runPermute("mr_cep_permute8_adv", "probe_perm8adv",
      advEvents(8), wildMembers(8))
    runPermute("mr_cep_permute10_adv", "probe_perm10adv",
      advEvents(10), wildMembers(10))

    // the lag-window + SUBSET-union-fold shape (q214's statement
    // verbatim): the PREV materialization is a Window sharing the
    // operator's exchange and sort, so growth must match the plain
    // mr_cep rows plus a row-linear lag term
    time("mr_cep_subset_nav") {
      eventsCep.createOrReplaceTempView("probe_subnav")
      val parser = new graft.plans.GraftSqlParser(
        spark.sessionState.sqlParser, spark)
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        """SELECT * FROM probe_subnav MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts_us, event_id
          |  MEASURES a.event_id AS a_id, b.event_id AS b_id,
          |           c.event_id AS c_id
          |  PATTERN (a b c)
          |  SUBSET s = (a, b)
          |  DEFINE a AS event_type = 'click',
          |         b AS event_type = 'view',
          |         c AS event_type = 'purchase'
          |           AND value > PREV(s.value)
          |)""".stripMargin))
    }
    time("cube_report")(graft.operators.Rollup.cubeReport(eventsTs,
      "event_type", "ts_us", "user_id"))
    // integer-exact training (bounded ≤buckets collect per epoch) +
    // frozen scan-side scoring
    time("perceptron") {
      val m = graft.operators.Classifier.perceptronTrain(docs, "text",
        "doc_id", label = col("lang") === "en", buckets = 1024,
        epochs = 2)
      graft.operators.Classifier.perceptronScore(docs, "text", "doc_id", m)
    }
    // exact-copy replication: every selected fingerprint appears in N
    // copies of its doc — the share-count aggregation's worst case
    // (selection itself is in-row and scales linearly)
    time("winnow")(TextOps.winnowStats(docs, "text", "doc_id"))
    // replication multiplies every line fingerprint N× against a
    // replicated history — every batch line is either history-blocked
    // or election-deduped, the anti-join worst case
    time("incr_line_dedup") {
      val pages = docs.withColumn("text", concat_ws("\n",
        lit("Home About Contact Products News Archive"), col("text"),
        lit("copyright 2024 example site all rights reserved")))
      TextOps.incrementalLineDedup(
        pages.filter(col("doc_id") % 5 === 0),
        TextOps.lineFingerprints(
          pages.filter(col("doc_id") % 3 === 0), "text"),
        "text", "doc_id")
    }
    // the histogram stays fixed-size under replication (same distinct
    // lengths, counts ×N) — growth isolates the two-level ranking
    // shuffle and the broadcast range-join
    time("pack_pairs")(TextOps.packPairs(docs, "text", "doc_id",
      budget = 100))
    // stateless scan projection: growth is the pure codepoint-pass cost
    time("script_profile")(TextOps.scriptProfile(docs, "text", "doc_id"))
    // per-stratum histograms stay fixed-size under replication — same
    // histogram-bounded shape as pack_pairs, times the strata count
    time("pack_pairs_by")(TextOps.packPairsBy(docs, "text", "doc_id",
      "lang", budget = 100))
    // one scan agg + two uniqueness hash aggs; the dup-text groups grow
    // N× under replication — the uniqueness re-aggregation worst case
    time("validate") {
      import graft.operators.Validate
      Validate.check(docs, Seq(Validate.NotNull("text"),
        Validate.Matches("lang", "^[a-z]{2}$"),
        Validate.Unique("doc_id"), Validate.Unique("text")))
    }
    // k scans + k TakeOrdered(1) reductions; replication multiplies
    // scan rows but the center set stays k — growth is pure scan cost
    time("kcenter")(graft.operators.Similarity.kCenterAssign(
      vecs, "embedding", "vec_id", k = 4))
    // per-round checkpointing makes each of the 64 rounds one flat
    // scan over the previous round's blocks — growth must track the
    // k=4 row's slope (pure scan cost), proving per-round cost is
    // flat in k rather than the O(k²) an accumulated lineage gives
    time("kcenter_k64")(graft.operators.Similarity.kCenterAssign(
      vecs, "embedding", "vec_id", k = 64))
    // stateless scan projection since the hashed-kernel rewrite:
    // growth is the pure tokenize + O(n) counting cost
    time("quality_gate")(TextOps.qualityGate(docs, "text", "doc_id"))
    // exact-copy replication puts every winnowed fp in N copies of its
    // doc: each fp bucket holds N× members — the capped self-join's
    // worst case (pairs grow N² per bucket until the cap bites)
    time("winnow_pairs")(TextOps.winnowOverlapPairs(docs, "text",
      "doc_id", minShared = 2, topK = 100, maxBucket = 1000))
    // nearest as-of: replication multiplies per-user rows on BOTH
    // sides of the union — the window sort per key grows N×
    time("asof_nearest") {
      val clicks = eventsTs.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_us"))
      val views = eventsTs.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(count(lit(1)).as("n"))
      graft.operators.AsofJoin.asof(clicks, views, Seq("user_id"),
        "c_us", "ts_us", Seq("n"), leftOuter = true,
        direction = "nearest", tolerance = Some(60000000L))
    }
    // interval overlap: replication multiplies BOTH interval sides;
    // overlapping-window density per bucket grows N² — the bucketed
    // join's worst case (the exact predicate prunes after the join)
    time("interval_overlap") {
      val sessions = eventsTs.filter(col("event_type") === "click")
        .filter(col("user_id") % 7 === 0)
        .select(col("user_id").as("a_id"), col("ts_us").as("a_lo"),
          (col("ts_us") + 120000000L).as("a_hi"))
      val windows = eventsTs.filter(col("event_type") === "purchase")
        .filter(col("user_id") % 11 === 0)
        .select(col("user_id").as("b_id"),
          (col("ts_us") - 300000000L).as("b_lo"),
          col("ts_us").as("b_hi"))
      graft.operators.RangeJoin.intervalOverlap(sessions, windows,
        "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 300000000L)
    }
    spark.stop()
  }
}
