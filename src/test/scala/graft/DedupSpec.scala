package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away " * 5

  // 0/1 exact dups (modulo whitespace), 2 near-dup of 0, 3/4 unrelated
  private val docs = Seq(
    (0L, base),
    (1L, base.replaceAll(" +", "  ") + " "),
    (2L, base.replaceFirst("lazy dog", "sleepy dog")),
    (3L, "completely different content about spark sql engines " * 8),
    (4L, "unrelated text regarding database query optimization " * 8)
  ).toDF("doc_id", "text")

  test("exact dedup keeps first doc of each normalized-content group") {
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 4L))
  }

  test("exactProject matches exact() and scans the input once") {
    val viaExact = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val viaProject = Dedup.exactProject(docs, "text", "doc_id",
      Seq("doc_id")).as[Long].collect().toSet
    assert(viaProject == viaExact)
    // the whole point: ONE evaluation of the upstream, not the
    // semi-join's two (AQE off so plan nodes are visible)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scans(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.LocalTableScanExec => s
        }.size
      assert(scans(Dedup.exactProject(docs, "text", "doc_id",
        Seq("doc_id"))) == 1)
      assert(scans(Dedup.exact(docs, "text", "doc_id")) == 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("exact dedup keeps one winner for null-text rows") {
    val withNulls = docs.unionByName(
      Seq((7L, null.asInstanceOf[String]), (8L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val kept = Dedup.exact(withNulls, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 4L, 7L))
  }

  test("exact dedup does not drop rows whose id is NULL") {
    // a group whose ids are ALL NULL has min(id)=NULL; the null-safe id
    // compare keeps those rows instead of vanishing them
    val withNullId = Seq(
      (Some(1L), "unique one"), (None: Option[Long], "only null id"))
      .toDF("doc_id", "text")
    val kept = Dedup.exact(withNullId, "text", "doc_id")
      .select("text").as[String].collect().toSet
    assert(kept == Set("unique one", "only null id"))
  }

  test("exactGroups reports the duplicate group") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .select("ids").as[Seq[Long]].collect()
    assert(g.length == 1 && g.head == Seq(0L, 1L))
  }

  test("minhash LSH finds near-duplicates, skips unrelated") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 1L))) // exact dups estimate ≈ 1.0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash pairs within hamming radius") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id",
      maxHamming = 6, pieces = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("ngram jaccard verifies candidates with exact similarity") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) == 1.0) // identical after normalization
    assert(m.contains((0L, 2L)) && m((0L, 2L)) > 0.5)
    assert(!m.contains((3L, 4L)))
  }

  test("embedding LSH pairs find planted near-identical vectors") {
    val dim = 16
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => math.sin(seed * 31 + i).toFloat)
    val nearly = vec(1).clone(); nearly(0) = nearly(0) + 0.001f
    val em = Seq(
      (0L, vec(1)), (1L, nearly), (2L, vec(7)), (3L, vec(13))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(em, "embedding", "vec_id", dim,
      threshold = 0.99, nPlanes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("LSH ANN achieves full recall for identical-vector queries") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val got = Similarity.lshTopK(e, queries, "embedding", "vec_id", 64,
      k = 1, nPlanes = 6, excludeSelf = false)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // a query identical to a corpus vector always lands in its own bucket
    assert(got.length == 10 && got.forall(p => p._1 == p._2))
  }

  test("IVF ANN achieves full recall for identical-vector queries and " +
      "more probes never shrink the candidate set") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    // a query identical to a corpus vector assigns to the same cell
    val got = Similarity.ivfTopK(e, queries, "embedding", "vec_id",
      k = 1, nCells = 8, nProbe = 1, excludeSelf = false)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.length == 10 && got.forall(p => p._1 == p._2))

    def hits(nProbe: Int): Set[(Long, Long)] =
      Similarity.ivfTopK(e, queries, "embedding", "vec_id",
        k = 5, nCells = 8, nProbe = nProbe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val one = hits(1)
    val three = hits(3)
    // probing more cells can only add candidates above any cosine rank
    // the 1-probe result reached
    assert(one.nonEmpty && three.size >= one.size)
  }

  test("multi-probe LSH recovers near-dup neighbors across bucket edges") {
    val dim = 32
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val corpus = (0L until 100L).map(i => (i, vec()))
    // queries are noisy copies of corpus vectors: the true top-1 neighbor
    // is the source, but noise pushes some queries across a hyperplane
    val queries = corpus.take(40).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = queries.toDF("vec_id", "embedding")
    def recall(probes: Int): Double = {
      val got = Similarity.lshTopK(cdf, qdf, "embedding", "vec_id", dim,
        k = 1, nPlanes = 8, multiProbe = probes)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      got.count(p => p._1 - 1000L == p._2).toDouble / queries.size
    }
    val r0 = recall(0)
    val r4 = recall(4)
    info(s"recall@1: single-bucket $r0, multi-probe(4) $r4")
    assert(r4 >= r0, s"multi-probe recall $r4 below single-bucket $r0")
    assert(r4 >= 0.8, s"multi-probe recall too low: $r4")
  }

  test("connected components: min-label clusters over an edge list") {
    // components: {1,2,3,7} (path 1-2-3 + 3-7), {4,5} and {9,10,11}
    // (a chain long enough to need pointer jumping past round 1)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 7L), (4L, 5L),
      (9L, 10L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 4L, 9L -> 9L, 10L -> 9L, 11L -> 9L))
  }

  test("connected components: a 64-node path converges (log rounds)") {
    // worst diameter per edge count: a single path; maxIter=25 only
    // works if pointer jumping actually shortcuts (plain propagation
    // would need 63 rounds)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(got.length == 64 && got.forall(_._2 == 0L))
  }

  test("connected components materializes the edge derivation once") {
    // the upstream pair pipeline (LSH + verification in production) must
    // run ONCE, not once per label-propagation round — count evaluations
    // of an edge-derivation expression with an accumulator
    val acc = spark.sparkContext.longAccumulator("edge-evals")
    val bump = udf { (x: Long) => acc.add(1L); x }
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("raw_a", "id_b")
      .select(bump(col("raw_a")).as("id_a"), col("id_b"))
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(got.length == 64 && got.forall(_._2 == 0L))
    // the symmetrizing union scans edges twice during the one eager
    // localCheckpoint; anything beyond a small constant means the
    // derivation re-ran inside the loop (63-node path needs ~6 rounds)
    assert(acc.value <= 63L * 2,
      s"edge derivation evaluated ${acc.value} times — expected <= 126")
  }

  test("connected components with a reliable checkpoint dir") {
    // same 64-node path as above, but materialized via reliable
    // checkpoint (the cluster-run option) — identical labels, and the
    // checkpoint data actually lands in the given directory
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b",
      checkpointDir = Some(dir)).as[(Long, Long)].collect()
    assert(got.length == 64 && got.forall(_._2 == 0L))
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, s"no checkpoint data in $dir")
  }

  test("bucket cap drops over-crowded bands (skew guard)") {
    // 30 identical docs: every band bucket holds all 30 → cap 10 drops
    // every bucket, so no candidate pairs survive
    val many = (0L until 30L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.minhashPairs(many, "text", "doc_id",
      threshold = 0.0, maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Dedup.minhashPairs(many, "text", "doc_id",
      threshold = 0.0, maxBucket = 0)
    assert(uncapped.count() == 30L * 29L / 2L)
  }

  test("incrementalExact: history blocks, first-in-batch wins, invariant") {
    import graft.functions.Text
    val history = Seq((100L, "seen before")).toDF("doc_id", "text")
      .select(Text.fingerprint($"text").as("fp"))
    val batch = Seq(
      (1L, "seen before"),     // in history -> not new
      (2L, "fresh text"),      // new, unique -> kept
      (3L, "dup in batch"),    // new, first of pair -> kept
      (4L, "dup in batch"),    // new, second -> is_new but not kept
      (5L, "  DUP   in batch") // normalizes to the same content
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, history, "text", "doc_id")
      .select($"id", $"is_new", $"kept")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(1L -> ((0, 0)), 2L -> ((1, 1)), 3L -> ((1, 1)),
      4L -> ((1, 0)), 5L -> ((1, 0))))
    // the append invariant: adding kept fingerprints to the history and
    // replaying the SAME batch marks every row as seen
    val kept = Dedup.incrementalExact(batch, history, "text", "doc_id")
      .filter($"kept" === 1).select($"fp")
    val round2 = Dedup.incrementalExact(batch, history.union(kept),
        "text", "doc_id")
      .as[(Long, Long, Int, Int)].collect()
    assert(round2.forall(r => r._3 == 0 && r._4 == 0))
  }

  test("incrementalMinhash: history near-dups block, min-id wins, invariant") {
    val histDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog far from home"))
      .toDF("doc_id", "text")
    val history = Dedup.minhashSignatures(histDocs, "text", "doc_id",
      shingleK = 5, numHashes = 8)
    val batch = Seq(
      // exact copy of the history doc -> jaccard 1.0, blocked
      (1L, "the quick brown fox jumps over the lazy dog far from home"),
      // disjoint content -> new, kept
      (2L, "completely unrelated subject matter written here instead"),
      // identical in-batch pair -> min id kept, partner dropped
      (3L, "sphinx of black quartz judge my vow tonight for good luck"),
      (4L, "sphinx of black quartz judge my vow tonight for good luck")
    ).toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame,
        h: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalMinhash(b, h, "text", "doc_id", shingleK = 5,
        numHashes = 8, bands = 2, threshold = 0.5, maxBucket = 0)
    val got = run(batch, history)
      .select($"id", $"hist_jaccard", $"is_new", $"kept")
      .as[(Long, Option[Double], Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Some(1.0), 0, 0)))
    assert(got(2L)._2 == 1 && got(2L)._3 == 1)
    assert(got(3L) == ((None, 1, 1)))
    assert(got(4L)._2 == 1 && got(4L)._3 == 0,
      s"in-batch dup must lose to the lower id: ${got(4L)}")
    // append invariant: add kept docs' signatures, replay the batch —
    // every row now matches history at 1.0
    val keptIds = run(batch, history).filter($"kept" === 1).select($"id")
    val kept = Dedup.minhashSignatures(
      batch.join(keptIds, batch("doc_id") === keptIds("id")),
      "text", "doc_id", shingleK = 5, numHashes = 8)
    val round2 = run(batch, history.unionByName(kept))
      .as[(Long, Option[Double], Int, Int)].collect()
    assert(round2.forall(r => r._2 == Some(1.0) && r._3 == 0 && r._4 == 0),
      round2.mkString(", "))
    // partitioning independence
    val re = run(batch.repartition(5), history.repartition(3))
      .select($"id", $"hist_jaccard", $"is_new", $"kept")
      .as[(Long, Option[Double], Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(re == got)
  }

  test("crossSourceDupMatrix: shared distinct content per source pair") {
    val docs = Seq(
      (1L, "a", "shared one"), (2L, "a", "shared two"), (3L, "a", "only a"),
      (4L, "b", "shared one"), (5L, "b", "shared two"), (6L, "b", "only b"),
      (7L, "c", "shared one"), (8L, "c", "  SHARED   one"), // normalizes
      (9L, "c", "only c")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.crossSourceDupMatrix(docs, "text", "source")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // diagonal = distinct contents per source (c's two "shared one"
    // spellings collapse to one fingerprint)
    assert(got(("a", "a")) == 3L && got(("b", "b")) == 3L)
    assert(got(("c", "c")) == 2L)
    assert(got(("a", "b")) == 2L)  // shared one + shared two
    assert(got(("a", "c")) == 1L && got(("b", "c")) == 1L)
    assert(got.size == 6, s"zero-overlap pairs must be omitted: $got")
  }

  test("leakageSafeSplit: clusters never straddle splits; full coverage") {
    val ids = (0L until 200L).toDF("doc_id")
    // chain edges form 50 clusters of 4 {0-3}, {4-7}, ...
    val pairs = (0L until 200L).filter(i => i % 4 != 3)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.leakageSafeSplit(ids, "doc_id", pairs, "id_a", "id_b",
        Seq(("train", 900), ("val", 50), ("test", 50)))
      .as[(Long, Long, String)].collect()
    assert(got.length == 200)
    // every member of a cluster carries the same split
    got.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c straddles")
      assert(rows.length == 4)
    }
    // the split of a cluster is splitAssign of its canonical (min) id
    val expect = graft.operators.TextOps.splitAssign(
        (0L until 200L by 4L).toDF("cid"), "cid",
        Seq(("train", 900), ("val", 50), ("test", 50)))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    got.foreach { case (_, c, s) => assert(expect(c) == s) }
    // singletons (no edges) split by their own id
    val solo = Dedup.leakageSafeSplit(ids, "doc_id",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b",
        Seq(("train", 500), ("test", 500)))
      .as[(Long, Long, String)].collect()
    assert(solo.length == 200 && solo.forall(r => r._1 == r._2))
  }

  test("clusterSizeProfile histograms cluster sizes") {
    val members = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),  // one 3-cluster
      (4L, 20L), (5L, 20L),             // one 2-cluster
      (6L, 30L), (7L, 40L)              // two singletons
    ).toDF("id", "cluster_id")
    val got = Dedup.clusterSizeProfile(members, "cluster_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((3L, 1L, 3L), (2L, 1L, 2L), (1L, 2L, 2L)))
  }

  test("incrementalExactBloom: seen drops, new elects, no false negatives") {
    val hist = Seq((1L, "known document body one"),
      (2L, "known document body two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "known document body one"),  // true bloom hit
      (11L, "a brand new document"),
      (12L, "a brand new document"),     // batch dup of 11
      (13L, "another fresh one"))
      .toDF("doc_id", "text")
    val bloom = Dedup.bloomHistory(hist, "text")
    val got = Dedup.incrementalExactBloom(batch, bloom, "text", "doc_id")
      .select(col("id"), col("is_new"), col("kept"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r).toMap
    // the dedup guarantee direction: a truly-seen doc can NEVER be new
    assert(got(10L) == ((10L, 0, 0)))
    assert(got(11L) == ((11L, 1, 1)))
    assert(got(12L) == ((12L, 1, 0))) // batch election: min id wins
    assert(got(13L) == ((13L, 1, 1)))
    // a saturated bloom (tiny mBits) turns everything into a false
    // positive — deterministic over-dropping, never under-dropping
    val tiny = Dedup.bloomHistory(hist, "text", mBits = 64, k = 3)
    val sat = Dedup.incrementalExactBloom(batch, tiny, "text",
        "doc_id")
      .agg(sum(col("is_new"))).as[Long].head()
    assert(sat <= 3, s"saturation can only reduce is_new: $sat")
  }

  test("purgeHistory: forgotten text re-admits, shared fingerprints stay") {
    import graft.functions.Text
    def fp(d: org.apache.spark.sql.DataFrame) =
      d.select(Text.fingerprint(col("text")).as("fp"))
    val corpus = Seq(
      (1L, "unique deleted document body"),
      (2L, "shared body both sides have"),
      (3L, "shared body both sides have"), // survivor copy of 2
      (4L, "unique surviving document"))
      .toDF("doc_id", "text")
    val deleted = corpus.filter(col("doc_id") <= 2)
    val survivors = corpus.filter(col("doc_id") > 2)
    val purged = Dedup.purgeHistory(fp(corpus).distinct(),
      fp(deleted), fp(survivors))
    // doc 1's fp is gone; the shared fp stays (doc 3 still holds it)
    val kept = purged.as[Long].collect().toSet
    val fpOf = (t: String) => fp(Seq((0L, t)).toDF("id", "text"))
      .as[Long].head()
    assert(!kept.contains(fpOf("unique deleted document body")))
    assert(kept.contains(fpOf("shared body both sides have")))
    assert(kept.contains(fpOf("unique surviving document")))
    // the RTBF invariant through incrementalExact: re-ingesting the
    // deleted docs against the PURGED history flags the unique one as
    // NEW; the shared one is still known (survivors hold it)
    val rerun = Dedup.incrementalExact(deleted, purged, "text", "doc_id")
      .select(col("id"), col("is_new")).as[(Long, Int)].collect().toMap
    assert(rerun(1L) == 1, s"forgotten text must be new again: $rerun")
    assert(rerun(2L) == 0, s"shared text stays known: $rerun")
  }

  test("minhashRecallAudit: exact dups always recalled; rates consistent") {
    val body = "the quick brown fox jumps over the lazy dog near the " +
      "riverbank while autumn leaves drift slowly down onto the water"
    val df = Seq(
      (1L, body),
      (2L, body), // exact dup of 1: jaccard 1, identical signature
      (3L, body + " with a small appended tail of extra words"),
      (4L, "a completely different document about spark physical " +
        "plans, shuffles, broadcasts and adaptive query execution"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashRecallAudit(df, "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, threshold = 0.5)
      .as[(Long, Long, Long, Long, Long)].head()
    val (nTrue, nCand, nHit, recall, precision) = got
    // (1,2) is a true pair AND an identical-signature candidate
    assert(nTrue >= 1L, s"expected a true pair: $got")
    assert(nHit >= 1L, s"exact dup must be recalled: $got")
    assert(nHit <= nTrue && nHit <= nCand, s"overlap bound: $got")
    assert(recall == (nHit * 1000) / math.max(nTrue, 1L), s"rate: $got")
    assert(precision == (nHit * 1000) / math.max(nCand, 1L), s"rate: $got")
  }

  test("templateClusters: slot variation vs exact dup vs singleton") {
    val df = Seq(
      (3L, "user 42 logged in from host7"),   // template, slots vary
      (1L, "user 9 logged in from host12"),
      (5L, "All  Rights\tReserved"),          // exact dups modulo
      (6L, "all rights reserved"),            //   normalization
      (9L, "a unique document body here")     // singleton: not reported
    ).toDF("doc_id", "text")
    val got = Dedup.templateClusters(df, "text", "doc_id")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 2L, 2L, 1),   // shape 'user # logged in from host#'
      (5L, 2L, 1L, 0)))  // same normalized content, no digits
    // digit position matters: 'host7 x' vs 'host 7x' are NOT one shape
    val df2 = Seq((1L, "host7 up"), (2L, "host 7up")).toDF("doc_id", "text")
    assert(Dedup.templateClusters(df2, "text", "doc_id").count() == 0L)
  }
}
