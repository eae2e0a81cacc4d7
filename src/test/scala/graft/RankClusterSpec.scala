package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** BM25 ranking, k-means assignment, and cluster-retention election. */
class RankClusterSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Rank orders by relevance and drops term-free docs") {
    val docs = Seq(
      (1L, "spark spark spark filler filler"), // tf=3, short
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "nothing relevant here at all"),
      (4L, "spark spark filler")               // tf=2, shortest
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Rank(docs, "text", "doc_id", Seq("spark"),
      topK = 10).collect()
    // doc 3 has no query term: absent entirely
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    val byRank = out.sortBy(_.getInt(4)).map(_.getLong(0)).toSeq
    // higher tf and shorter doc first: 1 (tf3) then 4 (tf2, dl3) then 2
    assert(byRank == Seq(1L, 4L, 2L), s"got $byRank")
    // saturation: score monotone decreasing in rank
    val scores = out.sortBy(_.getInt(4)).map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("bm25Rank scores are partitioning-independent (bit-exact)") {
    val docs = (1L to 200L).map(i =>
      (i, ("alpha " * (i % 5).toInt) + ("beta " * (i % 3).toInt) + "tail"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.bm25Rank(d, "text", "doc_id", Seq("alpha", "beta"), topK = 7)
        .select(col("id"), col("score")).as[(Long, Double)].collect().toSeq
    val base = run(docs)
    assert(run(docs.repartition(13)) == base)
    assert(run(docs.repartition(1)) == base)
  }

  test("kmeansAssign separates two well-split blobs (k=2)") {
    // ids 0,1 seed the two blobs; members sit near their seed
    val vecs = (0L until 40L).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 0.0f else 10.0f
      (i, Array(base + (i % 5) * 0.01f, base - (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(vecs, "embedding", "vec_id",
      k = 2, iters = 3).as[(Long, Long)].collect().toMap
    (0L until 40L).foreach { i =>
      assert(out(i) == i % 2, s"vec $i in cluster ${out(i)}")
    }
  }

  test("kmeansAssign is partitioning-independent") {
    val vecs = (0L until 100L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansAssign(d, "embedding", "vec_id", k = 4, iters = 2)
        .as[(Long, Long)].collect().toMap
    val base = run(vecs)
    assert(run(vecs.repartition(17)) == base)
  }

  test("kmeansAssign assignment is map-side: no vec_id exchange in plan") {
    val vecs = (0L until 100L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = Similarity.kmeansAssign(vecs, "embedding", "vec_id",
      k = 4, iters = 2).queryExecution.executedPlan.toString
    // argmin = array_sort projection over a 1-row broadcast codebook; a
    // rank-window formulation would surface here as an exchange
    // hash-partitioned on vec_id carrying the k×-amplified vectors
    assert(!plan.contains("hashpartitioning(vec_id"),
      "assignment shuffled on vec_id:\n" + plan.take(3000))
  }

  test("kmeansAssign reliable checkpointDir matches the default path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val vecs = (0L until 100L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    def run(ckpt: Option[String]) =
      Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 4,
        iters = 3, checkpointDir = ckpt).as[(Long, Long)].collect().toMap
    assert(run(Some(dir)) == run(None))
    // the reliable checkpoint actually wrote to the given directory
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, s"no checkpoint data in $dir")
  }

  test("kmeansCentroids lands on the blob means (k=2)") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i, Array(base + (i % 5) * 0.01f, base - (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, "embedding", "vec_id",
      k = 2, iters = 3).as[(Long, Seq[Double])].collect().toMap
    assert(cents.keySet == Set(0L, 1L))
    // integer-exact mean of each blob's coordinates, within floor slack
    assert(math.abs(cents(0L).head - 0.02) < 1e-3 &&
      math.abs(cents(1L).head - 10.02) < 1e-3, cents.toString)
    assert(cents.values.forall(_.length == 2))
  }

  test("ivfTopKTrained: trained codebook keeps neighbors blob-local") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(base + (i % 5) * 0.01f, base * 2.0f - (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(vecs, "embedding", "vec_id",
      k = 2, iters = 3)
    val out = Similarity.ivfTopKTrained(vecs, vecs.filter($"vec_id" < 4),
        cents, "embedding", "vec_id", k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length == 4 * 3)
    out.foreach { case (q, n, cos, rank) =>
      assert(q % 2 == n % 2, s"query $q got cross-blob neighbor $n")
      assert(rank >= 1 && rank <= 3 && cos > 0.9)
    }
    // within a probe cell the scoring is exact: agrees with brute force
    // restricted to the same blob
    val bf = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" % 2 === 0), vecs.filter($"vec_id" === 0),
      "embedding", "vec_id", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(out.filter(_._1 == 0L).toSet == bf)
  }

  test("semDedup drops higher-id near-duplicates within a cell only") {
    // two far-apart blobs (cells); inside blob 0, vectors 0/2/4 are
    // colinear (cosine 1.0) and 6 is orthogonal-ish; blob 1 all distinct
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (4L, Array(3.0f, 0.0f)), (6L, Array(0.0f, 1.0f)),
      (1L, Array(-10.0f, -10.0f)), (3L, Array(-10.0f, -10.2f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "embedding", "vec_id",
      k = 2, threshold = 0.9, iters = 3)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
    // 0 keeps (lowest id of the colinear run), 2 and 4 drop to it,
    // 6 survives (cos 0 to the others); 1 keeps, 3 drops (cos ≈ 0.9999)
    assert(out == Map(0L -> 1, 2L -> 0, 4L -> 0, 6L -> 1, 1L -> 1, 3L -> 0))
  }

  test("semDedup is partitioning-independent") {
    val vecs = (0L until 120L).map(i =>
      (i, Array.tabulate(6)(d => ((i * 17 + d * 5) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.semDedup(d, "embedding", "vec_id", k = 4, threshold = 0.8)
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    val base = run(vecs)
    assert(run(vecs.repartition(19)) == base)
  }

  test("pqCodes: per-subspace codebooks separate subspace structure") {
    // 4 dims, m=2: dims 0-1 cluster by i%2, dims 2-3 cluster by i%3==0 —
    // DIFFERENT groupings per subspace, which one whole-vector k-means
    // could not encode
    val vecs = (0L until 60L).map { i =>
      val a = if (i % 2 == 0) 0.0f else 10.0f
      val b = if (i % 3 == 0) -5.0f else 5.0f
      (i, Array(a, a + 0.01f * (i % 4), b, b - 0.01f * (i % 5)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(vecs, "embedding", "vec_id",
      dim = 4, m = 2, k = 2, iters = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 120)
    val bySub = out.groupBy(_._2)
    // subspace 0 groups by i%2, subspace 1 by i%3==0 (code values are
    // init vec_ids; only the PARTITION must match the planted structure)
    Seq(
      (0, (i: Long) => i % 2 == 0),
      (1, (i: Long) => i % 3 == 0)
    ).foreach { case (s, side) =>
      val codes = bySub(s).map(r => r._1 -> r._3).toMap
      val g0 = codes.filter(kv => side(kv._1)).values.toSet
      val g1 = codes.filterNot(kv => side(kv._1)).values.toSet
      assert(g0.size == 1 && g1.size == 1 && g0 != g1,
        s"subspace $s: $g0 vs $g1")
    }
  }

  test("pqCodes is partitioning-independent and validates dims") {
    val vecs = (0L until 90L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 13 + d * 3) % 17).toFloat)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodes(d, "embedding", "vec_id", dim = 8, m = 4, k = 3)
        .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val base = run(vecs)
    assert(base.map(_._2).toSet == Set(0, 1, 2, 3))
    assert(run(vecs.repartition(13)) == base)
    intercept[IllegalArgumentException] {
      Similarity.pqCodes(vecs, "embedding", "vec_id", dim = 8, m = 3, k = 2)
    }
  }

  test("pqTopK with k=N, iters=1 degenerates to exact L2 brute force") {
    // every vector is its own codeword, so the ADC distance IS the
    // exact (dot-form) squared L2 distance — a differential model check
    val raw = (0L until 30L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat)))
    val vecs = raw.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(vecs, vecs.filter($"vec_id" < 5),
        "embedding", "vec_id", dim = 4, m = 1, k = 30, topK = 4, iters = 1)
      .select($"query_id", $"neighbor_id", $"adc_dist", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val dv = raw.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    (0L until 5L).foreach { q =>
      val expect = dv.keys.filter(_ != q).toSeq
        .map { n =>
          val (x, c) = (dv(q), dv(n))
          (n, dot(x, x) - 2.0 * dot(x, c) + dot(c, c))
        }
        .sortBy { case (n, d) => (d, n) }.take(4)
      val mine = got.filter(_._1 == q).sortBy(_._4)
        .map(r => (r._2, r._3)).toSeq
      assert(mine == expect, s"query $q: $mine vs $expect")
    }
  }

  test("pqTopK plan: top-k pushes down, encoding stays map-side") {
    val vecs = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 13 + d * 5) % 19).toFloat)))
      .toDF("vec_id", "embedding")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.pqTopK(vecs, vecs.filter($"vec_id" < 3),
          "embedding", "vec_id", dim = 8, m = 2, k = 4, topK = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), plan.take(3000))
      assert(!plan.contains("hashpartitioning(vec_id"),
        "encoding shuffled on vec_id:\n" + plan.take(3000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ivfPqTopK: nProbe=nCells equals full PQ ADC; fewer probes subset") {
    val vecs = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 11 + d * 7) % 23).toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"adc_dist", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    // probing every cell = the full compressed-domain search, exactly
    val full = rows(Similarity.pqTopK(vecs, q, "embedding", "vec_id",
      dim = 8, m = 2, k = 3, topK = 4))
    val all = rows(Similarity.ivfPqTopK(vecs, q, "embedding", "vec_id",
      dim = 8, m = 2, k = 3, nCells = 4, nProbe = 4, topK = 4))
    assert(all == full)
    // fewer probes: every returned pair carries the SAME ADC distance
    // as the unrestricted search over all pairs
    val fullAll = Similarity.pqTopK(vecs, q, "embedding", "vec_id",
        dim = 8, m = 2, k = 3, topK = 100)
      .select($"query_id", $"neighbor_id", $"adc_dist")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val probed = Similarity.ivfPqTopK(vecs, q, "embedding", "vec_id",
        dim = 8, m = 2, k = 3, nCells = 4, nProbe = 1, topK = 4)
      .select($"query_id", $"neighbor_id", $"adc_dist")
      .as[(Long, Long, Double)].collect()
    assert(probed.nonEmpty)
    probed.foreach { case (qi, n, d) =>
      assert(fullAll((qi, n)) == d, s"pair ($qi,$n) dist drift")
    }
  }

  test("kmeans family excludes null vectors (engine-independent gate)") {
    // a null distance sorts FIRST in Spark but LAST in DuckDB ORDER BY;
    // the operators must drop null vectors rather than let the two
    // engines disagree the first time one appears
    val rows = (0L until 20L).map(i =>
      (i, if (i == 7L || i == 13L) null
          else Array.tabulate(4)(d => ((i * 5 + d) % 9).toFloat)))
    val vecs = rows.toDF("vec_id", "embedding")
    val km = Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 3)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(km == (0L until 20L).toSet -- Set(7L, 13L))
    val sd = Similarity.semDedup(vecs, "embedding", "vec_id",
      k = 3, threshold = 0.99).as[(Long, Long, Int)].collect()
    assert(sd.map(_._1).toSet == km && sd.length == 18)
    val pq = Similarity.pqTopK(vecs, vecs.filter($"vec_id" < 3),
      "embedding", "vec_id", dim = 4, m = 2, k = 3, topK = 2)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(!pq.contains(7L) && !pq.contains(13L))
  }

  test("NearestCentroid native expression matches the HOF argmin exactly") {
    import graft.functions.{NearestCentroid, Vectors}
    // random vectors + a codebook with an exact-duplicate centroid
    // (tie → smaller cid) and a NaN centroid (must order GREATEST,
    // never win over a real distance)
    val cents = Seq(
      (10L, Seq(1.0, 2.0, 3.0)),
      (11L, Seq(4.0, 0.0, -1.0)),
      (12L, Seq(1.0, 2.0, 3.0)),              // duplicate of 10 → tie
      (13L, Seq(Double.NaN, 1.0, 1.0)),       // NaN distance
      (14L, Seq(-2.0, 5.0, 0.5)))
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(3)(d => ((i * 17 + d * 13) % 29).toDouble - 14.0)))
      .toDF("vec_id", "x")
      .withColumn("_cl", typedLit(cents).cast(
        "array<struct<cid: bigint, cv: array<double>>>"))
    val hof = element_at(array_sort(transform(col("_cl"), c => {
      val cv = c.getField("cv")
      struct(
        (Vectors.dot(col("x"), col("x")) -
          lit(2.0) * Vectors.dot(col("x"), cv) +
          Vectors.dot(cv, cv)).as("d"),
        c.getField("cid").as("cid"))
    })), 1).getField("cid")
    val rows = vecs.select(col("vec_id"),
        NearestCentroid.column(col("x"), col("_cl")).as("native"),
        hof.as("hof"))
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 200)
    rows.foreach { case (id, n, h) => assert(n == h, s"vec $id: $n != $h") }
    // the duplicate-centroid tie resolves to the smaller cid somewhere
    assert(rows.exists(_._2 == 10L) && !rows.exists(_._2 == 12L))
    // the all-NaN edge: a NaN VECTOR makes every distance NaN → ties →
    // smallest cid, on both paths
    val nanRow = Seq((1L, Seq(Double.NaN, 0.0, 0.0))).toDF("vec_id", "x")
      .withColumn("_cl", typedLit(cents).cast(
        "array<struct<cid: bigint, cv: array<double>>>"))
      .select(NearestCentroid.column(col("x"), col("_cl")).as("native"),
        hof.as("hof")).as[(Long, Long)].head()
    assert(nanRow._1 == nanRow._2 && nanRow._1 == 10L)
  }

  test("residual IVF-PQ: deterministic; more probes never worsen best hit") {
    val vecs = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 11 + d * 7) % 23).toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 6)
    def run(d: org.apache.spark.sql.DataFrame, probes: Int) =
      Similarity.ivfPqTopK(d, q, "embedding", "vec_id", dim = 8, m = 2,
          k = 3, nCells = 4, nProbe = probes, topK = 4, residual = true)
        .select($"query_id", $"neighbor_id", $"adc_dist", $"rank")
        .as[(Long, Long, Double, Int)].collect()
    val base = run(vecs, 2).toSet
    assert(base.nonEmpty)
    assert(run(vecs.repartition(13), 2).toSet == base)
    // widening the probe never worsens the best hit per query (the
    // candidate set only grows; distances are per-pair constants)
    val best1 = run(vecs, 1).filter(_._4 == 1).map(r => r._1 -> r._3).toMap
    val best4 = run(vecs, 4).filter(_._4 == 1).map(r => r._1 -> r._3).toMap
    best1.foreach { case (qid, d1) =>
      assert(best4(qid) <= d1, s"query $qid: probe widening worsened best")
    }
  }

  test("pqRerank: depth=N-1 recovers the exact L2 order; depth>=topK") {
    // with the shortlist covering EVERY candidate, the re-rank IS exact
    // brute-force L2 — regardless of how lossy the PQ stage is (m=2,
    // k=2: maximally coarse codes)
    val raw = (0L until 24L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat)))
    val vecs = raw.toDF("vec_id", "embedding")
    val got = Similarity.pqRerank(vecs, vecs.filter($"vec_id" < 5),
        "embedding", "vec_id", dim = 4, m = 2, k = 2, topK = 3,
        rerankDepth = 23)
      .select($"query_id", $"neighbor_id", $"l2_dist", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val dv = raw.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    (0L until 5L).foreach { q =>
      val expect = dv.keys.filter(_ != q).toSeq
        .map { n =>
          val (x, c) = (dv(q), dv(n))
          (n, dot(x, x) - 2.0 * dot(x, c) + dot(c, c))
        }
        .sortBy { case (n, d) => (d, n) }.take(3)
      val mine = got.filter(_._1 == q).sortBy(_._4)
        .map(r => (r._2, r._3)).toSeq
      assert(mine == expect, s"query $q: $mine vs $expect")
    }
    intercept[IllegalArgumentException] {
      Similarity.pqRerank(vecs, vecs, "embedding", "vec_id", dim = 4,
        m = 2, k = 2, topK = 5, rerankDepth = 3)
    }
  }

  test("ivfPqRerank: full probe + full depth recovers exact L2 order") {
    val raw = (0L until 24L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat)))
    val vecs = raw.toDF("vec_id", "embedding")
    val got = Similarity.ivfPqRerank(vecs, vecs.filter($"vec_id" < 4),
        "embedding", "vec_id", dim = 4, m = 2, k = 2, nCells = 3,
        nProbe = 3, topK = 3, rerankDepth = 23)
      .select($"query_id", $"neighbor_id", $"l2_dist", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val dv = raw.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    (0L until 4L).foreach { q =>
      val expect = dv.keys.filter(_ != q).toSeq
        .map { n =>
          val (x, c) = (dv(q), dv(n))
          (n, dot(x, x) - 2.0 * dot(x, c) + dot(c, c))
        }
        .sortBy { case (n, d) => (d, n) }.take(3)
      val mine = got.filter(_._1 == q).sortBy(_._4)
        .map(r => (r._2, r._3)).toSeq
      assert(mine == expect, s"query $q: $mine vs $expect")
    }
  }

  test("groupCentroidDistance: distance to own-stratum quantized mean") {
    val vecs = Seq(
      ("a", 1L, Array(1.0f, 3.0f)),
      ("a", 2L, Array(3.0f, 5.0f)),   // centroid a = (2, 4)
      ("b", 3L, Array(10.0f, 0.0f))   // singleton: centroid = itself
    ).toDF("grp", "vec_id", "embedding")
    val got = Similarity.groupCentroidDistance(vecs, "embedding",
        "vec_id", "grp")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def d(x: Array[Double], c: Array[Double]) = {
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      dot(x, x) - 2.0 * dot(x, c) + dot(c, c)
    }
    assert(got(1L) == (("a", d(Array(1, 3), Array(2, 4)))))
    assert(got(2L) == (("a", d(Array(3, 5), Array(2, 4)))))
    // a singleton's distance to its own mean is exactly 0
    assert(got(3L)._2 == 0.0)
    // partitioning independence (integer centroid banks)
    val re = Similarity.groupCentroidDistance(vecs.repartition(5),
        "embedding", "vec_id", "grp")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(re == got)
  }

  test("standardize: z-scores match the quantized-stat model; const dim null") {
    val vecs = Seq(
      (1L, Array(1.0f, 5.0f, 2.0f)),
      (2L, Array(3.0f, 5.0f, 4.0f)),
      (3L, Array(5.0f, 5.0f, 9.0f))).toDF("vec_id", "embedding")
    val got = Similarity.standardize(vecs, "embedding", "vec_id")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // dim 1 is constant: quantized variance is exactly 0 -> NULL z
    assert((1L to 3L).forall(i => got((i, 1L)).isEmpty))
    // dims 0/2: replay the integer-banked math in Scala
    def z(xs: Seq[Double], x: Double): Double = {
      val sx = xs.map(v => math.floor(v * 1024.0).toLong)
      val n = xs.size.toDouble
      val m = sx.sum.toDouble / (n * 1024.0)
      val ex2 = sx.map(v => v * v).sum.toDouble / (n * 1048576.0)
      (x - m) / math.sqrt(ex2 - m * m)
    }
    assert(got((1L, 0L)).get == z(Seq(1, 3, 5), 1.0))
    assert(got((3L, 2L)).get == z(Seq(2, 4, 9), 9.0))
    // zero-mean unit-variance within quantization error
    val col2 = (1L to 3L).map(i => got((i, 2L)).get)
    assert(math.abs(col2.sum) < 1e-2)
    // partitioning independence (integer banks)
    val re = Similarity.standardize(vecs.repartition(5), "embedding",
        "vec_id").as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(re == got)
  }

  test("quantizeInt8: codes in [-127,127], reconstruction within scale/254") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),          // zero vector → zero codes
      (3L, Array(3.0f, -1.5f, 0.75f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs, "embedding", "vec_id")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 9)
    assert(out.forall(r => r._3 >= -127 && r._3 <= 127))
    assert(out.filter(_._1 == 2L).forall(_._3 == 0L))
    // reconstruction: |q * scale / 127 - x| <= scale / 254 (half a step)
    val orig = Map(1L -> Array(0.5, -1.0, 0.25), 3L -> Array(3.0, -1.5, 0.75))
    orig.foreach { case (id, xs) =>
      val sc = xs.map(math.abs).max
      out.filter(_._1 == id).foreach { case (_, pos, q) =>
        val err = math.abs(q * sc / 127.0 - xs(pos.toInt))
        assert(err <= sc / 254.0 + 1e-12, s"vec $id pos $pos err $err")
      }
    }
    // extremes hit exactly ±127 at the max-magnitude coordinate
    assert(out.find(r => r._1 == 1L && r._2 == 1L).get._3 == -127L)
    assert(out.find(r => r._1 == 3L && r._2 == 0L).get._3 == 127L)
  }

  test("electRetention keeps best quality per cluster, ties to lowest id") {
    val members = Seq(
      (1L, 100L, 50L), (2L, 100L, 80L), (3L, 100L, 80L), // tie at 80: id 2 wins
      (4L, 200L, 10L)                                     // singleton
    ).toDF("id", "cluster_id", "q")
    val kept = Dedup.electRetention(members, "id", "cluster_id", "q")
      .filter(col("keep") === 1).select(col("id")).as[Long]
      .collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("recallAudit counts overlap and reports silent misses as zeros") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L),
      (2L, 21L), (3L, 30L)).toDF("query_id", "neighbor_id")
    // query 1: 2 of 3 found (one spurious extra); query 2: wrong
    // neighbor only; query 3: missing from the index entirely
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 7L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAudit(truth, approx)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r)
      .toMap
    assert(got(1L) == ((1L, 3L, 3L, 2L, 666L)))
    assert(got(2L) == ((2L, 2L, 1L, 0L, 0L)))
    assert(got(3L) == ((3L, 1L, 0L, 0L, 0L)))
  }

  test("kCenterAssign: greedy farthest-point picks and assignment") {
    val vecs = Seq(
      (1L, Seq(0.0)), (2L, Seq(1.0)), (3L, Seq(10.0)),
      (4L, Seq(11.0)), (5L, Seq(20.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterAssign(vecs, "embedding", "vec_id", 3)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    // seed = id 1 ([0]); farthest = id 5 ([20], d=400);
    // then id 3 ([10]: min(100,100)=100 beats [11]: min(121,81)=81)
    assert(got(1L) == ((1L, 1L, 1)))
    assert(got(2L) == ((2L, 1L, 0)))   // [1] -> [0]
    assert(got(3L) == ((3L, 3L, 1)))
    assert(got(4L) == ((4L, 3L, 0)))   // [11] -> [10]
    assert(got(5L) == ((5L, 5L, 1)))
    // equidistant farthest candidates tie to the SMALLEST id
    val tie = Seq((1L, Seq(0.0)), (7L, Seq(5.0)), (4L, Seq(5.0)))
      .toDF("vec_id", "embedding")
    val t = Similarity.kCenterAssign(tie, "embedding", "vec_id", 2)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(t(4L) == ((4L, 4L, 1)), s"tie must pick id 4: $t")
    assert(t(7L)._2 == 4L) // identical vector assigns to center 4
  }

  test("kCenterAssign: reliable-checkpoint run matches localCheckpoint") {
    // distances are fixed-order double arithmetic, so the greedy picks
    // must replay bit-exactly whichever materialization backend runs
    val vecs = (0L until 40L).map(i =>
      (i, Seq((i * 7 % 13).toDouble, (i * 3 % 11).toDouble)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("kcenter-ckpt").toString
    val local = Similarity.kCenterAssign(vecs, "embedding", "vec_id", 6)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val reliable = Similarity.kCenterAssign(vecs, "embedding", "vec_id",
      6, checkpointDir = Some(dir))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(local.sameElements(reliable))
    assert(local.count(_._3 == 1) == 6)
  }
}
