package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k, broadcast the (small) query
  *    side against the full corpus. Correct baseline; O(|Q|·N) work but
  *    embarrassingly parallel and shuffle-free except the final top-k.
  *  - [[lshTopK]]: sign-random-projection buckets; each query only scans
  *    its own bucket (plus optional multi-probe neighbors). The 100 TB
  *    path: candidate generation is an equi-join on the bucket id.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    * ties broken by neighbor id (deterministic).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", Vectors.dot(col("_cv"), col("_cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("_qn", Vectors.dot(col("_qv"), col("_qv")))
    val joined = c.crossJoin(broadcast(q))
    val scored0 = joined.select(col("query_id"), col("neighbor_id"),
      Vectors.cosineFromParts(Vectors.dot(col("_qv"), col("_cv")),
        col("_qn"), col("_cn")).as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("neighbor_id"))
      else scored0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query, the top-k MOST similar corpus vectors that are still BELOW
    * the near-duplicate band (`cosine < maxCos`) — close enough to be
    * informative negatives, far enough to not be unlabeled positives.
    * The exact shape mirrors [[bruteForceTopK]] (broadcast queries,
    * shuffle-free scan, one top-k); at index scale the same band
    * filter composes unchanged onto [[lshTopK]]/[[ivfTopK]] candidate
    * generation, because it is a per-pair predicate applied before the
    * rank window. Self-pairs are always excluded.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k.
    */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, maxCos: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", Vectors.dot(col("_cv"), col("_cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("_qn", Vectors.dot(col("_qv"), col("_qv")))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosineFromParts(Vectors.dot(col("_qv"), col("_cv")),
          col("_qn"), col("_cn")).as("cosine"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("cosine") < maxCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style approximate top-k: an inverted-file index with a coarse
    * quantizer. Centroids are the `nCells` lowest-id corpus vectors
    * (deterministic seeds standing in for a trained k-means codebook —
    * the plumbing, not the training, is the engine's job); every vector
    * is assigned map-side to its nearest centroid via INLINED centroid
    * literals (no shuffle, no broadcast join — the codebook rides the
    * plan), queries probe their `nProbe` nearest cells, and candidate
    * scoring is one equi-join on the cell id.
    *
    * 100 TB shape: assignment is a pure projection over the scan;
    * the only shuffle is the cell-id join, sized by cell occupancy
    * (≈ N/nCells per cell); recall grows with `nProbe` on the small
    * query side only.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nCells: Int, nProbe: Int = 1,
      excludeSelf: Boolean = true): DataFrame = {
    val cents: Array[(Long, Seq[Double])] = corpus
      .selectExpr(s"CAST($idCol AS LONG) AS id",
        s"CAST($vecCol AS ARRAY<DOUBLE>) AS v")
      .orderBy(col("id")).limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    ivfWithCodebook(corpus, queries, cents, vecCol, idCol, k, nProbe,
      excludeSelf)
  }

  /** IVF top-k over a TRAINED codebook — the production ANN shape:
    * [[kmeansCentroids]] (or any `(cid, cv)` frame) trains the coarse
    * quantizer, this builds and probes the index. The codebook is
    * collected once (bounded by construction: it is the k-row output of
    * a groupBy on the cluster id — collecting it is the same bounded
    * driver hop as [[ivfTopK]]'s seed collect) and INLINED into the
    * assignment projection, so cell assignment stays a pure map-side
    * expression over the scan at any corpus size.
    */
  def ivfTopKTrained(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 1,
      excludeSelf: Boolean = true): DataFrame = {
    val cents: Array[(Long, Seq[Double])] = centroids
      .selectExpr("CAST(cid AS LONG) AS cid", "CAST(cv AS ARRAY<DOUBLE>) AS cv")
      .orderBy(col("cid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(cents.nonEmpty, "ivfTopKTrained: empty codebook")
    ivfWithCodebook(corpus, queries, cents, vecCol, idCol, k, nProbe,
      excludeSelf)
  }

  private def ivfWithCodebook(
      corpus: DataFrame, queries: DataFrame,
      cents: Array[(Long, Seq[Double])],
      vecCol: String, idCol: String, k: Int, nProbe: Int,
      excludeSelf: Boolean): DataFrame = {
    val nCells = cents.length
    // per-centroid (negated score, cell id) structs: ascending array_sort
    // then yields best-score-first with smaller-cell-id tie-break
    def cellRanks(v: Column): Column = array_sort(array(cents.toIndexedSeq.map {
      case (cid, cv) =>
        val arr = cv.toArray
        struct((-Vectors.cosineFromParts(Vectors.dot(v, lit(arr)),
          Vectors.dot(v, v), lit(arr.map(x => x * x).sum))).as("ns"),
          lit(cid).as("cid"))
    }: _*))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("cell", element_at(cellRanks(col("_cv")), 1).getField("cid"))
      .withColumn("_cn", Vectors.dot(col("_cv"), col("_cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("cell", explode(transform(
        slice(cellRanks(col("_qv")), 1, math.min(nProbe, nCells)),
        s => s.getField("cid"))))
      .withColumn("_qn", Vectors.dot(col("_qv"), col("_qv")))
    val joined = c.join(q, Seq("cell"))
    val scored0 = joined.select(col("query_id"), col("neighbor_id"),
      Vectors.cosineFromParts(Vectors.dot(col("_qv"), col("_cv")),
        col("_qn"), col("_cn")).as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("neighbor_id"))
      else scored0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF/LSH-bucketed approximate top-k: queries only compare against
    * corpus vectors in the same sign-projection bucket. Recall < 1.0 by
    * construction; increase `nPlanes` ↓bucket size, decrease ↑recall.
    *
    * `multiProbe` > 0 additionally probes that many Hamming-1 neighbor
    * buckets per query, flipping the LEAST-confident sign bits first
    * (smallest |projection| — the planes the query sits closest to).
    * Classic multi-probe LSH: recall climbs steeply with a handful of
    * probes while the scanned volume grows only (1+multiProbe)×, all on
    * the small query side (the corpus is bucketed once, never exploded).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, dim: Int, k: Int,
      nPlanes: Int = 6, multiProbe: Int = 0,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("bucket", Vectors.signBuckets(col("_cv"), dim, nPlanes))
      .withColumn("_cn", Vectors.dot(col("_cv"), col("_cv")))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("bucket", Vectors.signBuckets(col("_qv"), dim, nPlanes))
      .withColumn("_qn", Vectors.dot(col("_qv"), col("_qv")))
    val q =
      if (multiProbe <= 0) q0
      else {
        val probes = math.min(multiProbe, nPlanes)
        // per-plane |projection| paired with its bit mask; sorting the
        // struct array ascending yields the flip order
        val planeStructs = Vectors.planes(dim, nPlanes).zipWithIndex.map {
          case (pl, p) => struct(
            abs(Vectors.dot(col("_qv"), lit(pl))).as("a"),
            lit(1L << p).as("m"))
        }
        val flipMasks = slice(
          transform(array_sort(array(planeStructs: _*)), s => s.getField("m")),
          1, probes)
        q0.withColumn("bucket", explode(concat(
            array(col("bucket")),
            transform(flipMasks, m => col("bucket").bitwiseXOR(m)))))
      }
    val joined = c.join(q, Seq("bucket"))
    val scored0 = joined.select(col("query_id"), col("neighbor_id"),
      Vectors.cosineFromParts(Vectors.dot(col("_qv"), col("_cv")),
        col("_qn"), col("_cn")).as("cosine"))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("neighbor_id"))
      else scored0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic Lloyd k-means assignment over an embedding column —
    * the clustering step of corpus organization / IVF index training.
    * Init = the `k` lowest-id vectors; `iters` assignment rounds with a
    * centroid update between consecutive rounds. Returns
    * `(vec_id, cluster)` where `cluster` is the init centroid's id.
    *
    * Null vectors are EXCLUDED from both assignment and updates: a null
    * distance would sort first under Spark's null ordering but last
    * under an external engine's ORDER BY, so dropping the row is the
    * only engine-independent semantics (the oracle filters identically).
    *
    * Exactness design: centroid updates accumulate `floor(x * 2^20)`
    * LONGS (float32 inputs are exact in double, floor is unambiguous —
    * no round-half mode drift between engines), so the per-cluster sums
    * are integer-exact and partitioning-independent; each new centroid
    * coordinate is ONE double division of exact integers, and each
    * distance is a fixed-order expression over IEEE add/mul
    * (`x·x - 2 x·c + c·c`, index-order dot products). Every float in
    * the pipeline is therefore bit-deterministic and externally
    * replicable — the q74 oracle replays all rounds in SQL.
    *
    * Shape for scale: the k centroids collapse into ONE sorted
    * array-of-structs column (a single-row frame, broadcast), and the
    * argmin is a map-side `array_sort` over the per-centroid
    * `(dist, cid)` structs — the corpus NEVER shuffles for assignment
    * (no k× row amplification, no rank window; the vectors ride the
    * scan). The update is a posexplode + (cluster, dim) hash
    * aggregation with map-side partial sums. No driver-side collect at
    * any k; plan depth grows linearly in `iters` — pass `checkpointDir`
    * to truncate lineage with a reliable per-round checkpoint of the
    * k-row centroid frame (executor-death-safe, unlike
    * `localCheckpoint`; use beyond ~10 rounds or on a real cluster).
    * The dir is SparkContext-GLOBAL (bound via the [[Checkpoints]]
    * guard): concurrent operator calls must pass the SAME path — this
    * applies to [[kmeansCentroids]] and [[pqCodes]] too.
    *
    * The argmin's `(dist, cid)` struct sort uses the same fixed-order
    * IEEE distance expression and the same (dist asc, cid asc)
    * tie-break as the previous rank-window formulation — assignments
    * are bit-identical, just computed without an exchange.
    */
  def kmeansAssign(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 2, scaleBits: Int = 20,
      checkpointDir: Option[String] = None,
      materialize: Boolean = true): DataFrame =
    lloyd(df, vecCol, idCol, k, iters, scaleBits, checkpointDir,
        materialize)
      .select(col("vec_id"), col("cid").as("cluster"))

  /** The trained centroids themselves — the [[kmeansAssign]] rounds plus
    * ONE more integer-exact update applied to the final assignment, as a
    * k-row `(cid, cv)` frame. This is the codebook-training path for
    * [[ivfTopKTrained]]: train here, index there. Bit-deterministic and
    * externally replayable for the same reasons as [[kmeansAssign]].
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 2, scaleBits: Int = 20,
      checkpointDir: Option[String] = None,
      materialize: Boolean = true): DataFrame =
    centroidUpdate(
      lloyd(df, vecCol, idCol, k, iters, scaleBits, checkpointDir,
        materialize),
      (1L << scaleBits).toDouble)

  /** Map-side nearest-centroid argmin: the k-row `(cid, cv)` codebook
    * collapses into ONE sorted array-of-structs row (broadcast
    * nested-loop join attaches it to every partition; sorted by cid so
    * the transform order — and therefore tie-breaking — is
    * deterministic), and the winner is `array_sort` over per-centroid
    * `(dist, cid)` structs. Adds `outCol` = nearest cid for `xCol`;
    * zero shuffle, zero row amplification.
    */
  /** The k-row codebook collapsed to ONE sorted array-of-structs row
    * (broadcastable; sorted by cid for deterministic order).
    */
  private def codebookColumn(cents: DataFrame): DataFrame =
    cents.agg(array_sort(
      collect_list(struct(col("cid"), col("cv")))).as("_cl"))

  /** Per-centroid `(dist, cid)` ranking expression over the collapsed
    * codebook. `dxx` is the PRE-HOISTED `dot(x,x)` column: computed once
    * per row in the projection, not once per centroid inside the
    * interpreted lambda — same value, same bits, k× less work (the same
    * hoist [[graft.functions.NearestCentroid]] does natively on the
    * assignment path).
    */
  private def codebookRanks(cents: DataFrame, xCol: String,
      dxx: Column): (DataFrame, Column) = {
    val ranked = array_sort(transform(col("_cl"), c => {
      val cv = c.getField("cv")
      struct(
        (dxx - lit(2.0) * Vectors.dot(col(xCol), cv) +
          Vectors.dot(cv, cv)).as("d"),
        c.getField("cid").as("cid"))
    }))
    (codebookColumn(cents), ranked)
  }

  private def argminCodebook(df: DataFrame, xCol: String,
      cents: DataFrame, outCol: String): DataFrame =
    // the hot per-row kernel: NearestCentroid is the codegen'd form of
    // the (transform → array_sort → element_at 1) HOF argmin — same
    // fixed-order floats, same (dist, cid) tie-break (differentially
    // spec'd), but the k·dim loop inlines into whole-stage codegen
    // instead of re-entering the interpreted HOF evaluator per row
    df.crossJoin(broadcast(codebookColumn(cents)))
      .withColumn(outCol,
        graft.functions.NearestCentroid.column(col(xCol), col("_cl")))
      .drop("_cl")

  /** Top-`nProbe` nearest centroids per row (the query-side multi-cell
    * probe), exploded — same map-side broadcast-codebook shape as
    * [[argminCodebook]].
    */
  private def probeCodebook(df: DataFrame, xCol: String,
      cents: DataFrame, outCol: String, nProbe: Int): DataFrame = {
    val (codebook, ranked) = codebookRanks(cents, xCol, col("_dxx"))
    df.withColumn("_dxx", Vectors.dot(col(xCol), col(xCol)))
      .crossJoin(broadcast(codebook))
      .withColumn(outCol,
        explode(transform(slice(ranked, 1, nProbe), s => s.getField("cid"))))
      .drop("_cl", "_dxx")
  }

  /** The shared Lloyd core: `iters` assignment rounds, returning the
    * final `(vec_id, cid, x)` frame (assignment WITH the vector, so
    * callers never rejoin the corpus) AND the codebook that final
    * assignment indexes (the round-(iters-1) centroids) — ADC scoring
    * must use exactly that codebook.
    */
  private def lloydFull(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, scaleBits: Int,
      checkpointDir: Option[String],
      materialize: Boolean = true): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1)
    val scale = (1L << scaleBits).toDouble
    // null vectors are EXCLUDED, explicitly: a null distance would sort
    // first under Spark's null ordering but LAST under an external
    // engine's ORDER BY (DuckDB) — dropping the row on both sides is
    // the only engine-independent semantics
    val e0 = df.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("x"))
      .filter(col("x").isNotNull)
    // materialize the training relation ONCE (guide §5: it is re-read
    // by every assignment round, the update, and the seed TakeOrdered —
    // without this each of those jobs re-derives the scan lineage).
    // Callers that already hold a materialized projection (the PQ
    // subspace slices) pass materialize = false.
    val e = if (materialize) e0.localCheckpoint() else e0
    // the checkpoint dir is SparkContext-GLOBAL: bound through the
    // shared [[Checkpoints]] guard, ONCE per distinct path — repeated
    // calls with the same dir (the pipeline norm) no longer mint fresh
    // UUID subdirectories or clobber another operator's binding;
    // CONCURRENT calls must pass the same dir (global slot)
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    def assign(cents: DataFrame): DataFrame =
      argminCodebook(e, "x", cents, "cid")
        .select(col("vec_id"), col("cid"), col("x"))
    var cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("x").as("cv"))
    var assigned = assign(cents)
    var i = 1
    while (i < iters) {
      cents = checkpointed(centroidUpdate(assigned, scale),
        checkpointDir.isDefined)
      assigned = assign(cents)
      i += 1
    }
    (assigned, cents)
  }

  private def lloyd(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, scaleBits: Int,
      checkpointDir: Option[String],
      materialize: Boolean = true): DataFrame =
    lloydFull(df, vecCol, idCol, k, iters, scaleBits, checkpointDir,
      materialize)._1

  /** The corpus/query projection every PQ/IVF kernel shares —
    * `(idOut, _xf)` with nulls excluded — materialized ONCE so the
    * dozens of downstream jobs (codebook training rounds, broadcast
    * builds, encode, rerank fetch) read a few-KB-per-partition local
    * checkpoint instead of each re-deriving the scan lineage (guide
    * §1.2/§5: the ANN queries were job-count-bound, not data-bound).
    */
  private def matVecs(df: DataFrame, vecCol: String, idCol: String,
      idOut: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as(idOut),
        col(vecCol).cast("array<double>").as("_xf"))
      .localCheckpoint()

  /** One integer-exact Lloyd centroid update over `(cid, x)` rows:
    * floor(x·2^scaleBits) long sums per (cluster, dim), rebuilt in pos
    * order, one double division per coordinate.
    */
  private def centroidUpdate(assigned: DataFrame, scale: Double): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("x")).as(Seq("pos", "xv")))
      .select(col("cid"), col("pos"),
        floor(col("xv") * lit(scale)).cast("long").as("sxv"))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("sxv")).as("s"), count(lit(1)).as("cnt"))
      .groupBy(col("cid"))
      .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("s")))),
          p => p.getField("s")).as("_ss"),
        max(col("cnt")).as("_cnt"))
      .select(col("cid"), transform(col("_ss"),
        s => s.cast("double") /
          (col("_cnt").cast("double") * lit(scale))).as("cv"))

  /** Reliable checkpoint (into the dir bound once at operator entry)
    * when requested — truncates lineage AND survives executor loss, the
    * cluster-run option — identity otherwise. The checkpointed frame
    * here is always the k-row centroid table, so the write is a few KiB
    * per round.
    */
  private def checkpointed(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df
  /** Product-quantization codes — the billion-scale ANN compression
    * step (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the vector splits into `m` contiguous
    * subspaces, each subspace trains its own k-codeword codebook with
    * the same integer-exact Lloyd rounds as [[kmeansAssign]], and every
    * vector is encoded as its nearest sub-centroid id per subspace —
    * `dim` floats collapse to `m` codes (e.g. 64 dims → 2 bytes at
    * m=2, k≤256).
    *
    * Output: `(vec_id, subspace, code)` — one row per (vector,
    * subspace); `code` is the winning init-centroid's vec_id within
    * that subspace's codebook (the [[kmeansAssign]] cluster-id
    * convention). Every float op is the proven q74 arithmetic, so the
    * codes replay exactly in external SQL.
    *
    * Scale shape: `m` independent Lloyd pipelines over SLICED vectors —
    * the slice is a scan-side projection, each subspace's assignment is
    * the map-side broadcast-codebook argmin (the corpus never shuffles),
    * and only (k · dim/m)-sized centroid updates cross an exchange. The
    * union of the m code sets is plan-level only (no barrier).
    */
  def pqCodes(df: DataFrame, vecCol: String, idCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must be a positive multiple of m ($m)")
    val subLen = dim / m
    // one materialized corpus projection shared by all m subspace
    // trainings — each sub-lloyd reads the checkpoint, not the scan
    val corpusM = matVecs(df, vecCol, idCol, "vec_id")
    (0 until m).map { s =>
      val sub = corpusM.select(col("vec_id"),
        subVecCol(col("_xf"), s, subLen).as("_sub"))
      kmeansAssign(sub, "_sub", "vec_id", k, iters,
          checkpointDir = checkpointDir, materialize = false)
        .select(col("vec_id"), lit(s).cast("int").as("subspace"),
          col("cluster").as("code"))
    }.reduce(_ unionByName _)
  }

  /** PQ asymmetric-distance top-k (ADC; Jégou et al. 2011 §IV): train
    * per-subspace codebooks, encode the corpus ONCE as `m` codes per
    * vector, and score each query against the codes via a per-query
    * distance TABLE (query-subvector → each sub-centroid, |Q|·k·m rows)
    * instead of per-vector float math — the compressed-domain search
    * that makes billion-scale scans affordable.
    *
    * Output: `(query_id, neighbor_id, adc_dist, rank)`, rank 1..topK by
    * ascending ADC distance (sum over subspaces of the squared
    * query-to-sub-centroid distance, added in subspace order — a fixed
    * IEEE fold, externally replayable).
    *
    * Scale shape: encoding is a pure map-side projection (one
    * [[argminCodebook]] per subspace over the scan — NO join, NO
    * shuffle); the distance tables are tiny broadcasts; the only
    * O(N·|Q|) stage is the final scored relation, which feeds a
    * rank-window whose `rank <= topK` filter triggers WindowGroupLimit
    * (map-side partial top-k). Exact within the quantized domain;
    * compose with IVF cells for the sub-linear production path.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, m: Int, k: Int, topK: Int,
      iters: Int = 2, excludeSelf: Boolean = true): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must be a positive multiple of m ($m)")
    require(topK >= 1)
    val subLen = dim / m
    pqTopKM(matVecs(corpus, vecCol, idCol, "vec_id"),
      matVecs(queries, vecCol, idCol, "query_id"),
      m, k, topK, iters, excludeSelf, subLen)
  }

  /** [[pqTopK]] over pre-materialized `(vec_id|query_id, _xf)` frames —
    * the form the rerank compositions share so the corpus and query
    * projections materialize exactly once per query.
    */
  private def pqTopKM(corpusM: DataFrame, queriesM: DataFrame, m: Int,
      k: Int, topK: Int, iters: Int, excludeSelf: Boolean,
      subLen: Int): DataFrame = {
    val cents = trainPqCodebooks(corpusM, m, k, iters, subLen)
    // encode: ONE projection over the materialized corpus, all m
    // argmins map-side (each codebook rides in as a 1-row broadcast)
    val base = corpusM.select(
      col("vec_id") +:
        (0 until m).map(s => subVecCol(col("_xf"), s, subLen)
          .as(s"_x$s")): _*)
    val coded = (0 until m).foldLeft(base) { (acc, s) =>
      argminCodebook(acc, s"_x$s", cents(s), s"_c$s")
    }.select(col("vec_id") +: (0 until m).map(s => col(s"_c$s")): _*)
    adcRank(coded, queriesM, cents, subLen, topK,
      excludeSelf, pairsCarryQueryId = false)
  }

  /** Vector slice for subspace `s` (1-based inclusive, matching DuckDB
    * list slices in the oracles).
    */
  private def subVecCol(c: Column, s: Int, subLen: Int): Column =
    slice(c.cast("array<double>"), s * subLen + 1, subLen)

  /** The fixed-order squared distance every kernel and oracle shares. */
  private def sqDist(x: Column, cv: Column): Column =
    Vectors.dot(x, x) - lit(2.0) * Vectors.dot(x, cv) +
      Vectors.dot(cv, cv)

  /** One trained codebook per subspace — the codebook the FINAL
    * assignment indexes ([[lloydFull]]), each materialized because every
    * caller references it twice (argmin/encoding + distance table; the
    * semDedup lesson).
    */
  private def trainPqCodebooks(corpusM: DataFrame, m: Int, k: Int,
      iters: Int, subLen: Int): Seq[DataFrame] = {
    // all m subspace codebooks union into ONE eager materialization —
    // one job trains every subspace concurrently (guide §2.6 back-fill,
    // plan-level union) instead of m sequential checkpoint jobs
    val all = (0 until m).map { s =>
      lloydFull(corpusM.select(col("vec_id"),
          subVecCol(col("_xf"), s, subLen).as("_sub")),
        "_sub", "vec_id", k, iters, scaleBits = 20,
        checkpointDir = None, materialize = false)._2
        .select(lit(s).cast("int").as("_s"), col("cid"), col("cv"))
    }.reduce(_ unionByName _).localCheckpoint()
    (0 until m).map(s =>
      all.filter(col("_s") === s).select(col("cid"), col("cv")))
  }

  /** The shared ADC tail of [[pqTopK]] and [[ivfPqTopK]]: per-subspace
    * distance tables (|Q|·k rows, broadcast) joined onto the coded
    * pairs, summed in subspace order (fixed IEEE fold), self-excluded,
    * ranked ascending with the neighbor-id tie-break and
    * WindowGroupLimit-capped at `topK`. `pairsCarryQueryId` says whether
    * `pairs` is already a (query, vector) relation (IVF probe output) or
    * the plain coded corpus (full scan — the first table join introduces
    * query_id).
    */
  private def adcRank(pairs: DataFrame, queriesM: DataFrame,
      pqCents: Seq[DataFrame],
      subLen: Int, topK: Int, excludeSelf: Boolean,
      pairsCarryQueryId: Boolean): DataFrame = {
    val dtabs = pqCents.zipWithIndex.map { case (cents, s) =>
      queriesM
        .select(col("query_id"),
          subVecCol(col("_xf"), s, subLen).as("_q"))
        .crossJoin(broadcast(cents))
        .select(col("query_id"), col("cid").as(s"_c$s"),
          sqDist(col("_q"), col("cv")).as(s"_d$s"))
    }
    adcScore(pairs, dtabs,
      s => if (s == 0 && !pairsCarryQueryId) Seq(s"_c$s")
      else Seq(s"_c$s", "query_id"),
      topK, excludeSelf)
  }

  /** The generic ADC scoring/ranking tail over PREBUILT distance tables
    * (`dtabs(s)` carries `_c\$s` and `_d\$s` plus whatever `keysFor(s)`
    * joins on): broadcast-join each table, sum the per-subspace
    * distances in subspace order (fixed IEEE fold), self-exclude, rank
    * ascending with the neighbor-id tie-break, WindowGroupLimit-cap at
    * `topK`.
    */
  private def adcScore(pairs: DataFrame, dtabs: Seq[DataFrame],
      keysFor: Int => Seq[String], topK: Int,
      excludeSelf: Boolean): DataFrame = {
    val scored0 = dtabs.zipWithIndex.foldLeft(pairs) {
      case (acc, (dtab, s)) => acc.join(broadcast(dtab), keysFor(s))
    }
    val adc = dtabs.indices.map(s => col(s"_d$s")).reduce(_ + _)
    val scored1 = scored0.select(col("query_id"),
      col("vec_id").as("neighbor_id"), adc.as("adc_dist"))
    val scored =
      if (excludeSelf) scored1.filter(col("query_id") =!= col("neighbor_id"))
      else scored1
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** IVF-PQ search — the billion-scale production composition (Jégou
    * et al. 2011 §V): a TRAINED coarse quantizer ([[kmeansCentroids]])
    * restricts each query to its `nProbe` nearest cells, and candidates
    * inside those cells are scored in the compressed domain via ADC
    * tables.
    *
    * `residual = false` (default) PQ-encodes the raw vectors —
    * simplest, one shared codebook meaning per code. `residual = true`
    * is the paper's full form: PQ quantizes `x − c_cell` (the residual
    * after coarse quantization — much lower variance, so the same k
    * codewords buy more precision), the distance tables become
    * per-(query, probed-cell) because the QUERY's residual differs per
    * cell, and every float stays an exact fixed-order IEEE expression
    * (per-element subtract), so both forms replay externally.
    *
    * Output: `(query_id, neighbor_id, adc_dist, rank)` like [[pqTopK]],
    * but the scored relation is cell-bounded (≈ N·nProbe/nCells per
    * query) instead of the full N — the sub-linear path.
    *
    * Scale shape: cell assignment AND all m PQ encodings happen in ONE
    * map-side projection over the scan (coarse + sub codebooks all ride
    * in as 1-row broadcasts; the residual subtract is a zip_with in the
    * same projection); the probe table (|Q|·nProbe) and the ADC tables
    * (|Q|·k, or |Q|·nProbe·k for residuals — still tiny) broadcast; the
    * only shuffle is the final rank exchange on query_id, already
    * WindowGroupLimit-reduced.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, m: Int, k: Int, nCells: Int,
      nProbe: Int = 1, topK: Int = 10, iters: Int = 2,
      excludeSelf: Boolean = true, residual: Boolean = false): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must be a positive multiple of m ($m)")
    require(nCells >= 1 && nProbe >= 1 && topK >= 1)
    val subLen = dim / m
    ivfPqTopKM(matVecs(corpus, vecCol, idCol, "vec_id"),
      matVecs(queries, vecCol, idCol, "query_id"),
      m, k, nCells, nProbe, topK, iters, excludeSelf, residual, subLen)
  }

  /** [[ivfPqTopK]] over pre-materialized `(vec_id|query_id, _xf)`
    * frames (see [[matVecs]]) — shared with [[ivfPqRerank]].
    */
  private def ivfPqTopKM(corpusM: DataFrame, queriesM: DataFrame,
      m: Int, k: Int, nCells: Int, nProbe: Int, topK: Int, iters: Int,
      excludeSelf: Boolean, residual: Boolean,
      subLen: Int): DataFrame = {
    // the coarse codebook is referenced twice (cell assignment + query
    // probe; three times with residuals) — materialize like the PQ ones
    val coarse = kmeansCentroids(corpusM, "_xf", "vec_id", nCells, iters,
        materialize = false)
      .localCheckpoint()
    val withCell = argminCodebook(corpusM, "_xf", coarse, "_cell")
    val probes = probeCodebook(
        queriesM.select(col("query_id"), col("_xf").as("_qf")),
        "_qf", coarse, "_cell", math.min(nProbe, nCells))
    if (!residual) {
      val pqCents = trainPqCodebooks(corpusM, m, k, iters, subLen)
      val sub = withCell.select(col("vec_id") +: col("_cell") +:
        (0 until m).map(s => subVecCol(col("_xf"), s, subLen)
          .as(s"_x$s")): _*)
      val coded = (0 until m).foldLeft(sub) { (acc, s) =>
          argminCodebook(acc, s"_x$s", pqCents(s), s"_c$s")
        }
        .select(col("vec_id") +: col("_cell") +:
          (0 until m).map(s => col(s"_c$s")): _*)
      val pairs = coded.join(
        broadcast(probes.select(col("query_id"), col("_cell"))),
        Seq("_cell"))
      adcRank(pairs, queriesM, pqCents, subLen, topK,
        excludeSelf, pairsCarryQueryId = true)
    } else {
      // residual = x − c_cell, a per-element zip_with subtract in the
      // same map-side projection as the cell assignment (the coarse
      // codeword arrives via a broadcast k-row join)
      val coarseKV = coarse.select(col("cid").as("_cell"),
        col("cv").as("_ccv"))
      // materialized ONCE: rsub feeds every PQ training (m of them,
      // 2 aggregation rounds each) AND the encoding — without this the
      // coarse argmin + residual subtract re-derives m·(2·iters)+1
      // times (the semDedup lesson, iterative-consumer form)
      val rsub = withCell.join(broadcast(coarseKV), Seq("_cell"))
        .withColumn("_r", zip_with(col("_xf"), col("_ccv"), (a, b) => a - b))
        .select(col("vec_id") +: col("_cell") +:
          (0 until m).map(s => subVecCol(col("_r"), s, subLen)
            .as(s"_x$s")): _*)
        .localCheckpoint()
      // the m residual codebooks union into one eager materialization
      // (one training job for every subspace — the trainPqCodebooks
      // shape), each reading the rsub checkpoint, not the scan
      val pqAll = (0 until m).map { s =>
        lloydFull(rsub.select(col("vec_id"), col(s"_x$s").as("_sub")),
          "_sub", "vec_id", k, iters, scaleBits = 20,
          checkpointDir = None, materialize = false)._2
          .select(lit(s).cast("int").as("_s"), col("cid"), col("cv"))
      }.reduce(_ unionByName _).localCheckpoint()
      val pqCents = (0 until m).map(s =>
        pqAll.filter(col("_s") === s).select(col("cid"), col("cv")))
      val coded = (0 until m).foldLeft(rsub) { (acc, s) =>
          argminCodebook(acc, s"_x$s", pqCents(s), s"_c$s")
        }
        .select(col("vec_id") +: col("_cell") +:
          (0 until m).map(s => col(s"_c$s")): _*)
      // the query residual is PER PROBED CELL, so the distance tables
      // carry the cell key: |Q|·nProbe·k rows per subspace — broadcast
      val qresid = probes.join(broadcast(coarseKV), Seq("_cell"))
        .withColumn("_qr", zip_with(col("_qf"), col("_ccv"), (a, b) => a - b))
      val dtabs = (0 until m).map { s =>
        qresid.select(col("query_id"), col("_cell"),
            subVecCol(col("_qr"), s, subLen).as("_q"))
          .crossJoin(broadcast(pqCents(s)))
          .select(col("query_id"), col("_cell"), col("cid").as(s"_c$s"),
            sqDist(col("_q"), col("cv")).as(s"_d$s"))
      }
      val pairs = coded.join(
        broadcast(probes.select(col("query_id"), col("_cell"))),
        Seq("_cell"))
      adcScore(pairs, dtabs, s => Seq(s"_c$s", "query_id", "_cell"),
        topK, excludeSelf)
    }
  }

  /** PQ search with exact re-ranking (Jégou et al. 2011 §V-D refine
    * step): [[pqTopK]] produces a `rerankDepth`-deep ADC shortlist per
    * query, then ONLY those candidates' raw vectors are fetched and
    * re-scored with the exact squared L2 ([[sqDist]] — the same
    * fixed-order IEEE expression every kernel shares), re-ranked to
    * `topK`. Compressed-domain recall, exact-domain precision — the
    * standard production composition when the raw vectors are still
    * reachable (e.g. parquet-resident).
    *
    * Output: `(query_id, neighbor_id, l2_dist, rank)`, rank 1..topK by
    * ascending EXACT distance, neighbor-id tie-break.
    *
    * Scale shape: the shortlist is |Q|·rerankDepth rows — broadcast
    * onto the corpus scan, so the exact-fetch join is map-side (the
    * corpus never shuffles for it); the query vectors broadcast
    * likewise; the surviving |Q|·rerankDepth scored rows hit one rank
    * exchange, WindowGroupLimit-capped at `topK`.
    */
  def pqRerank(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, m: Int, k: Int, topK: Int,
      rerankDepth: Int, iters: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    require(rerankDepth >= topK,
      s"rerankDepth ($rerankDepth) must be >= topK ($topK)")
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must be a positive multiple of m ($m)")
    val corpusM = matVecs(corpus, vecCol, idCol, "vec_id")
    val queriesM = matVecs(queries, vecCol, idCol, "query_id")
    val cands = pqTopKM(corpusM, queriesM, m, k,
        rerankDepth, iters, excludeSelf, dim / m)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(corpusM, queriesM, cands, topK)
  }

  /** The shared refine tail: exact fixed-order squared L2 over a
    * (query_id, neighbor_id) shortlist, re-ranked to `topK`. The
    * shortlist and query vectors broadcast; the corpus never shuffles
    * for the fetch; one WindowGroupLimit-capped rank exchange. Takes
    * the [[matVecs]]-materialized frames.
    */
  private def exactRerank(corpusM: DataFrame, queriesM: DataFrame,
      cands: DataFrame, topK: Int): DataFrame = {
    val nbr = corpusM.select(col("vec_id").as("neighbor_id"),
      col("_xf").as("_nv"))
    val qv = queriesM.select(col("query_id"), col("_xf").as("_qv"))
    val exact = nbr.join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        sqDist(col("_qv"), col("_nv")).as("l2_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2_dist").asc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** The full production ANN composition (Faiss-style IVFPQ + refine):
    * trained coarse cells bound the candidate set, PQ ADC ranks it in
    * the compressed domain to a `rerankDepth` shortlist, and ONLY the
    * shortlist's raw vectors pay the exact re-rank — sub-linear scan,
    * compressed scoring, exact final order. All three stages are the
    * proven kernels ([[ivfPqTopK]] → [[pqRerank]]'s refine tail), so
    * every float replays externally.
    */
  def ivfPqRerank(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, m: Int, k: Int, nCells: Int,
      nProbe: Int, topK: Int, rerankDepth: Int, iters: Int = 2,
      excludeSelf: Boolean = true,
      residual: Boolean = false): DataFrame = {
    require(rerankDepth >= topK,
      s"rerankDepth ($rerankDepth) must be >= topK ($topK)")
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must be a positive multiple of m ($m)")
    require(nCells >= 1 && nProbe >= 1 && topK >= 1)
    val corpusM = matVecs(corpus, vecCol, idCol, "vec_id")
    val queriesM = matVecs(queries, vecCol, idCol, "query_id")
    val cands = ivfPqTopKM(corpusM, queriesM, m, k,
        nCells, nProbe, rerankDepth, iters, excludeSelf, residual,
        dim / m)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(corpusM, queriesM, cands, topK)
  }

  /** SemDeDup — semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means partitions the corpus into cells so the
    * O(n²) cosine comparison never crosses a cell boundary; a vector is
    * then dropped when a LOWER-ID vector in the same cell is similar
    * above `threshold`. The "exists a lower-id similar neighbor" rule
    * (rather than the paper's sequential greedy sweep) keeps the drop
    * decision a pure semi-join: deterministic, partitioning-independent
    * and exactly replayable in external SQL.
    *
    * Output: `(vec_id, cluster, kept)` — kept ∈ {0,1}, one row per
    * non-null-vector input (null embeddings are excluded by the Lloyd
    * core — see [[kmeansAssign]]).
    *
    * 100 TB shape: the only pairwise work is an equi-join on the cell id
    * (cell occupancy ≈ N/k — scale `k` with the corpus so cells stay
    * bounded); the drop set is an aggregation of the much smaller pair
    * stream and rejoins by id. Cell assignment reuses [[kmeansAssign]]'s
    * integer-exact centroid math, so it is bit-deterministic too.
    */
  def semDedup(df: DataFrame, vecCol: String, idCol: String,
      k: Int, threshold: Double, iters: Int = 2): DataFrame = {
    // the lloyd core already carries the vector with the assignment (no
    // corpus rejoin), and the frame is referenced THREE times below
    // (both pair-join sides + the final keep join) — materialize it once
    // so the iterative k-means lineage is never re-derived per branch
    val m = lloyd(df, vecCol, idCol, k, iters, scaleBits = 20,
        checkpointDir = None)
      .select(col("vec_id"), col("cid").as("cluster"), col("x").as("_x"))
      .withColumn("_n", Vectors.dot(col("_x"), col("_x")))
      .localCheckpoint()
    val a = m.select(col("cluster"), col("vec_id").as("_ida"),
      col("_x").as("_xa"), col("_n").as("_na"))
    val b = m.select(col("cluster"), col("vec_id").as("_idb"),
      col("_x").as("_xb"), col("_n").as("_nb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("_ida") < col("_idb"))
      .filter(Vectors.cosineFromParts(Vectors.dot(col("_xa"), col("_xb")),
        col("_na"), col("_nb")) >= threshold)
      .select(col("_idb").as("vec_id")).distinct()
    m.join(dropped.withColumn("_drop", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("_drop").isNull, 1).otherwise(0).cast("int").as("kept"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * storage/bandwidth reduction step before ANN indexing at corpus
    * scale. Per-vector scale = max |x_i| (order-independent, exact);
    * `q_i = floor(x_i · 127 / scale + 0.5)` — floor of a fixed-order
    * IEEE expression, so the codes are bit-deterministic on any engine
    * (no round-half mode in sight). A zero vector quantizes to zeros.
    * Output: one row per dimension `(vec_id, pos, qval)` — integer
    * codes; reconstruct with `qval · scale / 127`.
    *
    * Scale shape: pure explode projection over the scan — no shuffle,
    * no state.
    */
  def quantizeInt8(df: DataFrame, vecCol: String,
      idCol: String): DataFrame = {
    val e = df.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("_x"))
      .withColumn("_sc", aggregate(transform(col("_x"), x => abs(x)),
        lit(0.0), (a, b) => greatest(a, b)))
    e.select(col("vec_id"), col("_sc"),
        posexplode(col("_x")).as(Seq("pos", "_xv")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        when(col("_sc") === 0.0, lit(0L))
          .otherwise(floor(col("_xv") * lit(127.0) / col("_sc") + lit(0.5))
            .cast("long")).as("qval"))
  }

  /** Embedding outlier scoring against each row's OWN stratum centroid:
    * the per-group mean embedding (the same integer-exact
    * [[centroidUpdate]] bank the Lloyd core uses, so the centroid is
    * bit-deterministic) and each vector's fixed-order squared L2 to it.
    * Rows far from their stratum prototype are mislabeled/off-domain/
    * garbage candidates — the standard embedding-space curation gate
    * after language or domain tagging.
    *
    * Output: `(vec_id, <groupCol>, l2_centroid)` — one row per
    * non-null-vector input; compose with [[graft.functions.Quantiles]]
    * for a per-group percentile cut (the q99 band-gate pattern).
    *
    * Shape for scale: one (group, dim) integer-bank aggregation
    * (map-side combined, 24-byte partials), the tiny per-group centroid
    * table broadcast back onto the scan, distance map-side. Group
    * cardinality is assumed coarse (languages/domains), like the other
    * stratum operators.
    */
  def groupCentroidDistance(df: DataFrame, vecCol: String, idCol: String,
      groupCol: String): DataFrame = {
    val e = df.filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("cid"), col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("x"))
    val cents = centroidUpdate(e, (1L << 20).toDouble)
    e.join(broadcast(cents), Seq("cid"))
      .select(col("vec_id"), col("cid").as(groupCol),
        sqDist(col("x"), col("cv")).as("l2_centroid"))
  }

  /** Per-dimension standardization (z-scoring) of an embedding column —
    * the whitening-lite preprocessing step before clustering/ANN when
    * dimensions carry wildly different scales. Statistics are banked as
    * INTEGERS (the kmeans scaled-int trick, 2^10 per element so the
    * sum of SQUARES stays exactly double-representable at corpus
    * scale): per dimension `s = Σ floor(x·2^10)` and
    * `ss = Σ floor(x·2^10)²`, both exact under any aggregation order;
    * then `mean = s/(n·2^10)`, `E[x²] = ss/(n·2^20)`,
    * `var = E[x²] − mean²` and `z = (x − mean)/√var` are a handful of
    * fixed-order IEEE ops on exactly-representable integers —
    * bit-replayable on any engine. (The statistics describe the
    * 2^-10-quantized values — a documented, deterministic definition,
    * not an approximation of some engine-dependent float sum.)
    *
    * Output: `(vec_id, pos, zval)` — one row per (vector, dimension);
    * a zero-variance dimension yields NULL `zval` (guarded before the
    * sqrt so float cancellation can never produce NaN).
    *
    * Shape for scale: one narrow aggregation shuffle (dim rows of
    * 24-byte partials — map-side combined), the dim-row stats table
    * broadcast back onto the scan, and the z projection is map-side.
    * Sums use decimal(38,0) so a 10^12-row corpus cannot overflow the
    * integer banks.
    */
  def standardize(df: DataFrame, vecCol: String,
      idCol: String): DataFrame = {
    val e = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("pos", "_xv")))
    val sx = floor(col("_xv") * lit(1024.0)).cast("long")
    val stats = e
      .select(col("pos"), sx.as("_sx"))
      .groupBy(col("pos"))
      .agg(sum(col("_sx").cast("decimal(38,0)")).as("_s"),
        // decimal(19,0) holds ANY long (19 digits), and the 38-digit
        // product of two fits decimal(38,0) exactly — an 18-digit cast
        // would NULL (and silently drop from the sum) on |x| >= ~9e14
        sum(col("_sx").cast("decimal(19,0)") *
          col("_sx").cast("decimal(19,0)")).as("_ss"),
        count(lit(1)).as("_n"))
    val m = col("_s").cast("double") /
      (col("_n").cast("double") * lit(1024.0))
    val ex2 = col("_ss").cast("double") /
      (col("_n").cast("double") * lit(1048576.0))
    val varc = ex2 - m * m
    val std = when(varc > 0.0, sqrt(varc))
    e.join(broadcast(stats.select(col("pos"), m.as("_m"), std.as("_sd"))),
        Seq("pos"))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        ((col("_xv") - col("_m")) / col("_sd")).as("zval"))
  }

  /** Recall audit — the eval harness for the approximate family: given
    * a ground-truth neighbor relation (e.g. [[bruteForceTopK]]) and an
    * approximate one (LSH/IVF/PQ, any of them), report per query
    * `(query_id, n_true, n_approx, n_overlap, recall_permille)` where
    * recall = overlap against the TRUE top-k. Queries the approximate
    * index missed entirely (empty bucket) still report, with zeros —
    * silent misses are the failure mode this audit exists to catch.
    *
    * Scale shape: one semi equi-join on (query, neighbor) plus three
    * query-keyed counts — both inputs are top-k relations (≤ k rows
    * per query), so everything here is k·|queries|-sized regardless of
    * corpus size.
    */
  def recallAudit(truth: DataFrame, approx: DataFrame,
      queryCol: String = "query_id",
      neighborCol: String = "neighbor_id"): DataFrame = {
    val t = truth.select(col(queryCol).cast("long").as("query_id"),
      col(neighborCol).cast("long").as("_n"))
    val a = approx.select(col(queryCol).cast("long").as("query_id"),
      col(neighborCol).cast("long").as("_n"))
    val overlap = t.join(a, Seq("query_id", "_n"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("_ov"))
    t.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(a.groupBy(col("query_id")).agg(count(lit(1)).as("_na")),
        Seq("query_id"), "left")
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"),
        coalesce(col("_na"), lit(0L)).as("n_approx"),
        coalesce(col("_ov"), lit(0L)).as("n_overlap"),
        expr("(coalesce(_ov, 0) * 1000) div n_true")
          .as("recall_permille"))
  }

  /** Greedy k-center (farthest-point) selection + assignment — the
    * 2-approximation of Gonzalez (TCS 1985), the coreset/diverse-subset
    * selector of Sener & Savarese (ICLR 2018): seed with the smallest
    * id, then `k−1` times pick the point FARTHEST from its nearest
    * already-chosen center (ties to smallest id), finally assign every
    * point to its nearest center. Use it to pull a maximally-spread
    * eval/labeling subset out of an embedded corpus — the opposite of
    * [[semDedup]]'s redundancy removal. Output: `(vec_id, center_id,
    * is_center)`, all integers (distances stay internal — float
    * outputs don't gate).
    *
    * Shape for scale: ZERO shuffles. Each round is one broadcast-free
    * scan — `_dmin` updates in place via `least(dmin, dist(x, newC))`
    * with the new center inlined as a literal (k·dim doubles on the
    * driver, bounded) — plus a `TakeOrderedAndProject(1)` reduction
    * for the next center; the final assignment is the same map-side
    * codegen'd argmin kernel k-means uses ([[NearestCentroid]] over a
    * k-row broadcast codebook). The `(vec_id, x, _dmin)` relation is
    * MATERIALIZED every round (the [[graft.operators.Dedup.connectedComponents]]
    * pattern: `localCheckpoint` by default, reliable `checkpoint` when
    * `checkpointDir` is given) so round r scans a flat one-projection
    * plan over the previous round's blocks — total work is k·n·d, not
    * the k²·n·d/2 an unmaterialized `withColumn` chain would
    * re-evaluate, and analyzer/codegen cost stays flat instead of
    * growing with a k-deep projection stack.
    * Distances are fixed-order double arithmetic (`dot(x,x) −
    * 2·dot(x,c) + dot(c,c)`), so winners replay bit-exactly in any
    * engine — the q155 oracle unrolls the rounds in DuckDB.
    *
    * Contract: `k` should not exceed the number of DISTINCT vectors —
    * once every point is at distance 0 from a chosen center, further
    * rounds re-pick an existing point and the center set stops
    * growing meaningfully (deterministic, but not k distinct centers).
    */
  def kCenterAssign(df: DataFrame, vecCol: String, idCol: String,
      k: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && k <= 1024, s"k must be in [1, 1024], got $k")
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    val reliable = checkpointDir.isDefined
    def mat(d: DataFrame): DataFrame =
      if (reliable) d.checkpoint() else d.localCheckpoint()
    // materialized ONCE: both the per-round scans and the final
    // assignment pass read this relation; without it every round would
    // re-run the upstream projection/filter over the source
    val e = mat(df.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("x"))
      .filter(col("x").isNotNull))
    def distTo(cv: Seq[Double]): Column = {
      val cl = typedLit(cv)
      Vectors.dot(col("x"), col("x")) -
        lit(2.0) * Vectors.dot(col("x"), cl) + lit(cv.map(v => v * v).sum)
    }
    val first = e.orderBy(col("vec_id")).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("k-center needs >= 1 vector"))
    var centers = List[(Long, Seq[Double])](
      (first.getLong(0), first.getSeq[Double](1)))
    // per-round materialization: round r's plan is ONE `least`
    // projection over round r-1's checkpointed blocks — O(k) total
    // scans and a flat plan, vs O(k²) recomputed distances and a
    // k-deep projection stack if the withColumn lineage accumulated
    var ds = mat(e.withColumn("_dmin", distTo(centers.head._2)))
    var r = 1
    while (r < k) {
      val next = ds.orderBy(col("_dmin").desc, col("vec_id").asc)
        .limit(1).select(col("vec_id"), col("x")).collect().head
      centers = (next.getLong(0), next.getSeq[Double](1)) :: centers
      ds = mat(ds.withColumn("_dmin",
        least(col("_dmin"), distTo(centers.head._2))))
      r += 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    val cents = centers.reverse.toDF("cid", "cv")
    val codebook = cents.agg(array_sort(
      collect_list(struct(col("cid"), col("cv")))).as("_cl"))
    val centerIds = centers.map(_._1)
    e.crossJoin(broadcast(codebook))
      .select(col("vec_id"),
        graft.functions.NearestCentroid.column(col("x"), col("_cl"))
          .as("center_id"),
        col("vec_id").isin(centerIds: _*).cast("int").as("is_center"))
  }
}
