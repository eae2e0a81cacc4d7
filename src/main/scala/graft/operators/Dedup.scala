package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Hashing, Text, Vectors}

/** Deduplication operators for document-scale pipelines.
  *
  * Scale notes (100 TB):
  *  - exact dedup shuffles a 8-byte fingerprint + id, never the text;
  *  - MinHash/SimHash candidate generation is a band-key equi-join —
  *    one shuffle on the band key, O(candidates) not O(n²);
  *  - verification joins re-fetch only candidate pairs' signatures.
  */
object Dedup {

  /** Exact duplicates via normalized-content fingerprint; keeps the row
    * with the smallest `idCol` per group (deterministic winner).
    *
    * Contract: `idCol` must be unique per row (and ideally non-null) —
    * with duplicate id values, every row tied at the group minimum
    * survives, because (fp, id) no longer identifies a single row.
    * Rows whose id is NULL sort after all non-null ids (`min` ignores
    * nulls), so a group of only-null ids keeps all its rows.
    *
    * Winner election shuffles only (fingerprint, id) — map-side partial
    * `min` keeps that exchange at ~16 bytes/row; the document text never
    * enters it. The final semi-join hash-distributes by (fp, id), so a
    * viral duplicate (one hot fingerprint) does not funnel every copy
    * into a single task the way a `Window.partitionBy(fp)` formulation
    * would.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val withFp = df.withColumn("_fp", Text.fingerprint(col(textCol)))
    val winners = withFp.select(col("_fp").as("_wfp"), col(idCol).as("_wid"))
      .groupBy(col("_wfp")).agg(min(col("_wid")).as("_wid"))
    // null-safe equality on BOTH legs: null-text rows form their own
    // fingerprint group, and a group whose ids are all NULL (min = NULL)
    // still keeps its rows instead of silently vanishing
    withFp.join(winners,
        withFp("_fp") <=> winners("_wfp") && col(idCol) <=> col("_wid"),
        "left_semi")
      .drop("_fp")
  }

  /** Single-pass exact dedup returning only `projCols` of each winning
    * row: winner election and projection ride the SAME aggregation
    * (`min_by` keyed on `idCol` over the projected struct), so the
    * upstream plan runs ONCE and the shuffle carries (fingerprint, id,
    * projection) — unlike [[exact]], whose semi-join evaluates the
    * upstream twice (fatal when the upstream is an expensive gate
    * pipeline: q50's regex quality/language filters). Use [[exact]]
    * when you need every input column back; use this when a narrow
    * projection is the point.
    *
    * Contract: `idCol` unique and non-null per row (ties under
    * duplicate ids would make `min_by` pick an arbitrary tied row).
    */
  def exactProject(df: DataFrame, textCol: String, idCol: String,
      projCols: Seq[String]): DataFrame = {
    val keep = (idCol +: projCols).distinct
    df.select(keep.map(col) :+ Text.fingerprint(col(textCol)).as("_fp"): _*)
      .groupBy(col("_fp"))
      .agg(min_by(struct(keep.map(col): _*), col(idCol)).as("_w"))
      .select(projCols.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Exact-duplicate groups of size > 1: (fingerprint, ids, count). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("fp", Text.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n") > 1)

  /** Drop over-crowded candidate buckets before a band self-join: a key
    * shared by more than `cap` rows (boilerplate shingles, a degenerate
    * band) would contribute a quadratic |bucket|² pair blow-up — one hot
    * band at 100 TB is an executor-killer. Capping bounds every
    * bucket's contribution at cap²; the pairs lost in a dropped band are
    * exactly the ones the other independent bands still catch.
    */
  private def capBuckets(buckets: DataFrame, keyCols: Seq[String],
      cap: Int): DataFrame =
    if (cap <= 0) buckets
    else {
      val counts = buckets.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= cap)
      buckets.join(counts, keyCols).drop("_bn")
    }

  /** MinHash + banded-LSH candidate pairs with estimated Jaccard.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated
    * across bands, filtered at `threshold`. `maxBucket` caps per-band
    * bucket size (see [[capBuckets]]).
    */
  def minhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val sigs = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", Hashing.minhashSig(col("text"), shingleK, numHashes))
      .select(col("id"), col("sig"),
        Hashing.bandKeys(col("sig"), bands, numHashes).as("bandkeys"))

    val buckets = capBuckets(
      sigs.select(col("id"), col("sig"), explode(col("bandkeys")).as("band")),
      Seq("band"), maxBucket)

    val a = buckets.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Hashing.minhashSimilarity(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** SimHash near-dup pairs within a Hamming radius. Candidate generation
    * splits the 64-bit simhash into `pieces` segments; by pigeonhole, two
    * hashes within `maxHamming < pieces` share at least one exact segment,
    * so an equi-join on (segment index, segment value) finds all pairs.
    */
  def simhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, pieces: Int = 4,
      maxBucket: Int = 1000): DataFrame =
    hammingPairs(df.select(col(idCol).as("id"),
        Hashing.simhash(col(textCol)).as("sh")),
      "sh", "id", maxHamming, pieces, maxBucket)

  /** Near-dup pairs of ANY precomputed 64-bit hash column within a
    * Hamming radius — the candidate engine behind [[simhashPairs]]
    * (text) and the q128 image near-dup (perceptual dHash,
    * [[Multimodal.dHashAssets]]). Pigeonhole banding: the hash splits
    * into `pieces` segments, two hashes within `maxHamming < pieces`
    * bits share at least one exact segment, so an equi-join on
    * (segment index, segment value) finds every true pair; `maxBucket`
    * caps degenerate buckets (0 = uncapped, oracle-parity only).
    *
    * Lineage note: the self-join evaluates the input's lineage once per
    * side — when the hash derivation is expensive (real-image dHash
    * decodes, not a text simhash), materialize it first
    * (`localCheckpoint`/persist or a written artifact) so pixels decode
    * once, not twice.
    */
  def hammingPairs(
      df: DataFrame, hashCol: String, idCol: String,
      maxHamming: Int = 3, pieces: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming < pieces, "pigeonhole needs maxHamming < pieces")
    val bitsPer = 64 / pieces
    val hashed = df.select(col(idCol).as("id"), col(hashCol).as("sh"))
    val segs = capBuckets(hashed.select(col("id"), col("sh"), explode(array(
      (0 until pieces).map { p =>
        struct(lit(p).as("seg"),
          shiftrightunsigned(col("sh"), p * bitsPer)
            .bitwiseAND(lit((1L << bitsPer) - 1)).as("segval"))
      }: _*)).as("s"))
      .select(col("id"), col("sh"), col("s.seg"), col("s.segval")),
      Seq("seg", "segval"), maxBucket)

    val l = segs.select(col("seg"), col("segval"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = segs.select(col("seg"), col("segval"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("seg", "segval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // native popcount-of-xor — no UDF in the candidate-pair loop
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Exact n-gram Jaccard over MinHash-LSH candidates: bands prune the
    * pair space, then the true Jaccard of word n-gram sets verifies.
    * Output carries the exact integer pieces (`n_inter`, `n_union`)
    * alongside the derived `jaccard` double — downstream thresholds and
    * external oracles can stay in exact integer arithmetic.
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3, threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    val prepared = capBuckets(df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("grams", Hashing.ngramHashes(col("text"), ngram))
      .withColumn("sig", Hashing.minhashSig(col("text"), 5, numHashes))
      .withColumn("band", explode(Hashing.bandKeys(col("sig"), bands, numHashes)))
      .select(col("id"), col("grams"), col("band")),
      Seq("band"), maxBucket)

    val l = prepared.select(col("band"), col("id").as("id_a"), col("grams").as("g_a"))
    val r = prepared.select(col("band"), col("id").as("id_b"), col("grams").as("g_b"))
    l.join(r, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("g_a"), col("g_b"))).cast("long").as("n_inter"),
        (size(col("g_a")) + size(col("g_b"))).cast("long").as("_sum"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("_sum") - col("n_inter")).as("n_union"))
      // two empty gram sets are identical documents: jaccard 1 by
      // convention (matches TextKernelExprs.jaccardEval)
      .withColumn("jaccard", when(col("n_union") === 0, lit(1.0))
        .otherwise(col("n_inter").cast("double") / col("n_union")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"),
        max(col("n_inter")).as("n_inter"), max(col("n_union")).as("n_union"))
  }

  /** Connected components over an undirected edge list — the cluster-
    * resolution step downstream of every pair generator above. Pairs only
    * say "a ~ b"; a retention policy needs "which cluster is each doc in"
    * so that keep-one-per-cluster is a filter. Returns `(id, cluster_id)`
    * for every node appearing in `edges`; `cluster_id` is the cluster's
    * minimum member id (a deterministic canonical representative).
    *
    * Algorithm: iterative min-label propagation with pointer-jumping.
    * Each round every node takes the minimum label over its closed
    * neighborhood — in the input graph AND across its current (node,
    * label) pointer edges, so labels hop cluster-diameter-independent
    * shortcuts and convergence is O(log n) rounds (hash-to-min family;
    * Rastogi et al., "Finding Connected Components in Map-Reduce in
    * Logarithmic Rounds"), not O(diameter).
    *
    * Scale notes (100 TB): the loop state is (id, label) — 16 bytes a
    * row, never the text; one hash shuffle per round on node id; LSH
    * pair generation upstream is bucket-capped, so |edges| = O(docs).
    * Every round checkpoints the label frame — without it the plan
    * grows by a join per iteration and the lineage blow-up kills the
    * job long before the data does (the classic iterative-Spark trap).
    * By default that is `localCheckpoint` (executor-local blocks — fast,
    * but lost on executor death); pass `checkpointDir` to write reliable
    * checkpoints to shared storage instead, the option a 1000-executor
    * run wants so one lost container doesn't restart the whole loop.
    * Convergence is checked with an O(1) label-sum signature and failure
    * to converge within `maxIter` throws rather than returning
    * half-merged clusters.
    */
  private def labelSig(labels: DataFrame): (Any, Any) = {
    val r = labels.agg(
      sum(col("cluster_id").cast("decimal(38,0)")), count(lit(1))).head()
    (r.get(0), r.get(1))
  }

  /** [[connectedComponents]]'s per-round materialization: reliable
    * `checkpoint` (into the dir bound once at operator entry) when a
    * dir was given, `localCheckpoint` otherwise.
    */
  private def materialize(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()

  /** `checkpointDir` caveat: Spark's checkpoint directory is
    * SparkContext-GLOBAL — binding it here rebinds it for the whole
    * application (concurrent jobs should pass the same dir). It is
    * bound ONCE per operator call, never per round: each
    * `setCheckpointDir` mints a fresh UUID subdirectory, so a per-round
    * rebind would scatter every round's files into its own directory.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(
      Checkpoints.bindDir(edges.sparkSession.sparkContext, _))
    val reliable = checkpointDir.isDefined
    // materialized ONCE: every round joins against sym, and without this
    // the full upstream edge derivation (LSH bucketing + pair
    // verification) re-executes O(log n) times — per-round cost must be
    // one shuffle of 16-byte (src,dst) rows, not a re-run of the pipeline
    val sym = materialize(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst"))),
      reliable)
    var labels = materialize(
      sym.groupBy(col("src")).agg(min(col("dst")).as("_m"))
        .select(col("src").as("id"),
          least(col("src"), col("_m")).as("cluster_id")),
      reliable)
    var it = 0
    var converged = false
    var curSig = labelSig(labels)
    while (!converged && it < maxIter) {
      // pointer edges (id <-> cluster_id) ride along with the data edges:
      // a node two hops from the minimum reaches it through its
      // neighbor's POINTER, halving distances every round
      val virt = labels.select(col("id").as("src"), col("cluster_id").as("dst"))
        .union(labels.select(col("cluster_id").as("src"), col("id").as("dst")))
      val allE = sym.union(virt)
      val prop = allE.join(labels, allE("dst") === labels("id"))
        .select(allE("src").as("id"), col("cluster_id"))
      val next = materialize(
        prop.union(labels)
          .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id")),
        reliable)
      // labels are monotone non-increasing per node, so an unchanged
      // label SUM means a fixed point — an O(1) driver compare instead
      // of a per-round diff join (decimal sum: no BIGINT overflow at
      // any node count)
      val nextSig = labelSig(next)
      converged = nextSig == curSig
      curSig = nextSig
      labels = next
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (O(log n) rounds suffice for any graph)")
    labels
  }

  /** Embedding near-duplicate pairs: LSH sign-bucket candidates verified
    * by exact cosine. `dim` is the embedding dimension; `nPlanes` planes
    * give 2^nPlanes buckets.
    */
  /** `maxBucket` caps bucket size as in [[capBuckets]]; 0 disables it —
    * callers with an exact external oracle (q26) keep it off, scale
    * deployments set it to bound the worst bucket.
    */
  def embeddingPairs(
      df: DataFrame, vecCol: String, idCol: String, dim: Int,
      threshold: Double = 0.95, nPlanes: Int = 8,
      maxBucket: Int = 0): DataFrame = {
    val withBucket = capBuckets(
      df.select(col(idCol).as("id"), col(vecCol).as("v"))
        .withColumn("bucket", Vectors.signBuckets(col("v"), dim, nPlanes))
        .withColumn("n2", Vectors.dot(col("v"), col("v"))),
      Seq("bucket"), maxBucket)
    val l = withBucket.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("n2").as("n2_a"))
    val r = withBucket.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("n2").as("n2_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Vectors.cosineFromParts(Vectors.dot(col("v_a"), col("v_b")),
          col("n2_a"), col("n2_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cosine")).as("cosine"))
  }

  /** Retention election downstream of [[connectedComponents]]: one
    * winner per cluster by highest `qualityCol` (ties to the lowest
    * `idCol` — fully deterministic). Returns every member row with a
    * 0/1 `keep` flag, so "drop near-duplicates, keep the best copy" is
    * a filter on the result.
    *
    * Shape for scale: a single rank window over the cluster hash
    * partitioning — one shuffle of (id, cluster, quality) triples,
    * never the documents; no self-join of the member relation. Cluster
    * sizes are bounded by the upstream pair generators' bucket caps,
    * so no window partition is pathological.
    */
  def electRetention(members: DataFrame, idCol: String, clusterCol: String,
      qualityCol: String): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    members.withColumn("keep", (row_number().over(w) === 1).cast("int"))
  }

  /** Incremental exact dedup — the continuous-ingestion form: a new
    * batch is deduplicated against the accumulated HISTORY of content
    * fingerprints (8 bytes per document ever seen, not the documents
    * themselves) plus within itself. `is_new` = no historical row had
    * this content; `kept` = is_new AND first-in-batch (lowest id) among
    * the batch's own duplicates — so appending `kept = 1` rows'
    * fingerprints to the history preserves the invariant across
    * batches.
    *
    * Output: `(id, fp, is_new, kept)` — one row per batch row.
    *
    * Shape for scale: the batch reduces to (id, fp) scan-side; the
    * history join is a fingerprint-key hash join (deliberately NOT a
    * broadcast — the history grows with the corpus); the in-batch
    * election is an associative min aggregate, never a window. Text
    * never shuffles.
    */
  def incrementalExact(batch: DataFrame, historyFp: DataFrame,
      textCol: String, idCol: String,
      fpCol: String = "fp"): DataFrame = {
    val b = batch.select(col(idCol).cast("long").as("id"),
      graft.functions.Text.fingerprint(col(textCol)).as("fp"))
    val hist = historyFp.select(col(fpCol).cast("long").as("fp"))
      .distinct().withColumn("_seen", lit(1))
    val winners = b.groupBy(col("fp")).agg(min(col("id")).as("_mid"))
    b.join(hist, Seq("fp"), "left")
      .join(winners, Seq("fp"))
      .select(col("id"), col("fp"),
        when(col("_seen").isNull, 1).otherwise(0).cast("int").as("is_new"),
        (col("_seen").isNull && col("id") === col("_mid"))
          .cast("int").as("kept"))
  }

  /** The history artifact for [[incrementalExactBloom]]: the batch's
    * distinct content fingerprints OR-folded into ONE bloom row
    * (`mBits` bits total, however many documents) — the constant-size
    * alternative to the exact fingerprint set. Merge-order independent
    * (bitwise OR), so histories from many batches combine by
    * re-aggregating their blooms.
    */
  def bloomHistory(df: DataFrame, textCol: String,
      mBits: Int = graft.functions.Bloom.DefaultBits,
      k: Int = graft.functions.Bloom.DefaultK): DataFrame =
    df.select(graft.functions.Text.fingerprint(col(textCol)).as("fp"))
      .agg(graft.functions.Bloom.agg(col("fp"), mBits, k).as("bits"))

  /** [[incrementalExact]] with a CONSTANT-SIZE history — the memory/
    * exactness trade a 100 TB ingest can choose: the history is one
    * [[bloomHistory]] row (KBs) instead of 8 bytes per distinct
    * fingerprint (TB-scale corpora have billions). The cost is
    * DETERMINISTIC false positives: a genuinely-new document whose
    * fingerprint hits all `k` set bits flags as already-seen and drops
    * (never the reverse — no false negatives, the dedup guarantee
    * direction survives). Output matches [[incrementalExact]]:
    * `(id, fp, is_new, kept)`.
    *
    * Shape for scale: the bloom broadcasts (one row); the probe is
    * map-side; only the batch-internal winner election shuffles
    * `(fp, id)`.
    */
  def incrementalExactBloom(batch: DataFrame, historyBloom: DataFrame,
      textCol: String, idCol: String,
      k: Int = graft.functions.Bloom.DefaultK): DataFrame = {
    val b = batch.select(col(idCol).cast("long").as("id"),
      graft.functions.Text.fingerprint(col(textCol)).as("fp"))
    val winners = b.groupBy(col("fp")).agg(min(col("id")).as("_mid"))
    b.join(winners, Seq("fp"))
      .crossJoin(broadcast(historyBloom.select(col("bits"))))
      .select(col("id"), col("fp"),
        (!graft.functions.Bloom.mightContain(col("bits"), col("fp"), k))
          .cast("int").as("is_new"),
        (!graft.functions.Bloom.mightContain(col("bits"), col("fp"), k) &&
          col("id") === col("_mid")).cast("int").as("kept"))
  }

  /** MinHash signatures as a persistable artifact: `(id, sig)` — the
    * 8·numHashes-byte row a continuous-ingestion pipeline appends for
    * every retained document, so future batches can near-dup against
    * history WITHOUT the historical text (band keys re-derive from the
    * signature alone).
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, numHashes: Int = 64): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      Hashing.minhashSig(col(textCol), shingleK, numHashes).as("sig"))

  /** Incremental NEAR-dup dedup — [[incrementalExact]]'s fuzzy
    * companion: a new batch is LSH-banded against the accumulated
    * history of [[minhashSignatures]] (signatures, not text) plus
    * within itself. `hist_jaccard` = the best estimated Jaccard against
    * any historical signature sharing a band bucket (NULL if none);
    * `is_new` = no history match at ≥ `threshold`; `kept` = is_new AND
    * no in-batch near-partner with a lower id (the greedy min-id
    * election) — so appending `kept = 1` rows' signatures to the
    * history preserves the invariant across batches.
    *
    * Output: `(id, hist_jaccard, is_new, kept)` — one row per batch row.
    *
    * Shape for scale: both sides reduce to (band, id, sig) — the text
    * never shuffles; candidate generation is a per-band bucket
    * equi-join with the same `maxBucket` cap as [[minhashPairs]]
    * (`maxBucket = 0` disables capping — oracle/test use only); the
    * history side is a hash join, deliberately NOT broadcast (history
    * grows with the corpus); elections are associative max/min
    * aggregates, never windows.
    */
  def incrementalMinhash(batch: DataFrame, historySig: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 5,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.8,
      maxBucket: Int = 1000, sigCol: String = "sig",
      histIdCol: String = "id"): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    def banded(sigs: DataFrame, idc: String): DataFrame = {
      val e = sigs.withColumn("band",
        explode(Hashing.bandKeys(col(sigCol), bands, numHashes)))
      if (maxBucket > 0)
        capBuckets(e.select(col(idc), col(sigCol), col("band")),
          Seq("band"), maxBucket)
      else e
    }
    val b = banded(
      minhashSignatures(batch, textCol, idCol, shingleK, numHashes), "id")
    val h = banded(historySig.select(col(histIdCol).cast("long").as("_hid"),
        col(sigCol).as(sigCol)), "_hid")
      .withColumnRenamed(sigCol, "_hsig")
    // best history match per batch doc (band-bucket candidates only)
    val histBest = b.join(h, Seq("band"))
      .select(col("id"),
        Hashing.minhashSimilarity(col(sigCol), col("_hsig")).as("_j"))
      .groupBy(col("id")).agg(max(col("_j")).as("hist_jaccard"))
    // in-batch: does a near-partner with a lower id exist?
    val a2 = b.select(col("band"), col("id").as("_ida"), col("sig").as("_siga"))
    val beaten = b.join(a2, Seq("band"))
      .filter(col("_ida") < col("id"))
      .filter(Hashing.minhashSimilarity(col("sig"), col("_siga"))
        >= threshold)
      .select(col("id")).distinct().withColumn("_beaten", lit(1))
    batch.select(col(idCol).cast("long").as("id"))
      .join(histBest, Seq("id"), "left")
      .join(beaten, Seq("id"), "left")
      .select(col("id"), col("hist_jaccard"),
        (col("hist_jaccard").isNull ||
          col("hist_jaccard") < threshold).cast("int").as("is_new"),
        ((col("hist_jaccard").isNull ||
            col("hist_jaccard") < threshold) && col("_beaten").isNull)
          .cast("int").as("kept"))
  }

  /** Cross-source duplication matrix — the data-card audit for "which
    * sources copy from each other": for every unordered source pair,
    * the number of DISTINCT content fingerprints present in both. High
    * off-diagonal counts mean a mirror/scrape relationship, which
    * inflates mixture weights and leaks across splits.
    * Output: `(src_a, src_b, n_shared)`, `src_a <= src_b`; the DIAGONAL
    * rows carry each source's DISTINCT content count (the normalizer
    * for overlap coefficients — off-diagonal/min(diagonals) is the
    * containment ratio); zero-overlap off-diagonal pairs are omitted.
    *
    * Shape for scale: the corpus reduces scan-side to DISTINCT
    * (source, fingerprint) 16-byte rows; the self-join is a
    * fingerprint-key hash join whose fan-out is bounded by sources per
    * fingerprint (≤ |sources|), and the matrix aggregate is tiny.
    */
  def crossSourceDupMatrix(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    // both self-join sides read this relation — materialize so the
    // corpus scan + distinct aggregation run once
    val fps = df.select(col(groupCol).as("_g"),
        graft.functions.Text.fingerprint(col(textCol)).as("fp"))
      .distinct()
      .localCheckpoint()
    val a = fps.select(col("fp"), col("_g").as("src_a"))
    val b = fps.select(col("fp"), col("_g").as("src_b"))
    a.join(b, Seq("fp"))
      .filter(col("src_a") <= col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Leakage-safe train/val/test split: near-duplicate CLUSTERS are the
    * split unit, not documents — a near-dup pair straddling train and
    * test is silent evaluation leakage, the exact failure class
    * benchmark decontamination exists to prevent, reintroduced by a
    * per-document split. [[connectedComponents]] resolves the edge list
    * to clusters, singletons are their own cluster, and
    * [[TextOps.splitAssign]]'s per-mille hash decides each CLUSTER's
    * split; every member inherits it.
    *
    * Output: `(id, cluster_id, split)` — one row per input row.
    *
    * The per-mille proportions apply to CLUSTERS, not documents — the
    * price of leakage safety. With near-dup clusters of typical size
    * the document ratios track closely; a boilerplate mega-cluster
    * (one template = a large corpus fraction) lands whole in ONE
    * split and skews document counts. Audit cluster sizes first
    * (e.g. [[connectedComponents]] + a count) and drop or cap
    * degenerate clusters before splitting.
    *
    * Shape for scale: the cluster resolution is the proven O(log n)
    * pointer-jumping loop over 16-byte rows; the split assignment is a
    * scan-side projection over the (much smaller) distinct-cluster
    * relation; members rejoin on cluster_id — one narrow shuffle (or a
    * broadcast when the cluster relation is small enough for Catalyst
    * to pick one).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, splits: Seq[(String, Int)],
      checkpointDir: Option[String] = None): DataFrame = {
    val clusters = connectedComponents(pairs, aCol, bCol,
      checkpointDir = checkpointDir)
    val members = df.select(col(idCol).cast("long").as("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    val reps = members.select(col("cluster_id")).distinct()
    val csplit = TextOps.splitAssign(reps, "cluster_id", splits)
      .select(col("id").as("cluster_id"), col("split"))
    members.join(csplit, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("split"))
  }

  /** Cluster-size histogram of a cluster assignment — the dedup
    * data-card stat ("how much of the corpus sits in 2-member dup
    * pairs vs 1000-member boilerplate blobs"). Input: any relation
    * with one row per member and a cluster column (e.g.
    * [[connectedComponents]] output with singletons coalesced in).
    * Output: `(cluster_size, n_clusters, n_docs)`.
    *
    * Shape for scale: two keyed hash aggregations — members →
    * per-cluster sizes (the relation that exists anyway wherever
    * retention runs), sizes → the ≤max-size histogram.
    */
  def clusterSizeProfile(assignments: DataFrame,
      clusterCol: String): DataFrame =
    assignments.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** Right-to-be-forgotten history purge — the compliance operation a
    * continuous-ingest corpus needs when documents must be DELETED:
    * remove from the accumulated fingerprint history every fingerprint
    * the deleted content contributed, EXCEPT those the surviving
    * corpus still contains (a fingerprint shared with legitimate
    * surviving content stays — dropping it would re-admit duplicates
    * of text the corpus still holds). Works on any fingerprint-history
    * tier ([[incrementalExact]]'s content fps,
    * [[graft.operators.TextOps.lineFingerprints]],
    * [[graft.operators.TextOps.substringFingerprints]]) — callers pass
    * the already-fingerprinted relations.
    *
    * The RTBF invariant this creates: re-ingesting the deleted content
    * against the purged history flags it NEW again (unless shared with
    * survivors) — the forgotten text is genuinely forgotten, which the
    * spec proves end-to-end through [[incrementalExact]].
    *
    * Shape for scale: three fingerprint-keyed set operations on 8-byte
    * rows (distinct + two anti joins); computing the survivor
    * fingerprint set is intrinsically a surviving-corpus scan — you
    * cannot know a fingerprint is EXCLUSIVE to deleted content without
    * consulting what survives.
    *
    * Per-DOC history tiers ([[minhashSignatures]] rows keyed by id)
    * need no set algebra: purge those by filtering the deleted ids
    * out — a signature row belongs to exactly one document.
    */
  def purgeHistory(historyFp: DataFrame, deletedFp: DataFrame,
      survivorFp: DataFrame, fpCol: String = "fp"): DataFrame = {
    val del = deletedFp.select(col(fpCol).as("fp")).distinct()
    val sur = survivorFp.select(col(fpCol).as("fp")).distinct()
    val removable = del.join(sur, Seq("fp"), "left_anti")
    historyFp.select(col(fpCol).as("fp")).distinct()
      .join(removable, Seq("fp"), "left_anti")
  }

  /** Pair-level recall/precision audit of the MinHash-LSH near-dup
    * detector ([[minhashPairs]]) against EXACT shingle-set Jaccard
    * ground truth — the dedup family's eval harness (the
    * [[Similarity.recallAudit]] pattern): did the banding/signature
    * configuration actually catch the true near-duplicate pairs?
    * Returns ONE summary row `(n_true, n_cand, n_hit, recall_permille,
    * precision_permille)`: true pairs (exact Jaccard ≥ `threshold`),
    * candidate pairs the LSH surfaced at the same estimated threshold,
    * their overlap, and the derived rates. `recall_permille` < 1000
    * means the band structure misses true near-dups (too few bands for
    * the threshold); `precision_permille` < 1000 means the signature
    * over-estimates (too few hashes).
    *
    * Ground truth is brute-force all-pairs over `df` — an EVAL SAMPLE
    * the caller bounds (hundreds to low thousands of docs), exactly
    * like [[Similarity.bruteForceTopK]]; the audited production
    * operator stays banded. The sample side broadcasts; exact Jaccard
    * runs on the same sorted-distinct shingle-hash sets the signatures
    * sketch, via one codegen'd merge-intersection per pair.
    */
  def minhashRecallAudit(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, numHashes: Int = 8, bands: Int = 2,
      threshold: Double = 0.5, maxBucket: Int = 0): DataFrame = {
    val sh = df.select(col(idCol).cast("long").as("id"),
      graft.functions.TextKernelExprs.charShingleHashes(
        coalesce(col(textCol), lit("")), shingleK).as("_sh"))
    val truth = sh.select(col("id").as("id_a"), col("_sh").as("_sa"))
      .crossJoin(broadcast(
        sh.select(col("id").as("id_b"), col("_sh").as("_sb"))))
      .filter(col("id_a") < col("id_b"))
      .filter(Hashing.jaccard(col("_sa"), col("_sb")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val cand = minhashPairs(df, textCol, idCol, shingleK, numHashes,
        bands, threshold, maxBucket)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
    val hits = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        expr("(n_hit * 1000) div greatest(n_true, 1)")
          .as("recall_permille"),
        expr("(n_hit * 1000) div greatest(n_cand, 1)")
          .as("precision_permille"))
  }

  /** Template-cluster mining — the dedup tier exact matching misses:
    * machine-generated pages that differ ONLY in their slot values
    * ("user 4711 logged in from host10.3"). The shape key is the
    * normalized text with every digit run collapsed to `#`; docs
    * sharing a shape form a cluster, and a cluster whose RAW contents
    * differ is a live template (`is_template = 1` — slots vary),
    * versus an exact-dup group that merely collapsed with its digits
    * (`is_template = 0`). Output: one row per ≥2-member cluster —
    * `(rep_id, n_docs, n_distinct, is_template)`, rep = smallest id.
    *
    * Scale shape: shape and content both reduce to 64-bit fingerprints
    * scan-side — the aggregation shuffles (shape_fp, content_fp, id)
    * triples, never text; one hash aggregation keyed by shape_fp (the
    * distinct-content count is the standard two-level expand, still
    * shape-keyed).
    */
  def templateClusters(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val norm = lower(regexp_replace(trim(coalesce(col(textCol), lit(""))),
      "\\s+", " "))
    val shape = regexp_replace(norm, "[0-9]+", "#")
    df.select(col(idCol).cast("long").as("id"),
        Text.fingerprintOfNormalized(shape).as("_sfp"),
        Text.fingerprintOfNormalized(norm).as("_cfp"))
      .groupBy(col("_sfp"))
      .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n_docs"),
        countDistinct(col("_cfp")).as("n_distinct"))
      .filter(col("n_docs") >= 2)
      .select(col("rep_id"), col("n_docs"), col("n_distinct"),
        (col("n_distinct") > 1).cast("int").as("is_template"))
  }
}
