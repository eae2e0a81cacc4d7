package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level text operators for training-data curation, beyond the
  * per-column primitives in [[graft.functions.Text]]: repetition quality
  * signals, PII redaction, deterministic stratified sampling, and
  * benchmark decontamination.
  *
  * All four are pure declarative compositions (projections + hash
  * aggregations + one broadcast join), so Catalyst keeps filters and
  * column pruning working through them and nothing here caps at any
  * scale factor.
  */
object TextOps {

  /** Shared word tokenization: lowercase, collapse whitespace, split on
    * single spaces (the q20/q21 convention — reproducible in any engine
    * as `regexp_split_to_array(regexp_replace(lower(trim(t)),'\s+',' '),' ')`).
    */
  def words(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Repetition quality signals (Gopher-style filters, word-level):
    * `(id, n_words, n_distinct_words, top_word_count, top_bigram_count)`.
    * Downstream filters drop documents whose top word/bigram fraction is
    * too high (boilerplate, keyword stuffing, templated spam).
    *
    * Shape for scale: explode → two-level hash aggregation. The first
    * groupBy on (id, token) does map-side partial counting, so the
    * shuffle carries (id, token, partial-count) — bounded by the
    * distinct-token count per partition, not the token count; the
    * second groupBy reduces to one row per document. No window
    * functions, no per-document sorting.
    */
  def repetitionStats(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), words(col(textCol)).as("_toks"))
    val wordStats = base
      .select(col("id"), explode(col("_toks")).as("_w"))
      .groupBy(col("id"), col("_w")).agg(count(lit(1)).as("_c"))
      .groupBy(col("id")).agg(
        sum(col("_c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("_c")).as("top_word_count"))
    // guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty —
    // a 1-token document must yield an empty bigram array explicitly
    val n = size(col("_toks"))
    val bigrams = when(n < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), n - 1),
        i => concat_ws(" ", element_at(col("_toks"), i),
          element_at(col("_toks"), i + 1))))
    val bigramStats = base
      .select(col("id"), explode(bigrams).as("_b"))
      .groupBy(col("id"), col("_b")).agg(count(lit(1)).as("_c"))
      .groupBy(col("id")).agg(max(col("_c")).as("top_bigram_count"))
    // left join: a 0/1-word document has no bigrams
    wordStats.join(bigramStats, Seq("id"), "left")
      .select(col("id"), col("n_words"), col("n_distinct_words"),
        col("top_word_count"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"))
  }

  /** Conservative PII patterns: email addresses and international-ish
    * phone numbers. Both stay inside the regex subset that Java
    * (Spark) and RE2-style engines (DuckDB, Go) interpret identically —
    * no backreferences, no lookaround — so external oracles replicate
    * the redaction byte-for-byte.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** Occurrence counts per pattern (LongType). */
  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"))

  /** Text with emails → `<EMAIL>` and phones → `<PHONE>`. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Deterministic stratified sampling: keep a per-stratum fraction of
    * rows chosen by a splitmix64 hash of the id — the same rows survive
    * on every engine, every run, any partitioning (vs `df.sample`,
    * whose selection depends on partition layout). Rates are per-mille
    * so the whole predicate stays in exact integer math.
    *
    * At scale this is a scan-side filter: no shuffle, no state; the
    * avalanche mix decorrelates the keep-set from id locality, so
    * sequential-id blocks don't all land in (or out of) the sample.
    * The `>>> 12` drops sign before the modulus — the 52-bit value is
    * identical under JVM signed longs and an unsigned-64 oracle.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratePerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val bucket = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")), 12) % 1000
    val rate = ratePerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Deterministic weighted sampling: keep each row with probability
    * proportional to `weightCol` (capped at 1) — the data-mixing /
    * temperature-sampling primitive (upweight long or high-quality
    * documents without a shuffle). Keep iff
    * `(mix64(id) >>> 12) % 1e6 < weight · perMillionPerUnit` — exact
    * integer math, so the survivor set is engine-, run- and
    * partitioning-independent, and a scan-side filter at any scale.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      perMillionPerUnit: Long): DataFrame = {
    val bucket = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")), 12) % 1000000L
    // NULL weight → weight 0 → dropped. Explicit, because `least`
    // IGNORES nulls (least(1e6, null) = 1e6 would keep every null-weight
    // row), and engines disagree on least-vs-NULL semantics.
    df.filter(bucket <
      least(lit(1000000L), coalesce(col(weightCol), lit(0L)) * perMillionPerUnit))
  }

  /** Deterministic per-stratum top-k sample: the k rows with the
    * smallest avalanche hash of the id win — a fixed-size "reservoir"
    * whose membership is engine-, run- and partitioning-independent
    * (hash-order statistics replace random state). `sample_rank` is the
    * 1-based position within the stratum.
    *
    * Scale shape: the rank-limit filter triggers Catalyst's
    * WindowGroupLimit pushdown (Spark 3.5+), so each map task keeps only
    * its local top-k per stratum BEFORE the shuffle — the exchange
    * carries O(strata · k · tasks) rows, not the corpus. The `>>> 12`
    * shift keeps the sort key nonnegative so signed-JVM and
    * unsigned-HUGEINT oracles order identically.
    */
  def topKSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    val key = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")), 12)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(key.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Per-document salient terms: top-k words by tf·idf, the keyword /
    * topic-tagging primitive. Like [[bm25Rank]], the idf is the ln-free
    * ODDS form `(N - df + 0.5) / (df + 0.5)` — stopwords (df ≈ N) score
    * near zero without a stopword list, and the score is one multiply +
    * one divide over a fixed-order IEEE expression, so the doubles are
    * bit-exact on any engine.
    *
    * Scale shape: explode → (id, term) hash agg with map-side partial
    * counts; document frequencies reduce the SAME relation again (terms,
    * not tokens, cross the second exchange); N rides in as a broadcast
    * scalar. The per-doc top-k rank-limit triggers WindowGroupLimit, so
    * each map task keeps k rows per doc before the final shuffle.
    */
  def salientTerms(df: DataFrame, textCol: String, idCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(words(col(textCol))).as("term"))
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // the `tf >= 1` guard is always true (count of an existing group) but
    // Catalyst can't prove it, so the df branch keeps consuming the tf
    // column — WITHOUT it column pruning rewrites this branch's aggregate
    // to keys-only, the two tf subtrees stop being identical, and
    // ReuseExchange can no longer share the tokenize+explode+count work
    // between the score join and this derivation. This is deliberately
    // optimizer-steering and therefore Spark-version-sensitive: the
    // TextOpsSpec plan assertion is the canary — if an upgrade learns to
    // fold the predicate, switch to materializing `tf` (persist), which
    // trades block-store pressure for version-independence.
    val dfreq = tf.filter(col("tf") >= 1)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf").cast("double") *
          (col("n_docs").cast("double") - col("df").cast("double")
            + lit(0.5))) /
        (col("df").cast("double") + lit(0.5)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Inverted-index export: one row per term with its document
    * frequency and a CAPPED posting list (the `maxPostings` lowest doc
    * ids, ascending, comma-joined) — the serving artifact downstream of
    * [[bm25Rank]] scoring. The cap is the scale guard: a stopword's
    * postings would otherwise be a corpus-sized array in one row; `df`
    * still counts ALL postings, so cap truncation is visible, never
    * silent.
    *
    * Scale shape — skew is the enemy here: a stopword's posting set is
    * corpus-sized, and a naive rank window would sort ALL of it in one
    * task. Instead the cap runs as a `rank <= maxPostings` FILTER so
    * Catalyst's WindowGroupLimit keeps at most `maxPostings` rows per
    * term PER MAP TASK before the exchange (the window task then sees
    * O(cap · tasks), never O(corpus)); `df` comes from a plain hash
    * aggregation over the same distinct (term, id) relation, whose
    * exchange is shared (ReusedExchange — both branches, plan-asserted).
    * The posting string is deterministic (ascending ids), so the export
    * is engine- and partitioning-independent.
    */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
      maxPostings: Int): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    val pairs = df.select(col(idCol).cast("long").as("id"),
        explode(words(col(textCol))).as("term"))
      .distinct()
    val dfreq = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("id").asc)
    val capped = pairs.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= maxPostings)
      .groupBy(col("term"))
      .agg(array_join(transform(array_sort(collect_list(col("id"))),
        x => x.cast("string")), ",").as("postings"))
    dfreq.join(capped, Seq("term"))
  }

  /** Deterministic mixture rebalancing: downsample each stratum so the
    * OUTPUT hits target per-mille proportions (the data-mixing step —
    * e.g. "40‰ code, 300‰ web, …" — computed from observed counts, no
    * trial-and-error rates). The total is maximized subject to every
    * stratum supplying its share from what it has:
    * `T = min_s floor(observed_s · 1000 / share_s)`, then stratum `s`
    * keeps `floor(T · share_s / 1000)` rows in expectation via the
    * mix64 keep-predicate. All integer math end-to-end.
    *
    * Output: input rows + `kept` flag (audit-friendly; filter on kept=1
    * to materialize). Rows whose stratum is absent from the share map
    * get kept=0; a share-map stratum with zero observed rows forces
    * T = 0 (the mixture is unsatisfiable — loud, not skewed). Scale
    * shape: one tiny count-per-stratum aggregate broadcast back into a
    * scan-side filter — the corpus itself never shuffles.
    */
  def rebalanceMixture(df: DataFrame, idCol: String, stratumCol: String,
      sharePerMille: Map[String, Int]): DataFrame = {
    require(sharePerMille.nonEmpty && sharePerMille.values.sum == 1000,
      s"shares must sum to 1000, got $sharePerMille")
    require(sharePerMille.values.forall(_ > 0), s"empty share: $sharePerMille")
    val session = df.sparkSession
    import session.implicits._
    // shares enter as their own relation so a target stratum with ZERO
    // observed rows still participates in the min — it forces T = 0
    // (nothing can honor the mixture), rather than being silently
    // dropped from the constraint and skewing the output proportions
    val shares = sharePerMille.toSeq
      .toDF(stratumCol, "_share_i")
      .select(col(stratumCol), col("_share_i").cast("long").as("_share"))
    // ≤ strata rows, but referenced by BOTH `total` and `rates`:
    // materialize so the corpus count-aggregation pass runs once
    val counts = shares.join(
        df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_obs0")),
        Seq(stratumCol), "left")
      .select(col(stratumCol), col("_share"),
        coalesce(col("_obs0"), lit(0L)).as("_obs"))
      .localCheckpoint()
    // T = min over strata of floor(obs * 1000 / share): scalar aggregate
    val total = counts.agg(
      min(expr("(_obs * 1000) DIV _share")).as("_t"))
    val rates = counts.filter(col("_obs") > 0L)
      .crossJoin(broadcast(total))
      .select(col(stratumCol),
        // keep-rate per million: floor(floor(T*share/1000) * 1e6 / obs)
        expr("((((_t * _share) DIV 1000) * 1000000) DIV _obs)").as("_rpm"))
    // op-specific salt (like splitAssign's): the keep-predicate must not
    // share a hash stream with weightedSample/stratifiedSample, or
    // composing them correlates the survivor sets and bends the mixture
    val bucket = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(
        col(idCol).cast("long") + lit(777767777L)), 12) % 1000000L
    df.join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("kept",
        (col("_rpm").isNotNull && bucket < col("_rpm")).cast("int"))
      .drop("_rpm")
  }

  /** Temperature-based mixture sampling (the multilingual `p^α` rule —
    * Conneau & Lample 2019, mT5): downsample so the OUTPUT stratum
    * shares follow `p_i^α / Σ p_j^α` for observed shares `p_i`, with
    * `α = alphaPerMille/1000 ∈ (0, 1]`. Unlike [[rebalanceMixture]],
    * the targets are DERIVED from the data (flattened toward uniform as
    * α → 0), not supplied. Downsampling-only: the rarest stratum keeps
    * everything (`rate 1`), stratum `i` keeps
    * `floor(1e6 · exp((α−1) · ln(n_i / n_min)))` per million via its
    * own salted mix64 stream. `α = 1000‰` keeps every row.
    *
    * Output: input rows + `kept` flag; rows with a NULL stratum get
    * `kept = 0` (like [[rebalanceMixture]]'s absent strata).
    *
    * Scale shape: one tiny per-stratum count aggregate, the 1-row
    * `n_min` broadcast into the ≤strata-row rate table, rates broadcast
    * back into a scan-side predicate — the corpus never shuffles.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      alphaPerMille: Int): DataFrame = {
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    val am1 = lit(alphaPerMille.toDouble / 1000.0 - 1.0)
    // ≤ strata rows, but referenced by BOTH `nmin` and `rates`:
    // materialize so the corpus count-aggregation pass runs once
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("_obs"))
      .localCheckpoint()
    val nmin = counts.agg(min(col("_obs")).as("_nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(stratumCol),
        floor(exp(am1 * log(col("_obs").cast("double") /
            col("_nmin").cast("double"))) * lit(1000000.0))
          .cast("long").as("_rpm"))
    // op-specific salt (the splitAssign/rebalanceMixture rule): never
    // share a hash stream with the other deterministic-sampling ops
    val bucket = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(
        col(idCol).cast("long") + lit(151515157L)), 12) % 1000000L
    df.join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("kept",
        (col("_rpm").isNotNull && bucket < col("_rpm")).cast("int"))
      .drop("_rpm")
  }

  /** Chunk-level dedup REBUILD: the companion to [[chunkDedupStats]]
    * that actually emits the deduplicated corpus — each document's text
    * reassembled from only the chunks it is the corpus-wide first to
    * contribute (same first-occurrence election: minimum (id, chunk_idx)
    * per fingerprint). Output: `(id, text_dedup, n_kept)`; a fully
    * duplicated document comes back as the empty string.
    *
    * Scale shape: two shuffles, each carrying every surviving chunk's
    * text exactly once — the election keeps the winner's text via
    * `min(struct(id, idx, text))` (the (id, idx) prefix is unique, so
    * the text never influences the ordering), and the rebuild regroups
    * winners by document. There is no join back against the full chunk
    * relation.
    */
  /** Shared chunk relation behind [[chunkDedupStats]],
    * [[chunkDedupRebuild]] and [[slidingChunks]]: normalize-split words,
    * stride-spaced starts, fixed-width slices →
    * `(id, chunk_idx, n_words, chunk_text)`. The empty-doc guard is
    * load-bearing: `sequence(1, 0)` is DESCENDING in Spark, not empty.
    */
  private def chunkRelation(df: DataFrame, textCol: String, idCol: String,
      width: Int, stride: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), words(col(textCol)).as("_toks"))
    val n = size(col("_toks"))
    val starts = when(n < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), n, lit(stride)))
    base.select(col("id"), col("_toks"), explode(starts).as("_st"))
      .select(col("id"),
        (((col("_st") - 1) / stride).cast("long")).as("chunk_idx"),
        size(slice(col("_toks"), col("_st"), lit(width)))
          .cast("long").as("n_words"),
        concat_ws(" ", slice(col("_toks"), col("_st"), lit(width)))
          .as("chunk_text"))
  }

  /** Overlapping-window duplication statistics: like
    * [[chunkDedupStats]] but over SLIDING windows, so a copied span is
    * caught even when it is shifted relative to chunk boundaries (the
    * failure mode of disjoint chunking — a one-word insertion up front
    * desynchronizes every 50-word chunk, while a stride-`s` window
    * re-synchronizes within `s` words). Only full-width windows
    * fingerprint (tails would trivially collide). Output:
    * `(id, n_windows, n_owned)` — `n_owned` counts windows this doc is
    * the corpus-wide first (minimum (id, chunk_idx)) to contribute;
    * `1 - n_owned/n_windows` is the doc's duplicated-span exposure.
    *
    * Scale shape: identical to [[chunkDedupStats]] — the election
    * shuffles (fingerprint, id, idx) only, ~overlap× more rows
    * (width/stride), never the text.
    */
  def windowDupStats(df: DataFrame, textCol: String, idCol: String,
      windowWords: Int = 30, strideWords: Int = 10): DataFrame = {
    require(windowWords >= 1 && strideWords >= 1 &&
      strideWords <= windowWords,
      s"need 1 <= stride <= window, got $windowWords/$strideWords")
    val chunks = chunkRelation(df, textCol, idCol, windowWords, strideWords)
      .filter(col("n_words") === windowWords)
      .select(col("id"), col("chunk_idx"),
        graft.functions.TextKernelExprs.polyHash(col("chunk_text"))
          .as("_fp"))
    val owned = chunks.groupBy(col("_fp"))
      .agg(min(struct(col("id"), col("chunk_idx"))).as("_w"))
      .groupBy(col("_w.id").as("id"))
      .agg(count(lit(1)).as("n_owned"))
    val counts = chunks.groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"))
    df.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .join(owned, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_owned"), lit(0L)).as("n_owned"))
  }

  /** Exact-substring duplication spans (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" tier —
    * the layer the chunk/window kernels only approximate): word-k-gram
    * fingerprints at EVERY offset (stride 1), corpus-wide
    * first-occurrence election, then the duplicated offsets of each
    * document merged into MAXIMAL spans (overlapping or abutting k-gram
    * intervals coalesce). Catches an arbitrary-position verbatim copy —
    * including one that straddles chunk boundaries at a non-stride
    * offset, where [[chunkDedupStats]] misses entirely and
    * [[windowDupStats]] only re-synchronizes within a stride
    * (differentially spec'd in TextOpsSpec).
    *
    * Output: one row per input document,
    * `(id, n_grams, n_dup_grams, n_spans, dup_words)` — `n_grams =
    * max(0, n_words − k + 1)`; `dup_words` is the total word count
    * covered by the merged duplicated spans (`1 − dup_words/n_words`
    * is the doc's unique-text fraction). The first occurrence of each
    * gram corpus-wide (min (id, offset)) is NOT counted as duplicated
    * — the canonical copy survives, like every other dedup tier here.
    *
    * Shape for scale: gram hashing is one O(n_words) rolling codegen'd
    * kernel per document ([[graft.functions.GramPolyHashes]]); the
    * election shuffles 24-byte `(fp, id, off)` rows once (window over
    * fp — high-cardinality partitions, no skew beyond true dup
    * multiplicity), and the span merge is windows/aggregates
    * partitioned by document id — bounded by doc length, no global
    * sort, text never shuffles. The every-offset relation is ~n_words
    * rows/doc (vs n/stride for the window tier): that linear factor IS
    * the price of exactness, the same one the suffix-array
    * formulation pays; it rides fingerprints, never text.
    */
  /** The (id, _fps) gram-fingerprint base and the merged maximal dup
    * spans `(id, _s, _e, _nd)` shared by [[substringDupStats]] and
    * [[substringDedupRebuild]] — one election chain, two consumers.
    */
  private def substringDupSpans(df: DataFrame, textCol: String,
      idCol: String, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    val base = df.select(col(idCol).cast("long").as("id"),
      graft.functions.TextKernelExprs.gramPolyHashes(
        words(coalesce(col(textCol), lit(""))), k).as("_fps"))
    val occ = base.select(col("id"),
        posexplode(col("_fps")).as(Seq("_p", "_fp")))
      .select(col("id"), (col("_p") + 1).cast("long").as("off"),
        col("_fp"))
    val wElect = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col("id"), col("off"))
    val dup = occ.withColumn("_rn", row_number().over(wElect))
      .filter(col("_rn") > 1)
      .select(col("id"), col("off"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("off"))
    val isl = dup
      .withColumn("_brk",
        when(col("off") - lag(col("off"), 1).over(wDoc) <= k, 0L)
          .otherwise(1L))
      .withColumn("_isl", sum(col("_brk")).over(
        wDoc.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val spans = isl.groupBy(col("id"), col("_isl"))
      .agg(min(col("off")).as("_s"), max(col("off")).as("_e"),
        count(lit(1)).as("_nd"))
    (base, spans)
  }

  def substringDupStats(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    val (base, spans) = substringDupSpans(df, textCol, idCol, k)
    val per = spans.groupBy(col("id"))
      .agg(sum(col("_nd")).as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        sum(col("_e") - col("_s") + k).as("dup_words"))
    base.select(col("id"), size(col("_fps")).cast("long").as("n_grams"))
      .join(per, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"))
  }

  /** Stopword list shared by the quality surface (the q21 English
    * high-frequency set).
    */
  val stopwords: Seq[String] = Seq("the", "of", "and", "to", "in", "a",
    "is", "that", "it", "was", "for", "on", "with", "as", "at", "by",
    "be", "this", "are", "or")

  /** Reason-coded quality gate — the production form of a filter
    * cascade: every document gets a KEEP decision plus the FIRST
    * failing reason (`too_short` → `too_long` → `low_stopword` →
    * `repetitive` → `ok`), so the data card reports WHY mass was
    * dropped, not just how much. Signals are integers: token count,
    * stopword count, top-word occurrence count (all per-mille gates by
    * integer cross-multiply).
    *
    * Shape for scale: one scan-side projection — ZERO shuffle,
    * stream-capable. Tokens materialize ONCE per row (the split would
    * otherwise re-run inside every consumer), and the top-word /
    * stopword counts are codegen'd O(n) hashed kernels
    * ([[graft.functions.TextKernelExprs.topTokenCount]] /
    * `tokenSetCount`) — the original nested-filter HOF form evaluated
    * INTERPRETED at O(distinct·n) per doc and cost 2.4× more end to
    * end (matched sparse A/B on q136: 5.39 s → 2.29 s at sf0.1).
    */
  def qualityGate(df: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 30, maxTokens: Int = 100000,
      minStopPerMille: Int = 20, maxTopPerMille: Int = 150): DataFrame = {
    val t = col(textCol)
    val base = df.select(col(idCol).cast("long").as("id"),
      when(coalesce(length(trim(t)), lit(0)) === 0,
        array().cast("array<string>")).otherwise(words(t)).as("_ws"))
    val nt = size(col("_ws")).cast("long")
    val nStop = graft.functions.TextKernelExprs
      .tokenSetCount(col("_ws"), stopwords)
    val top = graft.functions.TextKernelExprs.topTokenCount(col("_ws"))
    val reason = when(nt < minTokens, "too_short")
      .when(nt > maxTokens, "too_long")
      .when(nStop * 1000 < nt * minStopPerMille, "low_stopword")
      .when(top * 1000 > nt * maxTopPerMille, "repetitive")
      .otherwise("ok")
    base.select(col("id"), nt.as("n_tokens"), nStop.as("n_stop"),
        top.as("top_word_count"), reason.as("reason"))
      .withColumn("kept", (col("reason") === "ok").cast("int"))
  }

  /** Unicode text normalization — the ftfy-lite ingest cleanup every
    * multilingual pipeline runs before fingerprinting (two byte-wise
    * DIFFERENT encodings of the same accented word must dedup
    * together): NFC composition, C0-control strip (`\n`/`\t` kept),
    * DEL and zero-width/BOM invisibles dropped, space trim. Output:
    * `(id, text_norm, changed)` — `changed` flags docs the cleanup
    * actually touched (the ingest-health metric). Null text yields
    * `''`.
    *
    * One codegen'd kernel call per document
    * ([[graft.functions.TextKernelExprs.normalizeTextEval]]) — zero
    * shuffle, stream-capable; externally replayable as
    * `nfc_normalize` + character-class strips.
    */
  def normalizeText(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("_t"))
      .select(col("id"),
        graft.functions.TextKernelExprs.normalizeText(col("_t"))
          .as("text_norm"), col("_t"))
      .select(col("id"), col("text_norm"),
        (col("text_norm") =!= col("_t")).cast("int").as("changed"))

  /** The exact-substring tier's persistable HISTORY artifact: the
    * distinct every-offset k-gram fingerprints of a corpus slice —
    * 8 bytes per distinct gram, no text. A continuous-ingestion
    * pipeline appends these for every retained document so later
    * batches can run [[incrementalSubstring]] against history without
    * rescanning it (the [[Dedup.minhashSignatures]] contract for the
    * substring tier).
    */
  def substringFingerprints(df: DataFrame, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    df.select(explode(graft.functions.TextKernelExprs.gramPolyHashes(
        words(coalesce(col(textCol), lit(""))), k)).as("fp"))
      .distinct()
  }

  /** Incremental exact-substring dedup — [[Dedup.incrementalExact]]'s
    * substring-tier analogue: the NEW batch's every-offset k-gram
    * fingerprints check against the accumulated fingerprint HISTORY
    * (plus first-occurrence election within the batch itself). An
    * offset is duplicated when its gram appears in history (history
    * blocks ALL batch occurrences, including the batch's first) or
    * earlier in the batch; duplicated offsets merge into maximal spans
    * exactly like [[substringDupStats]]. Output shape matches the
    * batch tier: `(id, n_grams, n_dup_grams, n_spans, dup_words)`.
    *
    * Shape for scale: history joins as a fingerprint-keyed hash
    * equi-join (8-byte rows, never text, deliberately NOT broadcast —
    * a 100 TB history's gram set is itself huge); the batch-internal
    * election windows only over batch grams. Appending the kept
    * batch's [[substringFingerprints]] to history preserves the
    * cross-batch invariant.
    */
  def incrementalSubstring(batch: DataFrame, historyFp: DataFrame,
      textCol: String, idCol: String, k: Int = 8,
      fpCol: String = "fp"): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    val base = batch.select(col(idCol).cast("long").as("id"),
      graft.functions.TextKernelExprs.gramPolyHashes(
        words(coalesce(col(textCol), lit(""))), k).as("_fps"))
    val occ = base.select(col("id"),
        posexplode(col("_fps")).as(Seq("_p", "_fp")))
      .select(col("id"), (col("_p") + 1).cast("long").as("off"),
        col("_fp"))
    val hist = historyFp.select(col(fpCol).cast("long").as("_fp"))
      .distinct().withColumn("_seen", lit(1))
    val wElect = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col("id"), col("off"))
    val dup = occ.withColumn("_rn", row_number().over(wElect))
      .join(hist, Seq("_fp"), "left")
      .filter(col("_rn") > 1 || col("_seen").isNotNull)
      .select(col("id"), col("off"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("off"))
    val isl = dup
      .withColumn("_brk",
        when(col("off") - lag(col("off"), 1).over(wDoc) <= k, 0L)
          .otherwise(1L))
      .withColumn("_isl", sum(col("_brk")).over(
        wDoc.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val spans = isl.groupBy(col("id"), col("_isl"))
      .agg(min(col("off")).as("_s"), max(col("off")).as("_e"),
        count(lit(1)).as("_nd"))
    val per = spans.groupBy(col("id"))
      .agg(sum(col("_nd")).as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        sum(col("_e") - col("_s") + k).as("dup_words"))
    base.select(col("id"), size(col("_fps")).cast("long").as("n_grams"))
      .join(per, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"))
  }

  /** Execute the exact-substring dedup: rebuild each document with the
    * duplicated maximal spans REMOVED — every word position covered by
    * a duplicated k-gram span drops; the corpus-wide first occurrence
    * survives untouched (Lee et al. 2022's actual transformation, the
    * step [[substringDupStats]] only reports). Output: `(id,
    * text_dedup, n_kept_words, n_removed_words)` — one row per input
    * document, kept words rejoined in original order.
    *
    * Shape for scale: the same fingerprint-only election as the stats
    * tier; spans explode into (id, pos) covered positions (≤ n_words
    * rows/doc, disjoint intervals by construction of the maximal
    * merge), the word relation anti-joins them keyed by (id, pos), and
    * the rebuild is the [[chunkDedupRebuild]] collect_list/array_sort
    * pattern partitioned by id. Text shuffles once, as words that
    * survive — dropped spans cost a fingerprint, not bandwidth.
    */
  def substringDedupRebuild(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8): DataFrame = {
    val (base, spans) = substringDupSpans(df, textCol, idCol, k)
    val covered = spans.select(col("id"),
      explode(sequence(col("_s"), col("_e") + lit(k - 1))).as("pos"))
    val w = df.select(col(idCol).cast("long").as("id"),
        posexplode(words(coalesce(col(textCol), lit(""))))
          .as(Seq("_p", "_w")))
      .select(col("id"), (col("_p") + 1).cast("long").as("pos"),
        col("_w"))
    val kept = w.join(covered, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("_w")))),
          s => s.getField("_w")), " ").as("text_dedup"),
        count(lit(1)).as("n_kept_words"))
    base.select(col("id"), size(col("_fps")).cast("long").as("_ng"))
      .withColumn("_nw", col("_ng") + lit(k - 1))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept_words"), lit(0L)).as("n_kept_words"),
        (when(col("_ng") === 0, coalesce(col("n_kept_words"), lit(0L)))
          .otherwise(col("_nw")) -
          coalesce(col("n_kept_words"), lit(0L))).as("n_removed_words"))
  }

  /** EXECUTED benchmark decontamination at the substring tier (the
    * Lee et al. removal form of [[decontaminate]]'s boolean flag):
    * every word position covered by a k-gram that appears ANYWHERE in
    * the benchmark corpus drops — contiguous hits merge into maximal
    * spans first, so a verbatim eval item embedded mid-document is
    * excised as one block while the document's own prose survives.
    * Bench docs present in the corpus wipe themselves (that is the
    * point). Output: `(id, text_clean, n_kept_words,
    * n_removed_words)`.
    *
    * Shape for scale: benchmark grams are eval-suite-sized — distinct
    * fingerprints BROADCAST into the gram-level semi-match, so the
    * corpus is touched in one exploded pass; spans/covered positions
    * are fingerprint-and-integer rows; text shuffles once, as
    * surviving words (the [[substringDedupRebuild]] rebuild).
    */
  def substringDecontaminate(df: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    val base = df.select(col(idCol).cast("long").as("id"),
      graft.functions.TextKernelExprs.gramPolyHashes(
        words(coalesce(col(textCol), lit(""))), k).as("_fps"))
    val occ = base.select(col("id"),
        posexplode(col("_fps")).as(Seq("_p", "_fp")))
      .select(col("id"), (col("_p") + 1).cast("long").as("off"),
        col("_fp"))
    val bfp = bench.select(explode(
        graft.functions.TextKernelExprs.gramPolyHashes(
          words(coalesce(col(textCol), lit(""))), k)).as("_fp"))
      .distinct()
    val hit = occ.join(broadcast(bfp), Seq("_fp"))
      .select(col("id"), col("off"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("off"))
    val spans = hit
      .withColumn("_brk",
        when(col("off") - lag(col("off"), 1).over(wDoc) <= k, 0L)
          .otherwise(1L))
      .withColumn("_isl", sum(col("_brk")).over(
        wDoc.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .groupBy(col("id"), col("_isl"))
      .agg(min(col("off")).as("_s"), max(col("off")).as("_e"))
    val covered = spans.select(col("id"),
      explode(sequence(col("_s"), col("_e") + lit(k - 1))).as("pos"))
    val w = df.select(col(idCol).cast("long").as("id"),
        posexplode(words(coalesce(col(textCol), lit(""))))
          .as(Seq("_p", "_w")))
      .select(col("id"), (col("_p") + 1).cast("long").as("pos"),
        col("_w"))
    val kept = w.join(covered, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("_w")))),
          s => s.getField("_w")), " ").as("text_clean"),
        count(lit(1)).as("n_kept_words"))
    base.select(col("id"), size(col("_fps")).cast("long").as("_ng"))
      .withColumn("_nw", col("_ng") + lit(k - 1))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept_words"), lit(0L)).as("n_kept_words"),
        (when(col("_ng") === 0, coalesce(col("n_kept_words"), lit(0L)))
          .otherwise(col("_nw")) -
          coalesce(col("n_kept_words"), lit(0L))).as("n_removed_words"))
  }

  def chunkDedupRebuild(df: DataFrame, textCol: String, idCol: String,
      chunkWords: Int = 50): DataFrame = {
    val chunks = chunkRelation(df, textCol, idCol, chunkWords, chunkWords)
      .select(col("id"), col("chunk_idx"), col("chunk_text").as("_ct"))
      .withColumn("_fp",
        graft.functions.TextKernelExprs.polyHash(col("_ct")))
    val winners = chunks.groupBy(col("_fp"))
      .agg(min(struct(col("id"), col("chunk_idx"), col("_ct"))).as("_w"))
      .select(col("_w.id").as("id"), col("_w.chunk_idx").as("chunk_idx"),
        col("_w._ct").as("_ct"))
    val rebuilt = winners.groupBy(col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("_ct")))),
          s => s.getField("_ct")), " ").as("text_dedup"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Corpus-wide line-level dedup — the CCNet/RefinedWeb paragraph-hash
    * tier (Wenzek et al. 2020 §3.1; Penedo et al. 2023 §4.2; reference
    * scope: the curation step upstream of everything its CEP layer
    * consumes). Every line whose trimmed form has ≥ `minChars`
    * characters competes corpus-wide; the FIRST occurrence (smallest
    * `(id, pos)`) survives and every later verbatim repeat is dropped —
    * the boilerplate killer (nav bars, cookie banners, footers repeat
    * across pages verbatim, and they dominate naive token counts).
    * Lines shorter than `minChars` after trim are structure, not
    * content: they always survive. Output: `(id, text_dedup, n_lines,
    * n_dropped)` with surviving lines rejoined by newline in original
    * order; docs with null text keep the all-empty row.
    *
    * Scale shape: lines explode scan-side with their position; the
    * election shuffles ONLY `(fp, id, pos)` — ~20 bytes/line, never
    * line text (the q116 fingerprint discipline). Losers come back as
    * an `(id, pos)` anti-join and the survivors reassemble with the
    * [[chunkDedupRebuild]] collect/array_sort pattern, so line text
    * shuffles exactly once, as surviving lines keyed by doc. Election
    * and loser join are plain hash equi-joins — no windows, no global
    * sort, no driver state.
    */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
      minChars: Int = 10): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    val lines = df
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "_line")))
    val competing = lines
      .filter(length(trim(col("_line"))) >= minChars)
      .select(col("id"), col("pos"),
        graft.functions.TextKernelExprs.polyHash(trim(col("_line")))
          .as("_fp"))
    // first occurrence corpus-wide: min (id, pos) per fingerprint;
    // every other competing occurrence is a loser
    val winners = competing.groupBy(col("_fp"))
      .agg(min(struct(col("id"), col("pos"))).as("_w"))
      .select(col("_w.id").as("id"), col("_w.pos").as("pos"))
    val losers = competing.select(col("id"), col("pos"))
      .join(winners, Seq("id", "pos"), "left_anti")
    val rebuilt = lines.join(losers, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("_line")))),
          s => s.getField("_line")), "\n").as("text_dedup"),
        count(lit(1)).as("_n_kept"))
    val nLines = when(col(textCol).isNull, lit(0L))
      .otherwise(size(split(col(textCol), "\n")).cast("long"))
    df.select(col(idCol).cast("long").as("id"), nLines.as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("_n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** Vocabulary growth curve — the Heaps'-law audit (types vs tokens as
    * the corpus grows; Heaps 1978): docs are bucketed by id into
    * checkpoints every `stepDocs` ids, and each output row reports the
    * corpus prefix up to that checkpoint: `(bucket, docs_upto,
    * tokens_upto, types_upto)`. A corpus whose `types_upto` curve bends
    * away from the expected power law is drifting (template flood ⇒
    * too flat; encoding noise/OCR ⇒ too steep) — the standard
    * ingest-monitoring chart for a growing training corpus.
    *
    * Scale shape: a type's checkpoint is its FIRST doc's bucket, so
    * the election is one hash aggregation `min(id) per token` over
    * per-doc-distinct tokens (map-side partial min; token strings
    * shuffle once, counts never do). Both per-bucket relations are
    * ≤ `corpus/stepDocs` rows; the cumulative window runs over that
    * tiny relation only — pick `stepDocs` so checkpoints stay ≤ ~1e5
    * rows and the window cost is noise at any corpus size.
    */
  def vocabGrowth(df: DataFrame, textCol: String, idCol: String,
      stepDocs: Long = 1000L): DataFrame = {
    require(stepDocs >= 1, s"stepDocs must be >= 1, got $stepDocs")
    val t = col(textCol)
    val base = df.select(col(idCol).cast("long").as("id"),
      when(coalesce(length(trim(t)), lit(0)) === 0,
        array().cast("array<string>")).otherwise(words(t)).as("_ws"))
    val bt = base
      .groupBy(expr(s"id div $stepDocs").cast("long").as("bucket"))
      .agg(count(lit(1)).as("_nd"),
        sum(size(col("_ws")).cast("long")).as("_ntk"))
    val ty = base
      .select(col("id"), explode(array_distinct(col("_ws"))).as("_tok"))
      .groupBy(col("_tok")).agg(min(col("id")).as("_fid"))
      .groupBy(expr(s"_fid div $stepDocs").cast("long").as("bucket"))
      .agg(count(lit(1)).as("_nty"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    bt.join(ty, Seq("bucket"), "left")
      .select(col("bucket"),
        sum(col("_nd")).over(w).as("docs_upto"),
        sum(col("_ntk")).over(w).as("tokens_upto"),
        sum(coalesce(col("_nty"), lit(0L))).over(w).as("types_upto"))
  }

  /** Line-fingerprint history artifact for [[incrementalLineDedup]]:
    * the distinct 64-bit fingerprints of every COMPETING line (trimmed
    * length ≥ `minChars`) — 8 bytes per distinct line, the persistable
    * parquet relation a continuous ingest carries between batches.
    */
  def lineFingerprints(df: DataFrame, textCol: String,
      minChars: Int = 10): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    df.select(explode(split(col(textCol), "\n")).as("_line"))
      .filter(length(trim(col("_line"))) >= minChars)
      .select(graft.functions.TextKernelExprs.polyHash(trim(col("_line")))
        .as("fp"))
      .distinct()
  }

  /** Incremental [[lineDedup]] — the continuous-ingestion contract at
    * the line tier ([[Dedup.incrementalExact]] /
    * [[incrementalSubstring]] pattern): the NEW batch's competing
    * lines check against the accumulated fingerprint HISTORY plus the
    * batch-internal first-occurrence election. A history hit drops ALL
    * batch occurrences (the corpus-wide first lives in an earlier
    * batch); otherwise the batch's smallest `(id, pos)` survives.
    * Output matches the batch tier: `(id, text_dedup, n_lines,
    * n_dropped)`. Appending the kept batch's [[lineFingerprints]] to
    * history preserves the cross-batch invariant.
    *
    * Shape for scale: history joins as a fingerprint-keyed hash
    * equi-join (8-byte rows, deliberately NOT broadcast — a 100 TB
    * history's line set is itself huge); the election windows only
    * over batch lines; surviving line text shuffles once into the
    * in-order rebuild.
    */
  def incrementalLineDedup(batch: DataFrame, historyFp: DataFrame,
      textCol: String, idCol: String, minChars: Int = 10,
      fpCol: String = "fp"): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    val lines = batch
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "_line")))
    val competing = lines
      .filter(length(trim(col("_line"))) >= minChars)
      .select(col("id"), col("pos"),
        graft.functions.TextKernelExprs.polyHash(trim(col("_line")))
          .as("_fp"))
    val hist = historyFp.select(col(fpCol).cast("long").as("_fp"))
      .distinct().withColumn("_seen", lit(1))
    val wElect = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col("id"), col("pos"))
    val losers = competing.withColumn("_rn", row_number().over(wElect))
      .join(hist, Seq("_fp"), "left")
      .filter(col("_rn") > 1 || col("_seen").isNotNull)
      .select(col("id"), col("pos"))
    val rebuilt = lines.join(losers, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("_line")))),
          s => s.getField("_line")), "\n").as("text_dedup"),
        count(lit(1)).as("_n_kept"))
    val nLines = when(col(textCol).isNull, lit(0L))
      .otherwise(size(split(col(textCol), "\n")).cast("long"))
    batch.select(col(idCol).cast("long").as("id"), nLines.as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("_n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** Winnowing fingerprint statistics (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): per document, every-offset
    * word `k`-gram hashes winnow down to the rightmost-minimum of each
    * `w`-gram window ([[graft.functions.TextKernelExprs.winnowOffsets]]
    * — the deterministic rightmost-tie-break variant, so the selection
    * replays exactly in any engine as a window-min over the packed key
    * `fp·2^22 + (2^22 − off)`; NOTE that the PACKED-KEY replay — the
    * q151/q160 oracle formulation — is only faithful for documents
    * under 2^22 ≈ 4.2M gram offsets, where the offset component stays
    * non-negative. The kernel itself has no such limit: a longer
    * document winnows correctly here and it is only the replay SQL
    * that would need a wider offset radix). Output per doc: `n_grams`
    * (every-offset
    * gram count), `n_winnowed` (selected fingerprints — the document's
    * MOSS signature size, expected density `2/(w+1)`), and
    * `n_shared_fp` (distinct selected fingerprints that at least one
    * OTHER document also selected — the overlap signal MOSS ranks
    * matches by). Any substring of `w + k − 1` words shared verbatim
    * between two documents is guaranteed to surface in `n_shared_fp`.
    *
    * Shape for scale: selection is one codegen'd O(n) in-row kernel —
    * no explode, no per-doc window shuffle; only the 8-byte selected
    * fingerprints shuffle (≈ `2/(w+1)` of the gram count) for the
    * cross-doc share count: distinct-per-doc fps → fp-keyed count →
    * fp-keyed equi-join back (never broadcast — the corpus-wide
    * fingerprint set scales with the data), then one id-keyed
    * re-aggregation. A viral fingerprint (boilerplate selected by
    * millions of docs) is one hot count group reduced map-side.
    */
  def winnowStats(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    require(w >= 1 && w <= 65536, s"w must be in [1, 65536], got $w")
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    def mat(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint() else d.localCheckpoint()
    val base = df.select(col(idCol).cast("long").as("id"),
        graft.functions.TextKernelExprs.gramPolyHashes(
          words(coalesce(col(textCol), lit(""))), k).as("_g"))
      .withColumn("_offs",
        graft.functions.TextKernelExprs.winnowOffsets(col("_g"), w))
    // the narrow per-doc stats + distinct selected fps materialize ONCE
    // (the gram/winnow kernels and the text scan would otherwise re-run
    // for every consumer below)
    val stats = mat(base.select(col("id"),
      size(col("_g")).cast("long").as("n_grams"),
      size(col("_offs")).cast("long").as("n_winnowed"),
      array_distinct(transform(col("_offs"),
        o => element_at(col("_g"), o))).as("_fps")))
    val docFps = stats.select(col("id"), explode(col("_fps")).as("_fp"))
    val fpDocs = docFps.groupBy(col("_fp"))
      .agg(count(lit(1)).as("_nd"))
    val shared = docFps.join(fpDocs.filter(col("_nd") >= 2), Seq("_fp"))
      .groupBy(col("id")).agg(count(lit(1)).as("_nsh"))
    stats.select(col("id"), col("n_grams"), col("n_winnowed"))
      .join(shared, Seq("id"), "left")
      .select(col("id"), col("n_grams"), col("n_winnowed"),
        coalesce(col("_nsh"), lit(0L)).as("n_shared_fp"))
  }

  /** Per-document unicode script profile + mixing signal (the spoofing/
    * encoding-corruption gate of Unicode TR#39 confusable detection,
    * block-range tier): counts per script class from one codegen'd
    * codepoint pass ([[graft.functions.TextKernelExprs.scriptCounts]]),
    * the dominant letter script, and `mix_permille` — the per-mille of
    * letters OUTSIDE the dominant script. High mix flags spam that
    * interleaves confusable scripts (Latin/Cyrillic lookalikes),
    * mojibake, and mislabeled-language pages; `main_script` feeds the
    * same stratified gates `lang` metadata does, but content-derived.
    *
    * Dominant-script election is pure integer arithmetic — max over
    * `count·8 + slot` with slots alphabetical — so ties break to the
    * alphabetically-last script identically in any engine (no float,
    * no struct comparison). Zero letters → `main_script = 'none'`,
    * `mix_permille = 0`.
    *
    * Shape for scale: a stateless scan projection — no shuffle, no
    * state; streams as-is.
    */
  def scriptProfile(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val names = Seq("arabic", "cyrillic", "greek", "han", "hangul",
      "kana", "latin")
    val base = df.select(col(idCol).cast("long").as("id"),
      graft.functions.TextKernelExprs.scriptCounts(
        coalesce(col(textCol), lit(""))).as("_c"))
    val cnt = (i: Int) => element_at(col("_c"), i + 1)
    val letters = (0 until 7).map(cnt).reduce(_ + _)
    val maxVal = greatest((0 until 7).map(i => cnt(i) * 8 + i): _*)
    base.withColumn("_letters", letters).withColumn("_mx", maxVal)
      .select(
        col("id") +:
          names.zipWithIndex.map { case (n, i) => cnt(i).as(s"n_$n") } :+
          cnt(7).as("n_digit") :+ cnt(8).as("n_other") :+
          when(col("_letters") === 0, lit("none"))
            .otherwise(element_at(
              array(names.map(lit): _*),
              pmod(col("_mx"), lit(8)).cast("int") + 1)).as("main_script") :+
          when(col("_letters") === 0, lit(0L))
            .otherwise(expr("((_letters - _mx div 8) * 1000) div _letters"))
            .as("mix_permille"): _*)
  }

  /** The MOSS ranking itself — top overlapping document pairs by
    * shared WINNOWED fingerprints ([[winnowStats]]'s pair tier): docs
    * sharing at least `minShared` selected fingerprints, ranked by
    * overlap size, ties to `(id_a, id_b)`. This is the plagiarism /
    * cross-source-copy report: `n_shared ≥ 2` with w=4, k=8 already
    * implies substantial verbatim overlap (each shared fp witnesses an
    * 8-word copy).
    *
    * Shape for scale: selection is the in-row kernel; the pair join is
    * fingerprint-keyed with a `maxBucket` cap — a fingerprint selected
    * by more than `maxBucket` docs (boilerplate that survived
    * winnowing) is dropped before the self-join, bounding every
    * bucket's pair contribution at maxBucket² exactly like the LSH
    * banding caps. The final ranking is a `TakeOrderedAndProject`
    * (per-task heap), never a full sort.
    */
  def winnowOverlapPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4, minShared: Long = 2, topK: Int = 100,
      maxBucket: Int = 1000,
      checkpointDir: Option[String] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    def mat(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint() else d.localCheckpoint()
    val base = df.select(col(idCol).cast("long").as("id"),
        graft.functions.TextKernelExprs.gramPolyHashes(
          words(coalesce(col(textCol), lit(""))), k).as("_g"))
      .withColumn("_offs",
        graft.functions.TextKernelExprs.winnowOffsets(col("_g"), w))
    // (id, fp) materializes ONCE — the cap counts, the cap join and the
    // pair self-join would otherwise each re-run the text scan and the
    // gram/winnow kernels (up to 4 evaluations of the full corpus DAG)
    val docFps = mat(base.select(col("id"),
      explode(array_distinct(transform(col("_offs"),
        o => element_at(col("_g"), o)))).as("_fp")))
    val capped =
      if (maxBucket <= 0) docFps
      else docFps.join(
        docFps.groupBy(col("_fp")).agg(count(lit(1)).as("_nd"))
          .filter(col("_nd") <= maxBucket).select(col("_fp")),
        Seq("_fp"))
    capped.select(col("_fp"), col("id").as("id_a"))
      .join(capped.select(col("_fp"), col("id").as("id_b")), Seq("_fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("n_shared").desc, col("id_a").asc, col("id_b").asc)
      .limit(topK)
  }

  /** The offline half of [[temperatureSample]]: the per-stratum
    * keep-rates per million as a plain map (≤ strata entries — a
    * bounded driver collect), for [[applySampleRates]] to apply
    * statelessly to later batches or a stream. Rates computed from
    * THIS corpus's counts with the exact [[temperatureSample]]
    * arithmetic, so applying them back to the same corpus reproduces
    * its kept set bit-for-bit.
    */
  def temperatureRates(df: DataFrame, stratumCol: String,
      alphaPerMille: Int): Map[String, Long] = {
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_obs"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) Map.empty
    else {
      val nmin = counts.map(_._2).min
      val am1 = alphaPerMille.toDouble / 1000.0 - 1.0
      counts.map { case (s, n) =>
        s -> math.floor(math.exp(am1 *
          math.log(n.toDouble / nmin.toDouble)) * 1000000.0).toLong
      }.toMap
    }
  }

  /** Apply frozen per-stratum keep-rates (per million) with the
    * [[temperatureSample]] salt — a STATELESS scan-side predicate, so
    * the same call compiles onto a batch scan or a structured stream
    * (StreamingParitySpec asserts bit-identical kept sets). Rows whose
    * stratum is absent from the map (or NULL) get `kept = 0`, like
    * [[rebalanceMixture]]'s absent strata.
    */
  def applySampleRates(df: DataFrame, idCol: String, stratumCol: String,
      ratesPerMillion: Map[String, Long],
      salt: Long = 151515157L): DataFrame = {
    val bucket = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(
        col(idCol).cast("long") + lit(salt)), 12) % 1000000L
    // literal map lookup: ≤ strata entries, evaluated map-side;
    // try_element_at because ANSI element_at throws on a missing key
    val rateCol = if (ratesPerMillion.isEmpty)
      lit(null).cast("long")
    else
      try_element_at(typedLit(ratesPerMillion),
        col(stratumCol).cast("string"))
    df.withColumn("kept",
      (rateCol.isNotNull && bucket < rateCol).cast("int"))
  }

  /** Gopher duplicate-n-gram signals (Rae et al. 2021 §A1.1): per
    * document and n-gram order, how many word-n-gram occurrences are
    * REPEATS of an earlier occurrence in the same document —
    * `n_dup / n_total` is the "fraction of duplicate n-grams" quality
    * gate (templated/spammy text scores high). Occurrence counts are
    * arithmetic (`len − eff + 1`, `eff = min(n, len)` — the
    * [[graft.functions.Hashing.wordNgramHashes]] shrink rule for short
    * docs) and the distinct count is the SIZE of that kernel's
    * distinct-hash set, so every output is an exact integer.
    *
    * Output: `(id, n, n_total, n_distinct, n_dup)` — one row per doc
    * per requested order.
    *
    * Shape for scale: a single scan-side projection (one codegen'd
    * gram-hash call per order + an explode of the per-order struct
    * array) — no shuffle, no state.
    */
  def dupNgramStats(df: DataFrame, textCol: String, idCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 32),
      s"ns must be nonempty with each in [1, 32], got $ns")
    val nw = when(coalesce(length(trim(col(textCol))), lit(0)) === 0,
      lit(0)).otherwise(size(words(col(textCol))))
    // ONE tokenize pass counts every order's distinct set; materialized
    // as its OWN projection column — referenced once per order, an
    // inlined copy would re-run the whole pass per order (measured: the
    // inline variant was SLOWER than per-order kernels)
    val base = df.select(col(idCol).cast("long").as("id"), nw.as("_nw"),
      coalesce(graft.functions.TextKernelExprs
          .ngramDistinctCounts(col(textCol), ns),
        typedLit(ns.map(_ => 0L))).as("_dc"))
    val perN = ns.zipWithIndex.map { case (n, j) =>
      val eff = least(lit(n), col("_nw"))
      val total = when(col("_nw") === 0, lit(0L))
        .otherwise((col("_nw") - eff + 1).cast("long"))
      val distinct = element_at(col("_dc"), j + 1)
      struct(lit(n).as("n"), total.as("n_total"),
        distinct.as("n_distinct"), (total - distinct).as("n_dup"))
    }
    base.select(col("id"), explode(array(perN: _*)).as("_s"))
      .select(col("id"), col("_s.n").as("n"),
        col("_s.n_total").as("n_total"),
        col("_s.n_distinct").as("n_distinct"), col("_s.n_dup").as("n_dup"))
  }

  /** Language-consistency audit: the confusion matrix between a
    * corpus's language METADATA and [[graft.functions.Text.langId]]'s
    * content detection — `(lang_meta, lang_detected, n_docs)`. Large
    * off-diagonal cells mean mislabeled metadata (scrapers copying a
    * site-level tag onto foreign-language pages), which silently skews
    * every lang-stratified gate/mixture downstream.
    *
    * Shape for scale: detection is a scan-side codegen'd projection;
    * the matrix aggregate is ≤ |langs|² rows.
    */
  def langConsistency(df: DataFrame, textCol: String,
      langCol: String): DataFrame =
    df.select(col(langCol).as("lang_meta"),
        graft.functions.Text.langId(col(textCol)).as("lang_detected"))
      .groupBy(col("lang_meta"), col("lang_detected"))
      .agg(count(lit(1)).as("n_docs"))

  /** First-iteration BPE merge statistics (Sennrich et al. 2016): the
    * corpus-wide frequency of every adjacent CHARACTER pair within
    * words, weighted by word frequency — the ranking the first BPE
    * merge is chosen from, and the tokenizer-induction primitive a
    * training-data pipeline derives its vocabulary from. Output: the
    * `topK` `(pair, cnt, rank)` rows, ranked `(cnt desc, pair asc)`.
    *
    * Shape for scale: the corpus explodes ONCE into a word-keyed count
    * aggregation (the q101 vocabProfile shuffle); character pairs then
    * explode from the DISTINCT-word vocabulary — orders of magnitude
    * smaller than the corpus — weighted by word count, and the literal
    * rank-limit plans as a global top-k.
    */
  def bpePairCounts(df: DataFrame, textCol: String,
      topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val wc = df.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("_wc"))
    val pairs = wc.filter(length(col("w")) >= 2)
      .select(col("_wc"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
    val counts = pairs.groupBy(col("pair")).agg(sum(col("_wc")).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("pair").asc)
    counts.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    * lines that end in terminal punctuation (`. ! ? "`) AND contain at
    * least `minWords` words; gate the whole page on ≥ `minLines` kept
    * lines, no curly braces, and no "lorem ipsum" (case-insensitive).
    * Output: `(id, clean_text, n_lines, n_kept, kept)` — kept lines
    * rejoined by newline in original order; `kept` is the page gate
    * (audit-friendly flag, filter `kept = 1` to materialize the C4
    * corpus).
    *
    * Scale shape: lines explode scan-side with their position and the
    * line gates run codegen'd in the same projection (no interpreted
    * per-line lambda); only KEPT lines shuffle once into the per-doc
    * reassembly (`chunkDedupRebuild`'s collect_list/array_sort
    * pattern); the page-gate scalars ride the same aggregate. Dropped
    * lines cost a counter, not bandwidth.
    */
  def c4LineFilter(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 5, minLines: Int = 3): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    require(minLines >= 1, s"minLines must be >= 1, got $minLines")
    // lines are already in document order inside the split array, so
    // the line gates and the clean-text reassembly are array HOFs on
    // the SAME row — ZERO shuffle (the q127 rewrite pattern; was an
    // explode + two aggregations + two joins). Null text keeps the
    // legacy all-zero row.
    val t = col(textCol)
    def trimmed(l: Column): Column = trim(l)
    val lines = split(t, "\n")
    val keptArr = filter(lines, l => trimmed(l).rlike("[.!?\"]$") &&
      size(split(trimmed(l), "\\s+")) >= minWords)
    val pg = !t.contains("{") && !t.contains("}") &&
      !lower(t).contains("lorem ipsum")
    val nKept = when(t.isNull, lit(0L))
      .otherwise(size(keptArr).cast("long"))
    df.select(col(idCol).cast("long").as("id"),
      when(t.isNull, lit(""))
        .otherwise(array_join(keptArr, "\n")).as("clean_text"),
      when(t.isNull, lit(0L))
        .otherwise(size(lines).cast("long")).as("n_lines"),
      nKept.as("n_kept"),
      (coalesce(pg, lit(false)) && nKept >= minLines)
        .cast("int").as("kept"))
  }

  /** Sliding-window chunking (the RAG / embedding-input splitter):
    * fixed `chunkWords`-word windows every `strideWords` words, so
    * consecutive chunks overlap by `chunkWords - strideWords` words and
    * every token is covered. Trailing windows are shorter (never
    * empty); `chunk_idx` counts strides. Output:
    * `(id, chunk_idx, n_words, chunk_text)`.
    *
    * Scale shape: pure explode projection — no shuffle, no state; the
    * output feeds an embedding UDF or [[salientTerms]] directly.
    */
  def slidingChunks(df: DataFrame, textCol: String, idCol: String,
      chunkWords: Int, strideWords: Int): DataFrame = {
    require(chunkWords >= 1 && strideWords >= 1 && strideWords <= chunkWords,
      s"need 1 <= stride <= chunk, got chunk=$chunkWords stride=$strideWords")
    chunkRelation(df, textCol, idCol, chunkWords, strideWords)
  }

  /** Deterministic train/val/test split + global-shuffle plan. Each row
    * gets: a `split` from per-mille hash buckets of the id (exact
    * proportions in expectation, engine- and partitioning-independent,
    * stable as the corpus grows — a doc never migrates between splits
    * when others are added); an independently-salted `shuffle_key`
    * (decorrelated from the split hash, so split membership doesn't bias
    * sample order); and a `file_idx` in [0, nFiles). Writing shuffled
    * training data = `repartitionByRange(file_idx) .sortWithinPartitions
    * (shuffle_key)` — a deterministic global shuffle without any
    * single-task rank bottleneck.
    *
    * Everything here is a scan-side projection: no shuffle, no state, no
    * window — the op itself is free at any corpus size.
    */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)], nFiles: Int = 1): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000,
      s"split per-milles must sum to 1000, got $splits")
    require(splits.forall(_._2 > 0), s"empty split in $splits")
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val bucket = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")), 12) % 1000
    val cums = splits.map(_._2).scanLeft(0)(_ + _).tail
    // last branch is the unconditional otherwise: full coverage even if
    // a future edit breaks the cumulative chain
    val splitCol = splits.init.zip(cums.init).reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), cum)) =>
        when(bucket < cum, lit(name)).otherwise(acc)
      }
    val key2 = shiftrightunsigned(graft.functions.TextKernelExprs.mix64(
      col(idCol).cast("long") + lit(1000000007L)), 12)
    df.select(col(idCol).cast("long").as("id"), splitCol.as("split"),
      (key2 % nFiles).as("file_idx"), key2.as("shuffle_key"))
  }

  /** Cross-split contamination audit — did [[splitAssign]]'s held-out
    * splits stay clean? A val/test doc is contaminated when it shares
    * ANY distinct word `n`-gram with ANY train doc (the q63 criterion
    * turned inward: train is the "benchmark" and eval splits are the
    * corpus). Output: one row per non-train split — `(split, n_docs,
    * n_contaminated, contaminated_permille)`. Hash-based splitting
    * prevents doc-level leakage by construction but NOT near-dup
    * leakage: two near-identical docs land in different splits and
    * this report is what catches the overlap mass (the
    * leakage-safe-split q102 fixes it; this measures it).
    *
    * Scale shape: train's gram set is corpus-sized — NOTHING
    * broadcasts (the [[decontaminate]] broadcast is right for
    * eval-suite-sized benchmarks only). Grams dedup per-doc scan-side
    * (`array_distinct` inside the row), shuffle as 8-byte fingerprints
    * for the global train-side distinct, and the eval-vs-train check
    * is a fingerprint equi-join (AQE-skew-splittable) followed by two
    * keyed counts. Text never shuffles.
    */
  def splitContamination(df: DataFrame, textCol: String, idCol: String,
      splits: Seq[(String, Int)], trainSplit: String = "train",
      n: Int = 8): DataFrame = {
    require(splits.exists(_._1 == trainSplit),
      s"trainSplit '$trainSplit' not among $splits")
    val assigned = splitAssign(df, idCol, splits)
      .select(col("id"), col("split"))
    val docGrams = df
      .select(col(idCol).cast("long").as("id"),
        words(col(textCol)).as("_toks"))
      .select(col("id"), explode(wordGrams(col("_toks"), n)).as("_g"))
      .select(col("id"),
        graft.functions.TextKernelExprs.polyHash(col("_g")).as("_gfp"))
    val withSplit = docGrams.join(assigned, Seq("id"))
    val trainG = withSplit.filter(col("split") === trainSplit)
      .select(col("_gfp")).distinct()
    val hits = withSplit.filter(col("split") =!= trainSplit)
      .join(trainG, Seq("_gfp"), "left_semi")
      .select(col("split"), col("id")).distinct()
      .groupBy(col("split")).agg(count(lit(1)).as("_n_cont"))
    assigned.filter(col("split") =!= trainSplit)
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .join(hits, Seq("split"), "left")
      .select(col("split"), col("n_docs"),
        coalesce(col("_n_cont"), lit(0L)).as("n_contaminated"),
        expr("(coalesce(_n_cont, 0) * 1000) div n_docs")
          .as("contaminated_permille"))
  }

  /** Fractional-epoch upsampling — the data-recipe "repeat this source
    * 2.3 epochs" primitive (mixture weighting by repetition rather than
    * by dropping). Every row is emitted `floor(epochs)` times, plus one
    * more for a deterministic `epochs mod 1` fraction of rows selected
    * by a SALTED avalanche hash (house rule: every sampling op salts
    * its mix64 stream so composed keep-predicates never correlate —
    * this one uses +424243).
    *
    * Output: `(id, epoch_copy, n_copies)` — `epoch_copy` ∈
    * [0, n_copies); downstream shuffles (e.g. [[splitAssign]]'s
    * shuffle_key on a composite of id and copy) spread the replicas.
    *
    * Shape for scale: a zero-shuffle scan-side projection —
    * `explode(sequence(...))` amplifies rows map-side, no state, no
    * exchange; rows with zero copies (epochs < 1, unlucky hash) are
    * filtered before the explode so `sequence` never sees a negative
    * span.
    */
  def epochUpsample(df: DataFrame, idCol: String,
      epochsPerMille: Int): DataFrame = {
    require(epochsPerMille >= 1,
      s"epochsPerMille must be >= 1, got $epochsPerMille")
    val full = epochsPerMille / 1000
    val frac = epochsPerMille % 1000
    val bucket = shiftrightunsigned(graft.functions.TextKernelExprs.mix64(
      col(idCol).cast("long") + lit(424243L)), 12) % 1000
    df.select(col(idCol).cast("long").as("id"),
        (lit(full) + when(bucket < frac, 1).otherwise(0)).cast("int")
          .as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("id"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("epoch_copy"),
        col("n_copies"))
  }

  /** Deterministic sequence packing: assign documents to fixed
    * token-budget training packs. Documents are laid out in
    * avalanche-hash order (the deterministic corpus shuffle), a running
    * token total is kept per (stratum, shard), and a document belongs to
    * the pack where its first token lands:
    * `pack = floor(start / budget)`, namespaced per shard. Output:
    * `(id, stratum, n_tokens, pack_id, pack_offset)` — all integers, so
    * the assignment is engine-, run- and partitioning-independent.
    *
    * Scale shape: packing is inherently sequential, so the sequence is
    * sharded — `shards` independent hash-order streams per stratum, each
    * packed alone (pack ids never collide across shards: the shard index
    * occupies the high bits). One window cumsum per (stratum, shard)
    * partition is the only shuffle, and it carries (id, key, n_tokens) —
    * never the text. Size `shards` so a partition fits a task at the
    * target corpus.
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      stratumCol: String, budget: Long, shards: Int = 1): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(shards >= 1 && shards <= (1 << 20),
      s"shards must be in [1, 2^20], got $shards")
    val key = shiftrightunsigned(
      graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")), 12)
    // null OR whitespace-only text → 0 tokens (it consumes no budget but
    // keeps its slot in the layout): splitting the trimmed empty string
    // yields [""] (1 token) and a null poisons every later start in its
    // shard (null-propagating cumsum) — both guarded, matching the
    // words()-based ops' accounting
    val base = df.select(col(idCol).cast("long").as("id"),
      col(stratumCol).as(stratumCol),
      when(coalesce(length(trim(col(textCol))), lit(0)) === 0, lit(0L))
        .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
        .as("n_tokens"),
      key.as("_k"))
      .withColumn("_shard", col("_k") % shards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("_shard"))
      .orderBy(col("_k").asc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.withColumn("_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id"), col(stratumCol), col("n_tokens"),
        (col("_shard") * lit(1L << 40) +
          expr(s"_start DIV ${budget}L")).as("pack_id"),
        pmod(col("_start"), lit(budget)).as("pack_offset"))
  }

  /** The deterministic two-pointer pair walk over a DESC-sorted length
    * histogram — the driver-side core of [[packPairs]]. Runs in
    * O(distinct lengths): each iteration consumes a whole run batch
    * (min of head/tail run remainders), exactly reproducing the
    * per-item loop `while i < j: pair if fits else head advances
    * alone`. Returns (pair-head segments `(lo, hi, packBase)`, single
    * segments `(lo, hi, singleBase)`, nPairs) over GLOBAL positions
    * 1..n; tail positions are always the last nPairs (consumed from
    * `n` downward), so they need no segments — `pack = n − pos`.
    */
  private[operators] def pairWalk(hist: Array[(Long, Long)],
      budget: Long): (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)],
        Long) = {
    val len = hist.map(_._1)
    val cnt = hist.map(_._2)
    var hi = 0; var hoff = 0L
    var ti = hist.length - 1; var toff = 0L
    var headPos = 1L
    var tailPos = cnt.sum
    var pairs = 0L; var singles = 0L
    val hs = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val ss = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var done = hist.isEmpty
    while (!done && headPos <= tailPos) {
      if (hi == ti) {
        val m = cnt(hi) - hoff - toff
        if (m > 0) {
          if (2 * len(hi) <= budget) {
            val p2 = m / 2
            if (p2 > 0) { hs += ((headPos, headPos + p2 - 1, pairs)); pairs += p2 }
            if (m % 2 == 1) { ss += ((headPos + p2, headPos + p2, singles)); singles += 1 }
          } else { ss += ((headPos, tailPos, singles)); singles += m }
        }
        done = true
      } else if (len(hi) + len(ti) <= budget) {
        val c = math.min(cnt(hi) - hoff, cnt(ti) - toff)
        hs += ((headPos, headPos + c - 1, pairs)); pairs += c
        headPos += c; tailPos -= c
        hoff += c; if (hoff == cnt(hi)) { hi += 1; hoff = 0 }
        toff += c; if (toff == cnt(ti)) { ti -= 1; toff = 0 }
      } else {
        val c = cnt(hi) - hoff
        ss += ((headPos, headPos + c - 1, singles)); singles += c
        headPos += c; hi += 1; hoff = 0
      }
    }
    (hs.toSeq, ss.toSeq, pairs)
  }

  /** NON-SPLITTING sequence packing, pack depth 2 — the
    * largest-with-smallest two-pointer pairing (first-fit-decreasing
    * pair tier; the depth-2 baseline of histogram packing à la Kosec
    * et al., "Packing: Towards 2x NLP BERT Acceleration", 2021).
    * Unlike [[packSequences]] (GPT-style greedy concat that SPLITS
    * documents at pack boundaries), every document here lands whole in
    * exactly one pack of token budget `budget`: lengths sort
    * descending, the longest unpaired doc takes the shortest remaining
    * doc iff they fit together, else it packs alone. Oversize docs
    * (`n_tokens > budget`) pack alone by construction. Output:
    * `(id, n_tokens, pack_id, slot)` — pair packs first (`slot` 0 =
    * the long side, 1 = the short side), then singles; integers only.
    *
    * Shape for scale — histogram algorithm, distributive assignment:
    * the ONLY driver state is the length histogram (bounded by
    * distinct token counts, NOT corpus size) walked in O(distinct)
    * run batches ([[pairWalk]]); documents never sort globally.
    * Per-doc positions come from two-level ranking — `row_number`
    * within `(length, mix64-bucket)` partitions (buckets bound every
    * sort partition at 1/`buckets` of a length run — no hot partition
    * for a viral length) plus driver/length-relation offsets — and
    * packs attach via a broadcast range-join against the O(distinct)
    * segment table. Two narrow-row shuffles total (count agg + rank),
    * text never moves.
    *
    * Contract: `idCol` must be unique (duplicate ids make the
    * within-bucket ordinal — and therefore the assignment — ambiguous;
    * same contract as [[graft.operators.Dedup.exact]]). Pack depth is
    * deliberately 2: deeper first-fit packing needs O(#packs) driver
    * state, which scales with the CORPUS — this tier's driver state is
    * the histogram alone. For unbounded depth use [[packSequences]],
    * which splits at pack boundaries instead.
    */
  def packPairs(df: DataFrame, textCol: String, idCol: String,
      budget: Long, buckets: Int = 1024,
      checkpointDir: Option[String] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val nTok = when(coalesce(length(trim(col(textCol))), lit(0)) === 0,
      lit(0L))
      .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
    // the narrow (id, n_tokens, bucket) relation feeds THREE consumers
    // (histogram collect, bucket counts, ranking) — materialize it once
    // so the WIDE text column is scanned and tokenized a single time;
    // cluster runs pass checkpointDir for reliable blocks (the
    // trigramLmScore contract)
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    def mat(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint() else d.localCheckpoint()
    val base = mat(df.select(col(idCol).cast("long").as("id"),
      nTok.as("n_tokens"),
      pmod(graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")),
        lit(buckets.toLong)).as("_b")))
    // histogram: bounded by DISTINCT token counts (cap extreme doc
    // lengths upstream if the corpus allows multi-million-token docs)
    val hist = base.groupBy(col("n_tokens")).agg(count(lit(1)).as("_c"))
      .orderBy(col("n_tokens").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    val (headSegs, singleSegs, nPairs) = pairWalk(hist, budget)
    val spark = df.sparkSession
    import spark.implicits._
    // run-start offsets per length (driver cumsum over the histogram)
    val lenOff = {
      var acc = 0L
      hist.map { case (l, c) => val off = acc; acc += c; (l, off) }
    }
    val lenOffDf = lenOff.toSeq.toDF("n_tokens", "_lenoff")
    // exclusive per-bucket offsets within each length (small relation)
    val bCounts = base.groupBy(col("n_tokens"), col("_b"))
      .agg(count(lit(1)).as("_bc"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_tokens")).orderBy(col("_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bOff = bCounts.withColumn("_boff",
      coalesce(sum(col("_bc")).over(wB), lit(0L)))
      .select(col("n_tokens"), col("_b"), col("_boff"))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_tokens"), col("_b")).orderBy(col("id"))
    val ranked = base
      .join(broadcast(lenOffDf), Seq("n_tokens"))
      .join(broadcast(bOff), Seq("n_tokens", "_b"))
      .withColumn("_pos",
        col("_lenoff") + col("_boff") + row_number().over(wR))
    val segDf = (headSegs.map { case (lo, hi0, b) => (0, lo, hi0, b) } ++
      singleSegs.map { case (lo, hi0, b) => (2, lo, hi0, b) })
      .toDF("_kind", "_lo", "_hi", "_base")
    ranked.join(broadcast(segDf),
        col("_pos").between(col("_lo"), col("_hi")), "left")
      .select(col("id"), col("n_tokens"),
        when(col("_kind") === 0, col("_base") + (col("_pos") - col("_lo")))
          .when(col("_kind") === 2,
            lit(nPairs) + col("_base") + (col("_pos") - col("_lo")))
          .otherwise(lit(n) - col("_pos")).as("pack_id"),
        when(col("_kind").isNull, lit(1)).otherwise(lit(0))
          .cast("int").as("slot"))
  }

  /** [[packPairs]] per stratum — the training norm (packs never mix
    * languages/sources): each stratum runs its own two-pointer walk
    * over its own length histogram, and pack ids offset by the
    * cumulative pack counts of earlier strata (stratum STRING order),
    * so ids stay globally unique. Output: `(id, <stratumCol>,
    * n_tokens, pack_id, slot)`.
    *
    * Same scale shape as [[packPairs]] — driver state is now
    * strata × distinct-lengths histograms (stratumCol must be
    * low-cardinality: languages, sources; NOT user ids), positions
    * rank within `(stratum, length, bucket)`, segments broadcast with
    * a stratum key. Same unique-`idCol` contract; null strata are the
    * caller's problem (coalesce first).
    */
  def packPairsBy(df: DataFrame, textCol: String, idCol: String,
      stratumCol: String, budget: Long, buckets: Int = 1024,
      checkpointDir: Option[String] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val nTok = when(coalesce(length(trim(col(textCol))), lit(0)) === 0,
      lit(0L))
      .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
    // same three-consumer materialization as packPairs
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    def mat(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint() else d.localCheckpoint()
    val base = mat(df.select(col(idCol).cast("long").as("id"),
      col(stratumCol).cast("string").as("_s"), nTok.as("n_tokens"),
      pmod(graft.functions.TextKernelExprs.mix64(col(idCol).cast("long")),
        lit(buckets.toLong)).as("_b")))
    val histAll = base.groupBy(col("_s"), col("n_tokens"))
      .agg(count(lit(1)).as("_c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val strata = histAll.map(_._1).distinct.sorted
    val lenOffRows = Seq.newBuilder[(String, Long, Long)]
    val segRows = Seq.newBuilder[(String, Int, Long, Long, Long)]
    val infoRows = Seq.newBuilder[(String, Long, Long, Long)]
    var packOff = 0L
    strata.foreach { s =>
      val hist = histAll.filter(_._1 == s)
        .map(t => (t._2, t._3)).sortBy(-_._1)
      val n = hist.map(_._2).sum
      var acc = 0L
      hist.foreach { case (l, c) =>
        lenOffRows += ((s, l, acc)); acc += c
      }
      val (hs, ss, nPairs) = pairWalk(hist, budget)
      hs.foreach { case (lo, hi, b) => segRows += ((s, 0, lo, hi, b)) }
      ss.foreach { case (lo, hi, b) => segRows += ((s, 2, lo, hi, b)) }
      infoRows += ((s, n, nPairs, packOff))
      packOff += n - nPairs // pairs + singles = n - nPairs packs
    }
    val spark = df.sparkSession
    import spark.implicits._
    val lenOffDf = lenOffRows.result().toDF("_s", "n_tokens", "_lenoff")
    val segDf = segRows.result().toDF("_s", "_kind", "_lo", "_hi", "_base")
    val infoDf = infoRows.result().toDF("_s", "_ns", "_np", "_po")
    val bCounts = base.groupBy(col("_s"), col("n_tokens"), col("_b"))
      .agg(count(lit(1)).as("_bc"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_s"), col("n_tokens")).orderBy(col("_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bOff = bCounts.withColumn("_boff",
      coalesce(sum(col("_bc")).over(wB), lit(0L)))
      .select(col("_s"), col("n_tokens"), col("_b"), col("_boff"))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_s"), col("n_tokens"), col("_b")).orderBy(col("id"))
    val ranked = base
      .join(broadcast(lenOffDf), Seq("_s", "n_tokens"))
      .join(broadcast(bOff), Seq("_s", "n_tokens", "_b"))
      .join(broadcast(infoDf), Seq("_s"))
      .withColumn("_pos",
        col("_lenoff") + col("_boff") + row_number().over(wR))
    ranked.join(broadcast(segDf),
        ranked("_s") === segDf("_s") &&
          col("_pos").between(col("_lo"), col("_hi")), "left")
      .select(ranked("id"), ranked("_s").as(stratumCol),
        ranked("n_tokens"),
        (col("_po") +
          when(col("_kind") === 0, col("_base") + (col("_pos") - col("_lo")))
            .when(col("_kind") === 2,
              col("_np") + col("_base") + (col("_pos") - col("_lo")))
            .otherwise(col("_ns") - col("_pos"))).as("pack_id"),
        when(col("_kind").isNull, lit(1)).otherwise(lit(0))
          .cast("int").as("slot"))
  }

  /** Chunk-level exact dedup statistics (CCNet-style): split each doc
    * into fixed `chunkWords`-word chunks, fingerprint each chunk, elect
    * the corpus-wide first occurrence (minimum `(id, chunk_idx)`) per
    * fingerprint, and report `(id, n_chunks, n_kept)` — `n_kept` is the
    * number of chunks this doc is the first to contribute. Downstream,
    * `n_kept / n_chunks` is the doc's novel-content ratio; rebuilding
    * the deduplicated text is a filter + re-aggregation over the same
    * chunk relation.
    *
    * Scale shape: the winner election shuffles only (fingerprint, id,
    * chunk_idx) — ~24 bytes per chunk, never the text; map-side partial
    * `min` bounds the exchange by distinct fingerprints per partition.
    * A viral chunk (boilerplate header duplicated across millions of
    * docs) is one hot fingerprint group reduced by `min` — an
    * associative aggregate, not a windowed sort. Per-doc keep counts
    * come from RE-AGGREGATING THE WINNERS by winner id (one row per
    * distinct chunk) — never by joining the winner set back against the
    * full chunk relation, which would be a second corpus-sized shuffle.
    */
  def chunkDedupStats(df: DataFrame, textCol: String, idCol: String,
      chunkWords: Int = 50): DataFrame = {
    val chunks = chunkRelation(df, textCol, idCol, chunkWords, chunkWords)
      .select(col("id"), col("chunk_idx"),
        graft.functions.TextKernelExprs.polyHash(col("chunk_text"))
          .as("_fp"))
    val kept = chunks.groupBy(col("_fp"))
      .agg(min(struct(col("id"), col("chunk_idx"))).as("_w"))
      .groupBy(col("_w.id").as("id"))
      .agg(count(lit(1)).as("n_kept"))
    val counts = chunks.groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"))
    df.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Benchmark decontamination: flag documents sharing any word `n`-gram
    * with a benchmark corpus. Returns every row of `df` with
    * `n_shared_grams` (distinct grams also present in the benchmark) and
    * `contaminated` (0/1).
    *
    * Shape for scale: the benchmark gram set is small (eval suites are
    * MBs, corpora are TBs) — distinct it and BROADCAST it into the
    * gram-level semi-match, so the corpus is touched in one pass with no
    * all-to-all shuffle; the per-doc count is one hash aggregation.
    */
  def decontaminate(df: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int = 4): DataFrame = {
    def grams(toks: Column): Column = wordGrams(toks, n)
    val benchGrams = bench
      .select(words(col(textCol)).as("_toks"))
      .select(explode(grams(col("_toks"))).as("_g")).distinct()
    val hits = df
      .select(col(idCol).as("id"), words(col(textCol)).as("_toks"))
      .select(col("id"), explode(grams(col("_toks"))).as("_g"))
      .join(broadcast(benchGrams), Seq("_g"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared_grams"))
    df.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated",
        (col("n_shared_grams") > 0).cast("int"))
  }

  /** Containment-scored (fuzzy) decontamination — the measure real eval
    * hygiene uses (GPT-3 appx. C / Llama style): a benchmark ITEM is
    * compromised in a document when the document covers at least
    * `tauPerMille`‰ of the item's distinct word `n`-grams, not merely
    * ANY gram ([[decontaminate]]'s binary form). Returns one row per
    * (document, benchmark item) pair sharing at least one gram:
    * `(id, bench_id, n_match, n_bench, flagged)` — all integer columns,
    * `flagged = n_match·1000 >= tauPerMille·n_bench` (integer
    * cross-multiply, no division anywhere).
    *
    * Shape for scale: the benchmark gram table (item id, gram, item
    * gram count) is eval-suite-sized — broadcast; the corpus is touched
    * in one exploded pass and the per-(doc, item) count is one hash
    * aggregation. Output cardinality is bounded by docs × the items
    * they actually overlap (sparse in practice; the exact-match q63
    * tier prefilters at 100 TB).
    */
  def containmentDecontaminate(df: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 4,
      tauPerMille: Int = 800): DataFrame = {
    require(tauPerMille >= 1 && tauPerMille <= 1000,
      s"tauPerMille must be in [1, 1000], got $tauPerMille")
    val bg = bench.select(col(idCol).cast("long").as("bench_id"),
        words(col(textCol)).as("_toks"))
      .select(col("bench_id"), explode(wordGrams(col("_toks"), n)).as("_g"))
    val bsz = bg.groupBy(col("bench_id")).agg(count(lit(1)).as("n_bench"))
    val bgrams = bg.join(bsz, Seq("bench_id"))
    df.select(col(idCol).cast("long").as("id"),
        words(col(textCol)).as("_toks"))
      .select(col("id"), explode(wordGrams(col("_toks"), n)).as("_g"))
      .join(broadcast(bgrams), Seq("_g"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("n_match"), max(col("n_bench")).as("n_bench"))
      .select(col("id"), col("bench_id"), col("n_match"), col("n_bench"),
        (col("n_match") * 1000 >= lit(tauPerMille) * col("n_bench"))
          .cast("int").as("flagged"))
  }

  /** Distinct word `n`-grams of a pre-materialized token array.
    *
    * The token array must be its OWN projection column before this
    * lambda: HOF lambdas run interpreted, and an expression argument
    * referenced inside one is re-evaluated per element — an inline
    * regexp+split would run once per gram instead of once per doc
    * (9-13× slowdown measured, same trap as q20).
    */
  private def wordGrams(toks: Column, n: Int): Column = {
    val k = size(toks)
    // sequence(1, 0) is descending, not empty — guard short docs
    when(k < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), k - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(toks, i + j)): _*))))
  }

  /** Bloom-gated benchmark decontamination: the constant-memory form of
    * [[decontaminate]] for reference sets too large to broadcast as a
    * hash set but trivially representable as an `mBits`-bit bloom
    * filter ([[graft.functions.Bloom]]). Returns every row of `df` with
    * `n_bloom_hits` (distinct grams whose k bloom probes all hit) and
    * `flagged` (0/1).
    *
    * `n_bloom_hits` OVER-counts by the filter's deterministic false
    * positives — callers route flagged docs to an exact verify (e.g.
    * [[decontaminate]] restricted to the flagged subset), which is the
    * point of the two-tier design: the exact join touches only the
    * tiny flagged fraction.
    *
    * Shape for scale: the benchmark aggregates to ONE `mBits/8`-byte
    * row (map-side OR-combine), broadcast to a 1-row nested-loop join;
    * the corpus is probed map-side in one pass — the only shuffle is
    * the per-doc count aggregation, carrying (id, partial-count).
    */
  def bloomDecontaminate(df: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int = 4, mBits: Int = graft.functions.Bloom.DefaultBits,
      k: Int = graft.functions.Bloom.DefaultK): DataFrame = {
    import graft.functions.{Bloom, TextKernelExprs}
    val bloom = bench
      .select(words(col(textCol)).as("_toks"))
      .select(explode(wordGrams(col("_toks"), n)).as("_g"))
      .agg(Bloom.agg(TextKernelExprs.polyHash(col("_g")), mBits, k)
        .as("_bloom"))
    val hits = df
      .select(col(idCol).as("id"), words(col(textCol)).as("_toks"))
      .select(col("id"), explode(wordGrams(col("_toks"), n)).as("_g"))
      .select(col("id"), TextKernelExprs.polyHash(col("_g")).as("_h"))
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("_bloom"), col("_h"), k))
      .groupBy(col("id")).agg(count(lit(1)).as("n_bloom_hits"))
    df.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bloom_hits"), lit(0L)).as("n_bloom_hits"))
      .withColumn("flagged", (col("n_bloom_hits") > 0).cast("int"))
  }

  /** BM25-family keyword relevance ranking: top-`topK` documents for a
    * fixed term set, Robertson/Sparck-Jones saturation weighting with a
    * ratio ("odds") idf — `(N - df + 0.5) / (df + 0.5)`, deliberately
    * WITHOUT the usual log so every arithmetic step is a basic IEEE
    * operation (add/mul/div) in a FIXED expression order: the score
    * doubles are then bit-identical on any engine that evaluates the
    * same expression tree, and can sit behind the exact-parity gate
    * (`ln` has no cross-library bit guarantee). Monotone in the
    * standard idf, so rankings agree where it matters.
    *
    * Returns `(id, dl, tf0..tfN, score, rank)` for the `topK` highest
    * scores (ties to lowest id).
    *
    * Shape for scale: tokens explode ONCE and filter to the query terms
    * scan-side, so the tf shuffle carries only matching tokens; global
    * stats (N, total length, per-term df) reduce to two 1-row frames
    * cross-joined broadcast; the final top-k is `orderBy().limit()` —
    * Catalyst's TakeOrderedAndProject, a per-partition heap + driver
    * merge, never a single-partition global sort of the corpus. The
    * row_number window runs on the already-collected `topK` rows only.
    */
  def bm25Rank(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      s"bm25Rank needs 1..16 terms, got ${terms.size}")
    val base = df
      .select(col(idCol).as("id"), words(col(textCol)).as("_toks"))
      .select(col("id"), size(col("_toks")).cast("long").as("dl"),
        col("_toks"))
    val toks = base
      .select(col("id"), col("dl"), explode(col("_toks")).as("_w"))
      .filter(col("_w").isin(terms: _*))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("_w") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = toks.groupBy(col("id"), col("dl"))
      .agg(tfCols.head, tfCols.tail: _*)
    val nRow = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val dfRow = perDoc.agg(dfCols.head, dfCols.tail: _*)
    val withStats = perDoc
      .crossJoin(broadcast(nRow)).crossJoin(broadcast(dfRow))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val odds = (col("n_docs").cast("double") -
        col(s"df$i").cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      odds * (tf * lit(k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    val scored = withStats.withColumn("score", score)
      .orderBy(col("score").desc, col("id")).limit(topK)
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
      .select(Seq(col("id"), col("dl")) ++
        terms.indices.map(i => col(s"tf$i")) ++
        Seq(col("score"), col("rank")): _*)
  }

  /** Per-group vocabulary profile — the corpus-health report a data
    * card wants per language/source: document count, token count,
    * vocabulary size, hapax-legomena count (tokens seen exactly once —
    * the Zipf tail; a collapsing hapax fraction flags templated/
    * machine-generated text) and the per-mille of all tokens covered by
    * the `topK` most frequent tokens (head concentration — boilerplate
    * pushes it up). All outputs are integers (`div` for the per-mille),
    * so the profile replays exactly on any engine.
    *
    * Shape for scale: one explode → (group, token) hash aggregation
    * (map-side partial, the shuffle carries distinct tokens per
    * partition); every profile column then derives from that counts
    * relation — materialized once, it feeds the totals aggregate AND
    * the WindowGroupLimit-capped top-k — plus a trivial doc-count agg.
    * Group count is assumed small (languages/sources, not users).
    */
  def vocabProfile(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tc = df.select(col(groupCol).as("grp"),
        words(col(textCol)).as("_toks"))
      .select(col("grp"), explode(col("_toks")).as("_w"))
      .groupBy(col("grp"), col("_w"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val aggs = tc.groupBy(col("grp")).agg(
      sum(col("_c")).as("n_tokens"),
      count(lit(1)).as("vocab_size"),
      sum(when(col("_c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("_c").desc, col("_w").asc)
    val top = tc.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= topK)
      .groupBy(col("grp")).agg(sum(col("_c")).as("_tk"))
    val docs = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    docs.join(aggs, Seq("grp"), "left").join(top, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("vocab_size"), lit(0L)).as("vocab_size"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        coalesce(expr("(_tk * 1000) div n_tokens"), lit(0L))
          .as("topk_permille"))
  }

  /** Bigram language-model cross-entropy scoring — the CCNet-class
    * "perplexity filter" (Wenzek et al. 2020): train add-α-smoothed
    * bigram statistics on the corpus ITSELF in one pass, then score
    * each document by its average negative log-probability. Documents
    * far above the corpus-typical entropy are gibberish/noise;
    * far below are boilerplate/templated — both ends are standard
    * curation drop zones.
    *
    * Per bigram type: `p = (c(w1,w2) + α) / (c(w1·) + α·V)` with
    * `c(w1·) = Σ_w2 c(w1,w2)` (so probabilities sum to <= 1 over the
    * observed vocabulary) and `V` = distinct successor words. The
    * per-bigram surprisal is banked as an INTEGER,
    * `floor(ln(p)·2^20)` — the kmeans scaled-int trick — so the
    * per-document sum is order-free and exact, and the single final
    * division `-Σ/(n·2^20)` is the only float rounding that depends on
    * the aggregate: bit-replayable on any engine.
    *
    * Output: `(id, n_bigrams, lp_micro, h_nats)` — one row per input
    * document; docs with < 2 tokens carry `n_bigrams = 0`, `lp_micro
    * = 0`, `h_nats = NULL`.
    *
    * Shape for scale: bigrams are pre-aggregated PER DOCUMENT first
    * (the shuffle carries distinct (id, bigram, count), bounded by
    * distinct bigrams per doc, not tokens); the model tables `cb`/`cp`
    * join back on gram keys as hash equi-joins — deliberately NOT
    * broadcast (a 100 TB corpus's bigram vocabulary is itself huge);
    * the final per-doc sum shuffles 24-byte rows. `docCnt` and `cb`
    * each feed multiple branches and are materialized once
    * (localCheckpoint — the semDedup lesson; lost-on-executor-death
    * caveat as for connectedComponents).
    */
  def bigramLmScore(df: DataFrame, textCol: String, idCol: String,
      alphaPerMille: Int = 500): DataFrame = {
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    val alpha = lit(alphaPerMille.toDouble / 1000.0)
    val toks = df.select(col(idCol).cast("long").as("id"),
      words(col(textCol)).as("_toks"))
    val docBg = toks.filter(size(col("_toks")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("_toks")) - 1),
        i => struct(element_at(col("_toks"), i).as("w1"),
          element_at(col("_toks"), i + 1).as("w2")))).as("_b"))
      .select(col("id"), col("_b.w1").as("_w1"), col("_b.w2").as("_w2"))
    val docCnt = docBg.groupBy(col("id"), col("_w1"), col("_w2"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val cb = docCnt.groupBy(col("_w1"), col("_w2"))
      .agg(sum(col("_c")).as("_cb"))
      .localCheckpoint()
    val cp = cb.groupBy(col("_w1")).agg(sum(col("_cb")).as("_cp"))
    val vocab = cb.agg(countDistinct(col("_w2")).as("_v"))
    val lp = floor(log((col("_cb").cast("double") + alpha) /
        (col("_cp").cast("double") + alpha * col("_v").cast("double"))) *
      lit(1048576.0)).cast("long")
    val scored = docCnt.join(cb, Seq("_w1", "_w2"))
      .join(cp, Seq("_w1"))
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("_c"), lp.as("_lp"))
    val perDoc = scored.groupBy(col("id"))
      .agg(sum(col("_c") * col("_lp")).as("lp_micro"),
        sum(col("_c")).as("n_bigrams"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lp_micro"), lit(0L)).as("lp_micro"),
        (-col("lp_micro").cast("double") /
          (col("n_bigrams").cast("double") * lit(1048576.0)))
          .as("h_nats"))
  }

  /** Trigram language-model scoring with stupid backoff (Brants et al.
    * 2007, "Large Language Models in Machine Translation") — the
    * web-scale upgrade of [[bigramLmScore]]: counts train on a
    * REFERENCE slice (`isTrain`), every document scores against the
    * frozen counts, and unseen trigrams back off
    * `trigram → 0.4·bigram → 0.4²·add-α-unigram` instead of smearing
    * α-mass over the cubic trigram space. Per trigram position:
    *
    *   s = c3(w1w2w3)/c2(w1w2)                        if c3 > 0
    *     | 0.4 · c2(w2w3)/c1(w2)                      else if c2(w2w3) > 0
    *     | 0.4² · (c1(w3)+α)/(N+α·V)                  otherwise
    *
    * (each ratio one double division, one multiply chain, ONE `ln` —
    * bit-identical on any IEEE engine), banked as
    * `floor(ln(s)·2^20)` (the q96 surprisal trick) so per-document
    * sums are order-free and exact. Output: `(id, n_trigrams,
    * lp_micro, h_nats)`; docs with < 3 tokens carry zeros and null
    * `h_nats`.
    *
    * Shape for scale: ONE tokenize+explode pass emits all three gram
    * levels (level-tagged rows — the keyed-union trick), pre-aggregated
    * PER DOCUMENT (the shuffle carries distinct (id, lvl, gram, count));
    * the three train model tables re-aggregate from that one
    * materialized relation in a second single pass and join back as
    * hash equi-joins — deliberately NOT broadcast (a 100 TB reference
    * slice's trigram vocabulary is itself huge); N/V ride a broadcast
    * 1-row crossJoin. Two materializations and one pass over the text
    * where there were three of each.
    */
  def trigramLmScore(df: DataFrame, textCol: String, idCol: String,
      isTrain: Column, alphaPerMille: Int = 500,
      checkpointDir: Option[String] = None): DataFrame = {
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    // the count tables materialize once and feed multiple join
    // branches; localCheckpoint blocks die with their executor, so a
    // real cluster run passes `checkpointDir` for RELIABLE checkpoints
    // (the connectedComponents/kmeansAssign contract — bound through
    // the shared global-slot guard)
    checkpointDir.foreach(
      Checkpoints.bindDir(df.sparkSession.sparkContext, _))
    def mat(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint() else d.localCheckpoint()
    val alpha = lit(alphaPerMille.toDouble / 1000.0)
    val base = df
      .filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(col(idCol).cast("long").as("id"),
        isTrain.cast("boolean").as("_t"), words(col(textCol)).as("_toks"))
    // ONE tokenize + explode pass produces EVERY gram level (guide
    // §1.2: three separate passes each re-ran the tokenizer over the
    // single-split scan — 2.2 s + 0.3 s + 1.6 s of single-task kernel
    // time at sf0.1): level-3 grams for ALL docs (they feed the per-doc
    // scoring counts and, re-aggregated, the train t3 table — sums of
    // per-doc counts ≡ direct counts), level-1/2 grams for TRAIN docs
    // only (they only feed the model tables, with the same per-doc →
    // global re-aggregation identity).
    val emptyG = array().cast(
      "array<struct<lvl:int,w1:string,w2:string,w3:string>>")
    val nullW = lit(null).cast("string")
    val g1 = transform(col("_toks"), w =>
      struct(lit(1).as("lvl"), w.as("w1"), nullW.as("w2"), nullW.as("w3")))
    val g2 = transform(sequence(lit(1), size(col("_toks")) - 1),
      i => struct(lit(2).as("lvl"), element_at(col("_toks"), i).as("w1"),
        element_at(col("_toks"), i + 1).as("w2"), nullW.as("w3")))
    val g3 = transform(sequence(lit(1), size(col("_toks")) - 2),
      i => struct(lit(3).as("lvl"), element_at(col("_toks"), i).as("w1"),
        element_at(col("_toks"), i + 1).as("w2"),
        element_at(col("_toks"), i + 2).as("w3")))
    val grams = base.select(col("id"), col("_t"), explode(concat(
        when(col("_t"), g1).otherwise(emptyG),
        when(col("_t") && size(col("_toks")) >= 2, g2).otherwise(emptyG),
        when(size(col("_toks")) >= 3, g3).otherwise(emptyG))).as("_g"))
      .select(col("id"), col("_t"), col("_g.lvl").as("lvl"),
        col("_g.w1").as("w1"), col("_g.w2").as("w2"),
        col("_g.w3").as("w3"))
    val counts = mat(grams
      .groupBy(col("id"), col("_t"), col("lvl"),
        col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("_c")))
    // the three train model tables come out of ONE aggregation pass
    // over the per-doc counts (they were three separate materialize
    // jobs before)
    val models = mat(counts.filter(col("_t"))
      .groupBy(col("lvl"), col("w1"), col("w2"), col("w3"))
      .agg(sum(col("_c")).as("_cn")))
    val t1 = models.filter(col("lvl") === 1)
      .select(col("w1").as("w"), col("_cn").as("_c1"))
    val t2m = models.filter(col("lvl") === 2)
      .select(col("w1").as("a"), col("w2").as("b"), col("_cn").as("_c2"))
    val t3 = models.filter(col("lvl") === 3)
      .select(col("w1"), col("w2"), col("w3"), col("_cn").as("_c3"))
    val nv = t1.agg(sum(col("_c1")).as("_n"),
      count(lit(1)).as("_v"))
    val d3 = counts.filter(col("lvl") === 3)
      .select(col("id"), col("w1"), col("w2"), col("w3"), col("_c"))
    val joined = d3
      .join(t3, Seq("w1", "w2", "w3"), "left")
      .join(t2m.select(col("a").as("w1"), col("b").as("w2"),
        col("_c2").as("_c2a")), Seq("w1", "w2"), "left")
      .join(t2m.select(col("a").as("w2"), col("b").as("w3"),
        col("_c2").as("_c2b")), Seq("w2", "w3"), "left")
      .join(t1.select(col("w").as("w2"), col("_c1").as("_c1b")),
        Seq("w2"), "left")
      .join(t1.select(col("w").as("w3"), col("_c1").as("_c1w")),
        Seq("w3"), "left")
      .crossJoin(broadcast(nv))
    val s = when(col("_c3").isNotNull,
        col("_c3").cast("double") / col("_c2a").cast("double"))
      .when(col("_c2b").isNotNull,
        lit(0.4) * (col("_c2b").cast("double") / col("_c1b").cast("double")))
      .otherwise(lit(0.4) * lit(0.4) *
        ((coalesce(col("_c1w"), lit(0L)).cast("double") + alpha) /
          (col("_n").cast("double") + alpha * col("_v").cast("double"))))
    val perDoc = joined
      .select(col("id"), col("_c"),
        floor(log(s) * lit(1048576.0)).cast("long").as("_lp"))
      .groupBy(col("id"))
      .agg(sum(col("_c") * col("_lp")).as("lp_micro"),
        sum(col("_c")).as("n_trigrams"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("lp_micro"), lit(0L)).as("lp_micro"),
        (-col("lp_micro").cast("double") /
          (col("n_trigrams").cast("double") * lit(1048576.0)))
          .as("h_nats"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-n-gram
    * log-likelihood ratio of a TARGET distribution (the high-quality
    * exemplar slice, e.g. a curated source) against the RAW corpus.
    * Features are unigrams + bigrams of [[words]], bucket-hashed into
    * `buckets` bins (`mix64(polyHash(gram)) >>> 12 mod B` — collisions
    * are part of the method); each corpus gets an add-α bag-of-words
    * model over the bins, and a document's log-weight is
    * `Σ_b c_b · (ln p_target[b] − ln p_raw[b])`.
    *
    * The per-bucket log-ratio is banked as an INTEGER,
    * `floor(Δln·2^20)` (the q96 surprisal trick), so the per-document
    * sum is order-free and exact and the only float emitted is the
    * exact power-of-two division `logw_micro / 2^20`: bit-replayable on
    * any engine.
    *
    * Output: `(id, n_feats, logw_micro, logw_nats)` — one row per input
    * document; null/whitespace-only text carries `n_feats = 0`,
    * `logw_micro = 0`, `logw_nats = NULL`.
    *
    * Shape for scale: features are pre-aggregated PER DOCUMENT first
    * (the shuffle carries distinct (id, bucket, count), bounded by
    * `buckets` per doc, not tokens); the global model table is ≤ B rows
    * — broadcast back onto the per-doc counts, so scoring is map-side;
    * the per-doc sum shuffles 24-byte rows. `docCnt` feeds both the
    * model and the scoring branch — materialized once (the semDedup
    * lesson).
    */
  /** The DSIR feature-bucket multiset of a document: unigram + adjacent
    * bigram grams, hashed `mix64(polyHash(gram)) >>> 12 mod B` — ONE
    * codegen'd call per document ([[graft.functions.DsirBuckets]]); the
    * explode then carries 8-byte bucket ids, never feature strings.
    */
  private def dsirBucketArray(toks: Column, buckets: Int): Column =
    graft.functions.TextKernelExprs.dsirBuckets(toks, buckets)

  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 1024,
      alphaPerMille: Int = 500): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 24),
      s"buckets must be in [2, 2^24], got $buckets")
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    val alpha = lit(alphaPerMille.toDouble / 1000.0)
    val toks = df
      .filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(col(idCol).cast("long").as("id"),
        isTarget.cast("boolean").as("_t"), words(col(textCol)).as("_toks"))
    val docCnt = toks.select(col("id"), col("_t"),
        explode(dsirBucketArray(col("_toks"), buckets)).as("_b"))
      .groupBy(col("id"), col("_t"), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    // ≤ `buckets` rows, but it feeds BOTH `tot` and `lr` — materialize
    // so the docCnt→bucket aggregation pass runs once, not twice
    val gb = docCnt.groupBy(col("_b"))
      .agg(sum(when(col("_t"), col("_c")).otherwise(lit(0L))).as("_ct"),
        sum(col("_c")).as("_cr"))
      .localCheckpoint()
    val tot = gb.agg(sum(col("_ct")).as("_tt"), sum(col("_cr")).as("_tr"))
    def lnp(c: Column, t: Column): Column =
      log((c.cast("double") + alpha) /
        (t.cast("double") + alpha * lit(buckets.toDouble)))
    val lr = gb.crossJoin(broadcast(tot))
      .select(col("_b"),
        floor((lnp(col("_ct"), col("_tt")) - lnp(col("_cr"), col("_tr"))) *
          lit(1048576.0)).cast("long").as("_lr"))
    val perDoc = docCnt.join(broadcast(lr), Seq("_b"))
      .groupBy(col("id"))
      .agg(sum(col("_c") * col("_lr")).as("logw_micro"),
        sum(col("_c")).as("n_feats"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"),
        (col("logw_micro").cast("double") / lit(1048576.0))
          .as("logw_nats"))
  }

  /** DSIR resampling: Gumbel top-k over [[dsirWeights]] — keep the `k`
    * documents maximizing `logw + g_i`, where `g_i = −ln(−ln(u_i))` is
    * deterministic Gumbel noise from the document's own salted mix64
    * stream (`u_i = ((mix64(id + salt) >>> 12) + 0.5) / 2^52`). This IS
    * sampling-without-replacement proportional to `exp(logw)` (the
    * Gumbel-max trick), yet every engine/run/partitioning elects the
    * same set. The key is banked as `key_micro = floor(key·2^20)` so
    * the rank order never hinges on a final-ulp double comparison;
    * zero-feature docs compete with `logw = 0` (weight 1) like the
    * paper's untokenizable tail.
    *
    * Output: `(id, n_feats, logw_nats, key_micro, sample_rank)` for the
    * k kept documents.
    *
    * Shape for scale: the rank input is a 24-byte (id, key) projection
    * — text never reaches the sort — and the literal rank-limit filter
    * triggers WindowGroupLimit, so each map task keeps its local top-k
    * before the single exchange (O(k·tasks) rows, not the corpus).
    */
  def dsirResample(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, k: Int, buckets: Int = 1024,
      alphaPerMille: Int = 500, salt: Long = 60067303L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = dsirWeights(df, textCol, idCol, isTarget, buckets,
      alphaPerMille)
    val u = (shiftrightunsigned(graft.functions.TextKernelExprs.mix64(
        col("id") + lit(salt)), 12).cast("double") + lit(0.5)) /
      lit(4503599627370496.0)
    val keyMicro = floor((coalesce(col("logw_nats"), lit(0.0)) +
        -log(-log(u))) * lit(1048576.0)).cast("long")
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("key_micro").desc, col("id").asc)
    w.select(col("id"), col("n_feats"), col("logw_nats"),
        keyMicro.as("key_micro"))
      .withColumn("sample_rank", row_number().over(win).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** A trained, frozen DSIR model: the ≤`buckets` banked log-ratios
    * plus the never-observed-bucket constant (`ln((α/(T_t+αB)) /
    * (α/(T_r+αB)))` banked — what an unseen gram contributes when the
    * model scores NEW data). Small by construction (≤ B entries), so it
    * ships to executors as a literal, like IVF's bounded centroid
    * collect.
    */
  final case class DsirModel(buckets: Int, alphaPerMille: Int,
      lrMicro: Map[Long, Long], defaultLrMicro: Long)

  /** Train a [[DsirModel]] on a corpus — the offline half of the
    * production DSIR shape (train once on a reference crawl, score
    * every incoming batch/stream against the frozen model). The bank
    * arithmetic is the exact [[dsirWeights]] chain (same `Math.log` /
    * `Math.floor` on the same doubles), so scoring the training corpus
    * with the frozen model reproduces `dsirWeights` bit-for-bit.
    *
    * Shape for scale: one feature pass → a ≤`buckets`-row aggregate →
    * a bounded driver collect (≤ B rows of 24 bytes).
    */
  def dsirTrain(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 1024,
      alphaPerMille: Int = 500): DsirModel = {
    require(buckets >= 2 && buckets <= (1 << 24),
      s"buckets must be in [2, 2^24], got $buckets")
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    val rows = df
      .filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(isTarget.cast("boolean").as("_t"),
        words(col(textCol)).as("_toks"))
      .select(col("_t"),
        explode(dsirBucketArray(col("_toks"), buckets)).as("_b"))
      .groupBy(col("_b"))
      .agg(sum(when(col("_t"), 1L).otherwise(0L)).as("_ct"),
        count(lit(1)).as("_cr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val alpha = alphaPerMille.toDouble / 1000.0
    val tt = rows.map(_._2).sum
    val tr = rows.map(_._3).sum
    def lnp(c: Long, t: Long): Double =
      math.log((c + alpha) / (t + alpha * buckets))
    def bank(ct: Long, cr: Long): Long =
      math.floor((lnp(ct, tt) - lnp(cr, tr)) * 1048576.0).toLong
    DsirModel(buckets, alphaPerMille,
      rows.map(r => r._1 -> bank(r._2, r._3)).toMap, bank(0L, 0L))
  }

  /** Score documents against a frozen [[DsirModel]] — a STATELESS
    * scan-side projection, so the same call compiles onto a batch scan
    * or a structured stream with no state, no watermark, and
    * bit-identical output (asserted by StreamingParitySpec). Output
    * matches [[dsirWeights]]: `(id, n_feats, logw_micro, logw_nats)`.
    *
    * The whole per-document score is ONE codegen'd
    * [[graft.functions.DsirScore]] call over the token array (the
    * dense ≤B-entry model rides into generated code as a reference
    * object) — an HOF-lambda formulation of the same sum ran the
    * per-gram hash interpreted and was 4× slower on the full corpus.
    * `n_feats` needs no second pass: unigrams + adjacent bigrams of n
    * tokens are exactly 2n−1 features.
    */
  def dsirScoreFrozen(df: DataFrame, textCol: String, idCol: String,
      model: DsirModel): DataFrame = {
    val nonEmpty = coalesce(length(trim(col(textCol))), lit(0)) > 0
    val lrArr = (0 until model.buckets).map(b =>
      model.lrMicro.getOrElse(b.toLong, model.defaultLrMicro)).toArray
    val base = df.select(col(idCol).cast("long").as("id"),
      when(nonEmpty, words(col(textCol)))
        .otherwise(array().cast("array<string>")).as("_tk"))
    base.select(col("id"),
        when(size(col("_tk")) === 0, lit(0L))
          .otherwise(size(col("_tk")).cast("long") * 2 - 1).as("n_feats"),
        graft.functions.TextKernelExprs.dsirScore(col("_tk"),
          model.buckets, lrArr).as("logw_micro"))
      .select(col("id"), col("n_feats"), col("logw_micro"),
        when(col("n_feats") === 0, lit(null).cast("double"))
          .otherwise(col("logw_micro").cast("double") / lit(1048576.0))
          .as("logw_nats"))
  }

  /** Slice-divergence audit — the ingest-drift monitor ("which feature
    * mass moved between last week's crawl and this week's", or between
    * two sources): hashed unigram+bigram feature distributions of
    * slice A vs slice B, each bucket's add-α log-likelihood ratio
    * banked `floor(Δln·2^20)` (the DSIR feature space and bank,
    * surfaced as a symmetric report), and the `topK` most-shifted
    * buckets by |llr|. Positive `llr_micro` = over-represented in A.
    *
    * Output: `(bucket, c_a, c_b, llr_micro, rank)`, ranked
    * `(abs(llr_micro) desc, bucket asc)` — ≤ topK rows.
    *
    * Shape for scale: the gram explode aggregates straight to
    * ≤`buckets` groups (map-side partial agg — the exchange carries ≤
    * buckets rows per task, never gram strings); totals ride a 1-row
    * broadcast crossJoin; the rank window runs after a
    * `TakeOrderedAndProject` top-k cut of the ≤buckets relation.
    */
  def featureShift(df: DataFrame, textCol: String, isA: Column,
      isB: Column, buckets: Int = 1024, alphaPerMille: Int = 500,
      topK: Int = 50): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 24),
      s"buckets must be in [2, 2^24], got $buckets")
    require(alphaPerMille >= 1 && alphaPerMille <= 1000,
      s"alphaPerMille must be in [1, 1000], got $alphaPerMille")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val alpha = lit(alphaPerMille.toDouble / 1000.0)
    val base = df
      .filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(isA.cast("boolean").as("_a"), isB.cast("boolean").as("_b"),
        words(col(textCol)).as("_toks"))
      .filter(col("_a") || col("_b"))
    val gb = base.select(col("_a"), col("_b"),
        explode(dsirBucketArray(col("_toks"), buckets)).as("_bk"))
      .groupBy(col("_bk"))
      .agg(sum(when(col("_a"), lit(1L)).otherwise(lit(0L))).as("c_a"),
        sum(when(col("_b"), lit(1L)).otherwise(lit(0L))).as("c_b"))
    val tot = gb.agg(sum(col("c_a")).as("_ta"), sum(col("c_b")).as("_tb"))
    def lnp(c: Column, t: Column): Column =
      log((c.cast("double") + alpha) /
        (t.cast("double") + alpha * lit(buckets.toDouble)))
    val lr = gb.crossJoin(broadcast(tot))
      .select(col("_bk").as("bucket"), col("c_a"), col("c_b"),
        floor((lnp(col("c_a"), col("_ta")) - lnp(col("c_b"), col("_tb"))) *
          lit(1048576.0)).cast("long").as("llr_micro"))
    lr.orderBy(abs(col("llr_micro")).desc, col("bucket").asc).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("llr_micro")).desc, col("bucket").asc))
        .cast("long"))
  }
}
