package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016) — the
  * full iterative merge loop [[TextOps.bpePairCounts]] only takes the
  * first step of, plus the frozen encoder that turns the learned merge
  * table into real per-document token counts (upgrading q53's
  * whitespace/char-class proxy counts).
  *
  * Semantics (identical on every engine, replayed by the q117/q120
  * DuckDB oracles):
  *   - a word's initial tokens are its code points;
  *   - merge selection ranks corpus pair counts `(cnt desc, left asc,
  *     right asc)` — pair counts are word-frequency-weighted counts of
  *     ADJACENT token positions (overlapping occurrences each count,
  *     the reference BPE convention);
  *   - applying a merge is ONE left-to-right non-overlapping pass
  *     (`aaa` + merge `(a,a)` → `[aa, a]`);
  *   - encoding applies the N merges sequentially in rank order, one
  *     pass each. This equals greedy rank-order BPE encoding except in
  *     the degenerate case where a later merge manufactures a string
  *     equal to an earlier merge's operand — impossible for char-level
  *     rank-1 pairs and vanishingly rare after (documented trade for a
  *     loop-free, engine-replayable spec).
  *
  * Shape for scale: training follows the dsirTrain pattern — ONE
  * distributed word-count aggregation, a bounded top-`maxVocab`
  * election (`TakeOrderedAndProject`, never a full sort), one driver
  * collect of ≤ maxVocab (word, count) rows, then a driver-side merge
  * loop costing O(maxVocab · avgWordLen) per merge. This is the same
  * bounded-memory shape production tokenizer trainers use (word-count
  * table in memory); the dropped tail mass is reported on the model.
  * Scoring is a stateless scan-side codegen'd projection (the merge
  * table rides into generated code as a reference object), so the
  * frozen encoder is stream-capable like [[TextOps.DsirModel]] scoring.
  */
object Bpe {

  /** One learned merge: `left + right -> left ++ right`, with the
    * corpus pair count at election time.
    */
  final case class Merge(left: String, right: String, cnt: Long)

  /** A trained, frozen BPE model: the ranked merge list (rank = list
    * order), the share of corpus word mass the training vocabulary
    * covered (1000 = the top-`maxVocab` election dropped nothing), and
    * the base character inventory of the training vocabulary (sorted
    * ascending — the id-numbering base for [[tokenIds]]; empty when
    * rehydrated from a merge table, which doesn't carry it).
    * `byteLevel` models (from [[bpeTrainBytes]]) decompose pretokens
    * into UTF-8 BYTES over the fixed 256-symbol [[byteVocab]] base —
    * ids 0..255 are byte values, so NO input can ever encode to -1.
    */
  final case class BpeModel(merges: Seq[Merge], coveragePerMille: Long,
      chars: Seq[String] = Nil, byteLevel: Boolean = false) {
    def lefts: Seq[String] = merges.map(_.left)
    def rights: Seq[String] = merges.map(_.right)
    /** The id-numbered vocabulary: chars (sorted; the 256 byte symbols
      * for a byteLevel model) get 0..C-1, merge products C..C+N-1 in
      * rank order. A duplicate string keeps its minimum id; tokens
      * outside this set encode as -1 (impossible when byteLevel).
      */
    def vocabTokens: Seq[String] = chars ++ merges.map(m => m.left + m.right)
  }

  /** GPT-2-class pretokenization pattern, restricted to the
    * lookahead-free regex subset RE2 and Java share so external engines
    * replay it verbatim: letter runs, digit runs and punctuation runs
    * each claim one optional leading space; residual whitespace runs
    * are their own pretokens. (The original GPT-2 pattern's
    * `\\s+(?!\\S)` lookahead — which splits the LAST space of an
    * interior multi-space run onto the following word — is the one
    * construct dropped; contractions ('s, 'll, …) fold into the
    * punctuation-run branch.)
    */
  val preTokenPattern: String =
    " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pretoken array column: case-preserving, spaces attach to the
    * following word (the byte-level BPE convention, vs
    * [[TextOps.words]]' lowercase whitespace split).
    */
  def preTokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(text, lit(preTokenPattern), lit(0))

  /** The fixed byte-level base vocabulary: 256 single-char strings,
    * index = byte value (chars 128-255 use the latin-1 code point, the
    * standard byte⇄char embedding).
    */
  val byteVocab: Seq[String] = (0 until 256).map(b => String.valueOf(b.toChar))

  /** A pretoken's initial token list under a byteLevel model: its
    * UTF-8 bytes, each embedded as the single char with that code
    * point — every input decomposes into [[byteVocab]], so byte-level
    * encoding is total (no out-of-charset -1).
    */
  private[graft] def byteTokens(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(((bytes(i) & 0xff)).toChar)
      i += 1
    }
    out
  }

  /** A word's initial token list: its code points (NOT UTF-16 units —
    * matches character indexing in external engines).
    */
  private[graft] def charTokens(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** One left-to-right non-overlapping pass of merge `(a, b)`. */
  private[graft] def applyMerge(toks: Array[String], a: String,
      b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** The driver-side merge loop over a collected (word, count) vocab —
    * INCREMENTAL pair counting (the production trainer shape): pair
    * counts and a `pair → containing-words` inverted index build once;
    * each merge elects the best pair from an ordered count set in
    * O(log P) and rewrites ONLY the words containing that pair,
    * delta-updating the counts their adjacency multiset changed by.
    * Per-merge cost is O(affected words · their length + log P)
    * instead of the naive full-vocab rescan's O(V · avgLen) — the
    * difference between hours and minutes on a 50k-merge / 1M-word
    * production run. Semantics are EXACTLY the rescan reference
    * ([[trainMergesRescan]], property-tested equal): all-integer pair
    * counts, tie-break `(cnt desc, left asc, right asc)` under
    * code-unit string order, stop early when no pair remains.
    */
  private[graft] def trainMerges(vocab: Seq[(String, Long)],
      nMerges: Int,
      decompose: String => Array[String] = charTokens): Seq[Merge] = {
    import scala.collection.mutable
    val words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (decompose(w), c) }.toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // best-first: (cnt desc, left asc, right asc); entries are removed
    // BEFORE their count changes, so set order stays consistent
    val heap = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String,
        Ordering.String))
    def bump(a: String, b: String, delta: Long): Unit = {
      val key = (a, b)
      val old = counts.getOrElse(key, 0L)
      if (old > 0) heap.remove((old, a, b))
      val next = old + delta
      if (next > 0) { counts(key) = next; heap.add((next, a, b)) }
      else counts.remove(key)
    }
    def indexPairs(wi: Int, toks: Array[String], c: Long,
        sign: Long): Unit = {
      var j = 0
      while (j < toks.length - 1) {
        val key = (toks(j), toks(j + 1))
        bump(toks(j), toks(j + 1), sign * c)
        if (sign > 0)
          where.getOrElseUpdate(key, mutable.BitSet.empty) += wi
        j += 1
      }
    }
    var wi = 0
    while (wi < words.length) {
      indexPairs(wi, words(wi)._1, words(wi)._2, 1L)
      wi += 1
    }
    val merges = Seq.newBuilder[Merge]
    var k = 0
    while (k < nMerges && heap.nonEmpty) {
      val (c, a, b) = heap.head
      merges += Merge(a, b, c)
      // snapshot: indexPairs mutates `where` while we iterate
      val affected = where.getOrElse((a, b), mutable.BitSet.empty).toArray
      var i = 0
      while (i < affected.length) {
        val w = affected(i)
        val (toks, wc) = words(w)
        indexPairs(w, toks, wc, -1L) // retract the old adjacency multiset
        val nt = applyMerge(toks, a, b)
        words(w) = (nt, wc)
        indexPairs(w, nt, wc, 1L)
        i += 1
      }
      // the merged pair is fully consumed; drop its (now stale) index
      where.remove((a, b))
      k += 1
    }
    merges.result()
  }

  /** The naive full-rescan merge loop — the semantics REFERENCE the
    * incremental [[trainMerges]] must reproduce exactly (BpeSpec
    * equality checks). Recomputes every pair count from every word per
    * merge: O(V · avgLen) per step, fine at test scale only.
    */
  private[graft] def trainMergesRescan(vocab: Seq[(String, Long)],
      nMerges: Int,
      decompose: String => Array[String] = charTokens): Seq[Merge] = {
    var ws: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (decompose(w), c) }.toArray
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var dry = false
    while (k < nMerges && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      ws.foreach { case (t, c) =>
        var j = 0
        while (j < t.length - 1) {
          val key = (t(j), t(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          j += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), c) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        merges += Merge(a, b, c)
        ws = ws.map { case (t, c2) => (applyMerge(t, a, b), c2) }
        k += 1
      }
    }
    merges.result()
  }

  /** Train a [[BpeModel]]: one word-count aggregation, a bounded
    * top-`maxVocab` election `(count desc, word asc)`, one ≤ maxVocab
    * driver collect, then [[trainMerges]]. Empty/whitespace-only
    * documents are excluded (the dsirWeights guard).
    */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 1 << 20): BpeModel = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    // materialized ONCE: both the top-V election and the total-mass
    // aggregation consume this relation — without it each would re-run
    // the full tokenize+explode+count pass over the corpus
    val wc = df
      .filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // total mass + top-V mass in one bounded pass each; the top-V
    // election plans as TakeOrderedAndProject (per-task heap, one
    // exchange of ≤ maxVocab rows), never a global sort
    val top = wc.orderBy(col("c").desc, col("w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val totalMass = wc.agg(sum(col("c"))).collect()(0).getLong(0)
    val topMass = top.iterator.map(_._2).sum
    val cov = if (totalMass == 0L) 1000L else topMass * 1000L / totalMass
    val chars = top.iterator.flatMap { case (w, _) => charTokens(w) }
      .toSeq.distinct.sorted
    BpeModel(trainMerges(top, nMerges), cov, chars)
  }

  /** Byte-level training (the GPT-2-class tokenizer family): pretokens
    * from the [[preTokenPattern]] regex pre-split (case-preserving,
    * space-prefixed words), initial decomposition into UTF-8 bytes
    * over the fixed 256-symbol [[byteVocab]] base. Same bounded
    * election + driver merge loop as [[bpeTrain]]; the resulting model
    * encodes EVERY input with no out-of-charset -1 (any char's UTF-8
    * bytes are all in the base).
    */
  def bpeTrainBytes(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 1 << 20): BpeModel = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    // materialized ONCE — same two-consumer shape as bpeTrain
    val wc = df
      .filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(explode(preTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val top = wc.orderBy(col("c").desc, col("w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val totalMass = wc.agg(sum(col("c"))).collect()(0).getLong(0)
    val topMass = top.iterator.map(_._2).sum
    val cov = if (totalMass == 0L) 1000L else topMass * 1000L / totalMass
    BpeModel(trainMerges(top, nMerges, byteTokens), cov, byteVocab,
      byteLevel = true)
  }

  /** The learned merge table as a relation:
    * `(rank, pair_left, pair_right, merged, cnt)`.
    */
  def mergeTable(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case (m, i) => (i + 1L, m.left, m.right, m.left + m.right, m.cnt) }
      .toDF("rank", "pair_left", "pair_right", "merged", "cnt")
  }

  /** The real tokenization artifact: `(id, pos, token_id)` — each
    * document's frozen-BPE token-ID sequence in order (`pos` is the
    * 0-based global token index). Ids number the model's vocabulary:
    * base characters (sorted) then merge products in rank order;
    * tokens outside the vocabulary encode as -1 (the audit signal that
    * the training charset missed something). Empty/whitespace-only
    * docs emit no rows.
    *
    * A stateless scan-side projection (ONE codegen'd call per document
    * + a posexplode) — stream-capable like [[tokenCounts]]; this is
    * the relation sequence packing and training shards consume.
    */
  def tokenIds(df: DataFrame, textCol: String, idCol: String,
      model: BpeModel): DataFrame = {
    require(model.chars.nonEmpty,
      "model carries no charset (rehydrated from a merge table?) — " +
        "train with bpeTrain to number a vocabulary")
    val toks = if (model.byteLevel) preTokens(col(textCol))
      else TextOps.words(col(textCol))
    df.filter(coalesce(length(trim(col(textCol))), lit(0)) > 0)
      .select(col(idCol).cast("long").as("id"),
        graft.functions.TextKernelExprs.bpeTokenIds(
          toks, model.lefts, model.rights,
          model.vocabTokens, model.byteLevel).as("_ids"))
      .select(col("id"), posexplode(col("_ids")).as(Seq("pos", "token_id")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("token_id"))
  }

  /** Decode a [[tokenIds]] relation back to text — the artifact
    * INTEGRITY check (and the eval-time detokenizer): token ids map
    * through the numbered vocabulary, concatenate in `(id, pos)`
    * order, and the byte-embedded chars re-decode as UTF-8. Byte-level
    * models round-trip EXACTLY (the pretokenizer's segments partition
    * the string), so `decode(tokenIds(text)) == text` — the q137
    * gate. Output: `(id, text_decoded)`.
    *
    * Shape for scale: the ≤(256+merges)-entry vocabulary rides as an
    * array literal (one `element_at` per token), and the reassembly is
    * one hash aggregation keyed by doc.
    */
  def decodeTokenIds(ids: DataFrame, model: BpeModel,
      idCol: String = "id", posCol: String = "pos",
      tokCol: String = "token_id"): DataFrame = {
    require(model.byteLevel,
      "decode requires a byteLevel model (char-level decoding cannot " +
        "reconstruct inter-word whitespace)")
    val vocab = model.vocabTokens.toArray
    ids.select(col(idCol).cast("long").as("id"),
        col(posCol).cast("long").as("_pos"),
        element_at(lit(vocab), col(tokCol).cast("int") + 1).as("_t"))
      .groupBy(col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_t")))),
          s => s.getField("_t")), "").as("_latin1"))
      .select(col("id"),
        graft.functions.TextKernelExprs.latin1ToUtf8(col("_latin1"))
          .as("text_decoded"))
  }

  /** Rehydrate a [[BpeModel]] from a persisted [[mergeTable]] relation
    * (e.g. `spark.read.parquet(...)` of an earlier training run) — the
    * train-once / score-many-jobs artifact cycle, like
    * `Dedup.minhashSignatures`. Rank order is restored from the `rank`
    * column; the collect is ≤ nMerges rows. `coveragePerMille` is not
    * part of the table (it describes the training corpus, not the
    * model) and rehydrates as 1000.
    */
  def fromMergeTable(table: DataFrame,
      byteLevel: Boolean = false): BpeModel = {
    val merges = table.select(col("rank").cast("long"),
        col("pair_left"), col("pair_right"), col("cnt").cast("long"))
      .collect()
      .sortBy(_.getLong(0))
      .map(r => Merge(r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // a byteLevel model's base inventory is the FIXED byte vocabulary,
    // so rehydration recovers the full id numbering (the char-level
    // charset, by contrast, describes the training corpus and is not
    // part of the table)
    BpeModel(merges, 1000L, if (byteLevel) byteVocab else Nil, byteLevel)
  }

  /** Frozen-encoder token counts: `(id, n_words, n_tokens)` — one row
    * per input document; empty/whitespace-only docs carry zeros
    * (handled inline as an empty token array — no join-back, so the
    * whole op is a stateless scan-side projection, ONE codegen'd call
    * per document, and composes into streaming plans unchanged).
    */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String,
      model: BpeModel): DataFrame = {
    val nonEmpty = coalesce(length(trim(col(textCol))), lit(0)) > 0
    val split = if (model.byteLevel) preTokens(col(textCol))
      else TextOps.words(col(textCol))
    val toks = when(nonEmpty, split)
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol).cast("long").as("id"), toks.as("_toks"))
      .select(col("id"), size(col("_toks")).cast("long").as("n_words"),
        graft.functions.TextKernelExprs
          .bpeTokenCount(col("_toks"), model.lefts, model.rights,
            model.byteLevel)
          .as("n_tokens"))
  }
}
