package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-document hashing kernels —
  * same bit-exact algorithms as the [[Hashing]] statics, but without the
  * ScalaUDF wrapper: no catalyst↔scala converters per row, signatures
  * return as `UnsafeArrayData.fromPrimitiveArray` (zero boxing for 64
  * longs/doc), and the call inlines into whole-stage codegen.
  */
object TextKernelExprs {

  /** Bridge targets for generated code (stable JVM entry points). */
  def simhashEval(t: UTF8String): Long = Hashing.simHash(t.toString)

  def minhashEval(t: UTF8String, k: Int, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.minHashSignature(Hashing.shingleHashes(t.toString, k), n))

  def ngramEval(t: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Hashing.wordNgramHashes(t.toString, n))

  def charShinglesEval(t: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.shingleHashes(t.toString, k))

  /** Max exact-duplicate token count in one O(n) hashed pass — the
    * `top_word_count` repetition signal without the O(distinct·n)
    * nested-filter HOF (which evaluates INTERPRETED per element).
    */
  def topTokenCountEval(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n == 0) return 0L
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val c = m.merge(t, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** Count of tokens belonging to a reference set (stopword counting)
    * in one O(n) pass against a memoized hash set.
    */
  def tokenSetCountEval(toks: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Unicode script-class histogram — one O(n) codepoint pass. Slots
    * (alphabetical for the 7 letter scripts, so slot index doubles as
    * the deterministic tie-break rank): 0 arabic [U+0600–U+06FF],
    * 1 cyrillic [U+0400–U+04FF], 2 greek [U+0370–U+03FF], 3 han
    * [U+4E00–U+9FFF], 4 hangul [U+AC00–U+D7A3], 5 kana [U+3040–
    * U+30FF], 6 latin [A-Za-z, U+00C0–U+024F], 7 ascii digits,
    * 8 other (excluding the whitespace set ` \t\n\r`). Block-range
    * heuristic, deliberately regex-replayable (`[\x{0400}-\x{04FF}]`
    * classes) rather than Character.UnicodeScript-complete.
    */
  def scriptCountsEval(t: UTF8String): ArrayData = {
    val s = t.toString
    val c = new Array[Long](9)
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val k =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
            (cp >= 0xC0 && cp <= 0x24F)) 6
        else if (cp >= 0x0600 && cp <= 0x06FF) 0
        else if (cp >= 0x0400 && cp <= 0x04FF) 1
        else if (cp >= 0x0370 && cp <= 0x03FF) 2
        else if (cp >= 0x4E00 && cp <= 0x9FFF) 3
        else if (cp >= 0xAC00 && cp <= 0xD7A3) 4
        else if (cp >= 0x3040 && cp <= 0x30FF) 5
        else if (cp >= '0' && cp <= '9') 7
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') -1
        else 8
      if (k >= 0) c(k) += 1
    }
    UnsafeArrayData.fromPrimitiveArray(c)
  }

  def polyHashEval(t: UTF8String): Long = polyHashOfString(t.toString)

  def bandKeysEval(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val s = sig.toLongArray()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong * 0x9E3779B97F4A7C15L
      var r = 0
      while (r < rows) { h = Hashing.mix64(h ^ s(b * rows + r)); r += 1 }
      // tag with band index so buckets from different bands never join
      out(b) = (b.toLong << 56) ^ (h >>> 8)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def jaccardEval(xa: ArrayData, ya: ArrayData): Double = {
    val x = xa.toLongArray()
    val y = ya.toLongArray()
    if (x.isEmpty && y.isEmpty) 1.0
    else if (x.isEmpty || y.isEmpty) 0.0
    else {
      var i = 0; var j = 0; var inter = 0
      while (i < x.length && j < y.length) {
        val c = java.lang.Long.compare(x(i), y(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      inter.toDouble / (x.length + y.length - inter).toDouble
    }
  }

  def minhashAgreeEval(xa: ArrayData, ya: ArrayData): Double = {
    val x = xa.toLongArray()
    val y = ya.toLongArray()
    if (x.isEmpty || y.isEmpty) 0.0
    else {
      var i = 0; var eq = 0
      while (i < x.length) { if (x(i) == y(i)) eq += 1; i += 1 }
      eq.toDouble / x.length
    }
  }

  def mix64Eval(x: Long): Long = Hashing.mix64(x)

  /** Distinct word-n-gram counts for SEVERAL orders in one pass —
    * tokenizes once where per-order [[ngramEval]] calls would tokenize
    * `ns.length` times. Each count equals `wordNgramHashes(text, n)
    * .length` exactly (same normalize, same `eff = min(n, len)` shrink,
    * same gram hash).
    */
  def ngramDistinctCountsEval(t: UTF8String, ns: Array[Int]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.wordNgramDistinctCounts(t.toString, ns))

  /** Whole-document DSIR score in one pass over the TOKEN array:
    * unigram + adjacent-bigram ("w1 w2") features, bucket =
    * `mix64(polyHash(gram)) >>> 12 mod buckets`, summing the dense
    * banked log-ratio table (index b; unseen buckets hold the model's
    * default). Bit-identical to hashing the exploded feature strings —
    * the bigram string is the same `w1 + " " + w2` concatenation — but
    * runs as ONE codegen'd call per document instead of interpreted
    * HOF lambdas per gram (measured 4× on the frozen scorer).
    */
  def dsirScoreEval(toks: ArrayData, buckets: Int, lr: Array[Long]): Long = {
    val n = toks.numElements()
    var s = 0L
    var prev: String = null
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      s += lr(((Hashing.mix64(polyHashOfString(w)) >>> 12) % buckets).toInt)
      if (prev != null) {
        val bg = prev + " " + w
        s += lr(((Hashing.mix64(polyHashOfString(bg)) >>> 12) % buckets)
          .toInt)
      }
      prev = w
      i += 1
    }
    s
  }

  /** Per-offset word-k-gram fingerprints of a token array — the
    * EVERY-offset relation exact-substring dedup elects over (stride-1,
    * unlike the chunk/window kernels). Each gram hash is the base-31
    * fold of the k word-hashes starting from the polyHash seed:
    * `h = fold(seed, wh(i..i+k-1), (h, c) => 31·h + c)` with 64-bit
    * wrap, where `wh = polyHash(word)`. Computed ROLLING — word hashes
    * once (O(n)), then each next gram in O(1) via
    * `h' = (h − A − wh_i·B)·31 + A + wh_{i+k}` with `A = seed·31^k`,
    * `B = 31^{k-1}` (exact: all ring ops mod 2^64) — so a document
    * costs O(n), not O(n·k). Externally replayable as a per-offset
    * list fold over the word-hash array (the q116 oracle).
    */
  def gramPolyHashesEval(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val m = math.max(0, n - k + 1)
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = polyHashOfString(toks.getUTF8String(i).toString)
      i += 1
    }
    var pow = 1L // 31^(k-1)
    var j = 1
    while (j < k) { pow *= 31L; j += 1 }
    val seedPow = 1125899906842597L * pow * 31L // seed * 31^k
    val out = new Array[Long](m)
    var h = 1125899906842597L
    j = 0
    while (j < k) { h = 31L * h + wh(j); j += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = (h - seedPow - wh(i - 1) * pow) * 31L + seedPow + wh(i + k - 1)
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing selection (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting scheme) over a per-offset gram-hash
    * array: for every full window of `w` consecutive gram hashes,
    * select the minimum hash (UNSIGNED 64-bit order), breaking ties by
    * the RIGHTMOST occurrence; return the distinct selected offsets
    * (1-based, ascending). Guarantees: at least one fingerprint per
    * `w` grams (density `≤ 2/(w+1)` expected), and any shared
    * substring of `w + k − 1` words shares a fingerprint. Documents
    * with fewer than `w` grams have no full window and select nothing.
    *
    * O(n) via a monotonic deque: pop-from-back on `cmpUnsigned ≥ 0`
    * (so an equal hash further right replaces its twin), pop-from-front
    * on window expiry; the front is the window's rightmost minimum.
    * Selection offsets are non-decreasing as the window slides, so
    * distinctness is a last-emitted check, not a sort.
    */
  def winnowOffsetsEval(fps: ArrayData, w: Int): ArrayData = {
    val m = fps.numElements()
    if (m < w) return UnsafeArrayData.fromPrimitiveArray(new Array[Int](0))
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val sel = new Array[Int](m - w + 1)
    var nSel = 0
    var e = 0
    while (e < m) {
      val fe = fps.getLong(e)
      while (tail > head &&
          java.lang.Long.compareUnsigned(fps.getLong(dq(tail - 1)), fe) >= 0)
        tail -= 1
      dq(tail) = e
      tail += 1
      if (dq(head) <= e - w) head += 1
      if (e >= w - 1) {
        val off = dq(head) + 1
        if (nSel == 0 || sel(nSel - 1) != off) { sel(nSel) = off; nSel += 1 }
      }
      e += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sel, nSel))
  }

  /** Whole-document BPE token count under a frozen merge table: each
    * word splits to code points, the N merges apply sequentially in
    * rank order (one left-to-right non-overlapping pass each — the
    * [[graft.operators.Bpe]] spec), and the surviving token counts
    * sum. One codegen'd call per document; a small per-thread
    * memo (the distinct-word working set) makes the per-word cost
    * amortize to a hash lookup on natural-language corpora.
    */
  def bpeTokenCountEval(toks: ArrayData, counter: BpeCounter): Long =
    counter.countDoc(toks)

  /** Byte-embedding inverse ([[Bpe.decodeTokenIds]]): a string whose
    * chars are byte values 0-255 (the latin-1 embedding byte-level BPE
    * tokens use) re-decodes as UTF-8. Chars above 255 would indicate a
    * non-byte-embedded input — they pass through the lossy JVM default
    * replacement, surfacing as a mismatch in the round-trip gate
    * rather than silently succeeding.
    */
  def latin1ToUtf8Eval(s: UTF8String): UTF8String = {
    val t = s.toString
    val bytes = new Array[Byte](t.length)
    var i = 0
    while (i < t.length) { bytes(i) = t.charAt(i).toByte; i += 1 }
    UTF8String.fromString(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Unicode text normalization kernel ([[NormalizeText]]): NFC
    * composition (JDK Normalizer ≡ ICU for the assigned repertoire),
    * then one pass dropping C0 controls (except `\n`/`\t`), DEL, and
    * the zero-width/BOM invisibles U+200B/C/D and U+FEFF, then a
    * space-only trim (the engine-common `trim` semantics).
    */
  def normalizeTextEval(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      val drop = (c < 0x20 && c != '\n' && c != '\t') || c == 0x7f ||
        c == 0x200b || c == 0x200c || c == 0x200d || c == 0xfeff
      if (!drop) sb.append(c)
      i += 1
    }
    var a = 0
    var b = sb.length
    while (a < b && sb.charAt(a) == ' ') a += 1
    while (b > a && sb.charAt(b - 1) == ' ') b -= 1
    UTF8String.fromString(sb.substring(a, b))
  }

  /** One-pass-per-category PII scrub ([[PiiScrubber]]) → the
    * `struct(n_0…n_k-1, redacted)` row [[PiiScrub]] projects.
    */
  def piiScrubEval(text: UTF8String,
      scrubber: PiiScrubber): org.apache.spark.sql.catalyst.InternalRow = {
    val (counts, redacted) = scrubber.scrub(text)
    val out = new Array[Any](counts.length + 1)
    var i = 0
    while (i < counts.length) { out(i) = counts(i); i += 1 }
    out(counts.length) = UTF8String.fromString(redacted)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private def polyHashOfString(s: String): Long = {
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  /** The DSIR feature-bucket multiset of a token array (unigrams then
    * each adjacent bigram) — one codegen'd call replacing the
    * interpreted feature-string construction + per-gram hash lambdas.
    * Bucket math identical to [[dsirScoreEval]].
    */
  def dsirBucketsEval(toks: ArrayData, buckets: Int): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](if (n == 0) 0 else 2 * n - 1)
    var prev: String = null
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      out(i) = (Hashing.mix64(polyHashOfString(w)) >>> 12) % buckets
      if (prev != null)
        out(n + i - 1) =
          (Hashing.mix64(polyHashOfString(prev + " " + w)) >>> 12) % buckets
      prev = w
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** splitmix64 finalizer of a long column — the engine's scalar hash
    * for deterministic sampling/bucketing (JVM long arithmetic wraps,
    * so no ANSI overflow at any input; replicated in external oracles
    * via the HUGEINT mod-2^64 template, SparkEntry.DuckHash.mix).
    */
  def mix64(x: Column): Column =
    GraftSqlBridge.column(Mix64(GraftSqlBridge.expression(x)))

  def simhash(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))

  def minhashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinhashSignature(GraftSqlBridge.expression(text), shingleK, numHashes))

  def ngramHashes(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramHashes(GraftSqlBridge.expression(text), n))

  def charShingleHashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(
      CharShingleHashes(GraftSqlBridge.expression(text), k))

  def scriptCounts(text: Column): Column =
    GraftSqlBridge.column(
      ScriptCounts(GraftSqlBridge.expression(text)))

  def topTokenCount(toks: Column): Column =
    GraftSqlBridge.column(
      TopTokenCount(GraftSqlBridge.expression(toks)))

  def tokenSetCount(toks: Column, set: Seq[String]): Column =
    GraftSqlBridge.column(
      TokenSetCount(GraftSqlBridge.expression(toks), set))

  def polyHash(text: Column): Column =
    GraftSqlBridge.column(PolyHash64(GraftSqlBridge.expression(text)))

  def dsirScore(toks: Column, buckets: Int, lr: Array[Long]): Column =
    GraftSqlBridge.column(
      DsirScore(GraftSqlBridge.expression(toks), buckets, lr))

  def bpeTokenCount(toks: Column, lefts: Seq[String],
      rights: Seq[String], byteLevel: Boolean = false): Column =
    GraftSqlBridge.column(
      BpeTokenCount(GraftSqlBridge.expression(toks), lefts, rights,
        byteLevel))

  def bpeTokenIds(toks: Column, lefts: Seq[String],
      rights: Seq[String], vocab: Seq[String],
      byteLevel: Boolean = false): Column =
    GraftSqlBridge.column(
      BpeTokenIds(GraftSqlBridge.expression(toks), lefts, rights, vocab,
        byteLevel))

  def dsirBuckets(toks: Column, buckets: Int): Column =
    GraftSqlBridge.column(
      DsirBuckets(GraftSqlBridge.expression(toks), buckets))

  def gramPolyHashes(toks: Column, k: Int): Column =
    GraftSqlBridge.column(
      GramPolyHashes(GraftSqlBridge.expression(toks), k))

  def winnowOffsets(fps: Column, w: Int): Column =
    GraftSqlBridge.column(
      WinnowOffsets(GraftSqlBridge.expression(fps), w))

  def normalizeText(text: Column): Column =
    GraftSqlBridge.column(
      NormalizeText(GraftSqlBridge.expression(text)))

  def latin1ToUtf8(text: Column): Column =
    GraftSqlBridge.column(
      Latin1ToUtf8(GraftSqlBridge.expression(text)))

  def ngramDistinctCounts(text: Column, ns: Seq[Int]): Column =
    GraftSqlBridge.column(
      NgramDistinctCounts(GraftSqlBridge.expression(text), ns))

  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    GraftSqlBridge.column(
      BandKeys(GraftSqlBridge.expression(sig), bands, rows))

  def jaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(Jaccard64(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def minhashAgreement(a: Column, b: Column): Column =
    GraftSqlBridge.column(MinhashAgreement(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

private[functions] object KernelTypes {
  val longArray: DataType = ArrayType(LongType)
  def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
}

case class PolyHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.polyHashEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.polyHashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

case class Mix64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected bigint input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.mix64Eval(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.mix64Eval($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** Codegen'd whole-document DSIR scorer over a token array — the dense
  * banked model rides into generated code as a reference object, so the
  * hot loop (hash + array index per gram) never leaves the JVM method.
  */
case class DsirScore(child: Expression, buckets: Int, lr: Array[Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.dsirScoreEval(input.asInstanceOf[ArrayData], buckets, lr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lrRef = ctx.addReferenceObj("dsirLr", lr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.dsirScoreEval($c, $buckets, $lrRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

/** The frozen-BPE word→token-count kernel behind [[BpeTokenCount]].
  * Serializable so it ships inside the expression; the memo is
  * per-thread (tasks share nothing) and capped so an adversarial
  * unbounded vocabulary degrades to cold encoding, never to memory
  * growth.
  */
final class BpeCounter(lefts: Array[String], rights: Array[String],
    byteLevel: Boolean = false) extends Serializable {
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
      override def initialValue() =
        new java.util.HashMap[String, java.lang.Long]()
    }
  private val MaxMemo = 1 << 16

  private def encodeLen(w: String): Long = {
    var toks = if (byteLevel) graft.operators.Bpe.byteTokens(w)
      else graft.operators.Bpe.charTokens(w)
    var k = 0
    while (k < lefts.length) {
      toks = graft.operators.Bpe.applyMerge(toks, lefts(k), rights(k))
      k += 1
    }
    toks.length.toLong
  }

  def countWord(w: String): Long = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) hit.longValue()
    else {
      val n = encodeLen(w)
      if (m.size() >= MaxMemo) m.clear()
      m.put(w, java.lang.Long.valueOf(n))
      n
    }
  }

  def countDoc(toks: ArrayData): Long = {
    val n = toks.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      total += countWord(toks.getUTF8String(i).toString)
      i += 1
    }
    total
  }
}

/** The frozen-BPE word→token-ID kernel behind [[BpeTokenIds]]: encode
  * a word (sequential merge passes), then map each surviving token
  * string to its vocabulary id (first-occurrence/minimum id wins on a
  * duplicate string; unknown tokens map to -1). Same per-thread capped
  * memo discipline as [[BpeCounter]].
  */
final class BpeIdEncoder(lefts: Array[String], rights: Array[String],
    vocab: Array[String], byteLevel: Boolean = false) extends Serializable {
  @transient private lazy val idMap = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < vocab.length) {
      m.putIfAbsent(vocab(i), java.lang.Long.valueOf(i.toLong))
      i += 1
    }
    m
  }
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[Long]]] {
      override def initialValue() =
        new java.util.HashMap[String, Array[Long]]()
    }
  private val MaxMemo = 1 << 16

  private def encodeWord(w: String): Array[Long] = {
    var toks = if (byteLevel) graft.operators.Bpe.byteTokens(w)
      else graft.operators.Bpe.charTokens(w)
    var k = 0
    while (k < lefts.length) {
      toks = graft.operators.Bpe.applyMerge(toks, lefts(k), rights(k))
      k += 1
    }
    toks.map { t =>
      val id = idMap.get(t)
      if (id == null) -1L else id.longValue()
    }
  }

  private def idsOf(w: String): Array[Long] = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) hit
    else {
      val ids = encodeWord(w)
      if (m.size() >= MaxMemo) m.clear()
      m.put(w, ids)
      ids
    }
  }

  def encodeDoc(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val parts = new Array[Array[Long]](n)
    var total = 0
    var i = 0
    while (i < n) {
      parts(i) = idsOf(toks.getUTF8String(i).toString)
      total += parts(i).length
      i += 1
    }
    val out = new Array[Long](total)
    var o = 0
    i = 0
    while (i < n) {
      System.arraycopy(parts(i), 0, out, o, parts(i).length)
      o += parts(i).length
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Codegen'd whole-document frozen-BPE token-ID encoder — the real
  * tokenization artifact (what packing/training consume), flattened in
  * document order.
  */
case class BpeTokenIds(child: Expression, lefts: Seq[String],
    rights: Seq[String], vocab: Seq[String], byteLevel: Boolean = false)
    extends UnaryExpression {
  // Seq (not Array) constructor params: case-class equality on arrays
  // is reference-based, which would defeat canonicalization/CSE for two
  // expressions built from the same model
  require(lefts.length == rights.length,
    s"merge table halves differ: ${lefts.length} vs ${rights.length}")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val encoder = new BpeIdEncoder(lefts.toArray, rights.toArray,
    vocab.toArray, byteLevel)
  override def nullSafeEval(input: Any): Any =
    encoder.encodeDoc(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eRef = ctx.addReferenceObj("bpeIdEncoder", encoder,
      classOf[BpeIdEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$eRef.encodeDoc($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)
}

/** Codegen'd whole-document frozen-BPE token counter — the merge table
  * rides into generated code inside a [[BpeCounter]] reference object
  * (the DsirScore pattern), so the encode loop never leaves the JVM
  * method and the distinct-word memo amortizes repeated words.
  */
case class BpeTokenCount(child: Expression, lefts: Seq[String],
    rights: Seq[String], byteLevel: Boolean = false)
    extends UnaryExpression {
  // Seq (not Array) params — see BpeTokenIds
  require(lefts.length == rights.length,
    s"merge table halves differ: ${lefts.length} vs ${rights.length}")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  private lazy val counter = new BpeCounter(lefts.toArray, rights.toArray,
    byteLevel)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.bpeTokenCountEval(input.asInstanceOf[ArrayData], counter)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("bpeCounter", counter,
      classOf[BpeCounter].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.bpeTokenCountEval($c, $cRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Codegen'd byte-embedding inverse (see
  * [[TextKernelExprs.latin1ToUtf8Eval]]).
  */
case class Latin1ToUtf8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.latin1ToUtf8Eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.latin1ToUtf8Eval($c)")
  override protected def withNewChildInternal(newChild: Expression): Latin1ToUtf8 =
    copy(child = newChild)
}

/** Codegen'd whole-string Unicode normalization (see
  * [[TextKernelExprs.normalizeTextEval]]).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.normalizeTextEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.normalizeTextEval($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Codegen'd multi-order distinct-n-gram counter (see
  * [[TextKernelExprs.ngramDistinctCountsEval]]).
  */
case class NgramDistinctCounts(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val nsArr: Array[Int] = ns.toArray
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.ngramDistinctCountsEval(
      input.asInstanceOf[UTF8String], nsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ngramNs", nsArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.ngramDistinctCountsEval($c, $nsRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): NgramDistinctCounts = copy(child = newChild)
}

/** Codegen'd DSIR feature-bucket array (see
  * [[TextKernelExprs.dsirBucketsEval]]) — feeds the explode in the
  * model-training aggregation paths.
  */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.dsirBucketsEval(input.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.dsirBucketsEval($c, $buckets)")
  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** Codegen'd per-offset word-k-gram fingerprint array (see
  * [[TextKernelExprs.gramPolyHashesEval]]) — feeds the posexplode in
  * the exact-substring dedup election.
  */
case class GramPolyHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.gramPolyHashesEval(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.gramPolyHashesEval($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): GramPolyHashes =
    copy(child = newChild)
}

/** Winnowed fingerprint offsets of a per-offset gram-hash array —
  * [[TextKernelExprs.winnowOffsetsEval]], one codegen'd in-row call per
  * document (no explode/window shuffle for the selection itself).
  */
case class WinnowOffsets(child: Expression, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.winnowOffsetsEval(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.winnowOffsetsEval($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowOffsets =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.simhashEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.simhashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class MinhashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.minhashEval(input.asInstanceOf[UTF8String], shingleK, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.minhashEval($c, $shingleK, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.ngramEval(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.ngramEval($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Max exact-duplicate token count —
  * [[TextKernelExprs.topTokenCountEval]], one hashed pass per row.
  */
case class TopTokenCount(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.topTokenCountEval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.topTokenCountEval($c)")
  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** Count of tokens in a fixed reference set (stopword counter) —
  * [[TextKernelExprs.tokenSetCountEval]]; the set memoizes once per
  * expression instance and rides into codegen as a reference object.
  * Seq (not Array) param for structural equality.
  */
case class TokenSetCount(child: Expression, set: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  private lazy val hashSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.length * 2)
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.tokenSetCountEval(input.asInstanceOf[ArrayData], hashSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("tokenSet", hashSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.tokenSetCountEval($c, $sRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

/** Unicode script-class histogram of a string —
  * [[TextKernelExprs.scriptCountsEval]]: 9 counts in one codepoint pass.
  */
case class ScriptCounts(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.scriptCountsEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.scriptCountsEval($c)")
  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

/** Sorted distinct char-`k`-shingle hash set of the normalized text —
  * the exact universe [[MinhashSignature]] sketches, for ground-truth
  * Jaccard in recall audits ([[Hashing.shingleHashes]]).
  */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.charShinglesEval(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.charShinglesEval($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

case class BandKeys(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (KernelTypes.isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint>, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.bandKeysEval(input.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.bandKeysEval($c, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

abstract class LongArrayBinaryExpr extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (KernelTypes.isLongArray(left.dataType) &&
        KernelTypes.isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> inputs, got ${left.dataType.catalogString} / " +
        right.dataType.catalogString)
  override def dataType: DataType = DoubleType
}

case class Jaccard64(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernelExprs.jaccardEval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernelExprs.jaccardEval($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Jaccard64 =
    copy(left = newLeft, right = newRight)
}

case class MinhashAgreement(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernelExprs.minhashAgreeEval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernelExprs.minhashAgreeEval($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashAgreement =
    copy(left = newLeft, right = newRight)
}
