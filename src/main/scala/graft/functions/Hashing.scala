package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing kernels for near-duplicate detection:
  * shingling, MinHash signatures, SimHash, banded LSH keys.
  *
  * The per-document kernels are narrow (no shuffle) and deterministic
  * (fixed seeds), so signatures computed on different executors — or in
  * different rounds — agree bit-for-bit. Only the band/bucket join
  * shuffles, and it shuffles signatures (a few hundred bytes), never the
  * document text.
  */
object Hashing {

  /** 64-bit avalanche (splitmix64 finalizer) — cheap, well-mixed. */
  @inline def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def hashString(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) { h = mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  /** Normalize for shingling: lowercase, collapse whitespace. */
  private def normalize(s: String): String =
    if (s == null) "" else s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Distinct character k-shingle hashes of normalized text. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val n = normalize(text)
    if (n.length < k) {
      if (n.isEmpty) Array.empty[Long] else Array(hashString(n, 0L))
    } else {
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + k <= n.length) {
        set.add(hashString(n.substring(i, i + k), 0L))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator(); var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** Distinct word n-gram hashes (for n-gram Jaccard similarity). */
  def wordNgramHashes(text: String, n: Int): Array[Long] = {
    val words = normalize(text).split(" ").filter(_.nonEmpty)
    if (words.length == 0) Array.empty[Long]
    else {
      val eff = math.min(n, words.length)
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + eff <= words.length) {
        set.add(hashString(words.slice(i, i + eff).mkString(" "), 0L))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator(); var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** Distinct word-n-gram counts for SEVERAL orders in one tokenize
    * pass — each entry equals `wordNgramHashes(text, ns(j)).length`
    * exactly (same normalize, same `eff = min(n, len)` shrink, same
    * gram hash; set SIZE is insensitive to TreeSet-vs-HashSet).
    */
  def wordNgramDistinctCounts(text: String, ns: Array[Int]): Array[Long] = {
    val words = normalize(text).split(" ").filter(_.nonEmpty)
    val out = new Array[Long](ns.length)
    var j = 0
    while (j < ns.length) {
      if (words.length > 0) {
        val eff = math.min(ns(j), words.length)
        val set = new java.util.HashSet[java.lang.Long]()
        var i = 0
        while (i + eff <= words.length) {
          set.add(hashString(words.slice(i, i + eff).mkString(" "), 0L))
          i += 1
        }
        out(j) = set.size.toLong
      }
      j += 1
    }
    out
  }

  /** MinHash signature: for each of `numHashes` seeded permutations,
    * the minimum of mix64(seed ^ shingleHash). Empty text ⇒ Long.MaxValue
    * rows (never collides with real content under banding because band
    * keys still include the band index; exact-empty dedup is handled by
    * the exact path).
    */
  def minHashSignature(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i)
      var p = 0
      while (p < numHashes) {
        val v = mix64(h ^ (p.toLong * 0xC2B2AE3D27D4EB4FL))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over word-unigram hashes. */
  def simHash(text: String): Long = {
    val words = normalize(text).split(" ").filter(_.nonEmpty)
    if (words.isEmpty) 0L
    else {
      val counts = new Array[Int](64)
      var i = 0
      while (i < words.length) {
        val h = hashString(words(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- Column-level API ------------------------------------------------

  def minhashSig(text: Column, shingleK: Int = 5, numHashes: Int = 64): Column =
    TextKernelExprs.minhashSig(text, shingleK, numHashes)

  /** Band keys for LSH: signature split into `bands` bands of
    * numHashes/bands values; each band hashed to one Long, tagged with the
    * band index. Two docs sharing ≥1 band key are candidate duplicates.
    */
  def bandKeys(sig: Column, bands: Int, numHashes: Int): Column =
    TextKernelExprs.bandKeys(sig, bands, numHashes / bands)

  def simhash(text: Column): Column = TextKernelExprs.simhash(text)

  def ngramHashes(text: Column, n: Int = 3): Column =
    TextKernelExprs.ngramHashes(text, n)

  /** Exact Jaccard similarity of two pre-hashed shingle/ngram sets
    * (sorted-array intersection, codegen-friendly sizes).
    */
  def jaccard(a: Column, b: Column): Column = TextKernelExprs.jaccard(a, b)

  /** MinHash-estimated Jaccard: fraction of agreeing signature slots. */
  def minhashSimilarity(a: Column, b: Column): Column =
    TextKernelExprs.minhashAgreement(a, b)
}
