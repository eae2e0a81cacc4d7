package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BpeTokenIds/Count built from equal models are equal expressions") {
    import graft.functions.{BpeTokenIds, BpeTokenCount}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // Seq (not Array) constructor params: two expressions built from
    // independently-constructed but equal model tables must compare
    // equal, or canonicalization/CSE never dedups the kernel
    val child = BoundReference(0, ArrayType(StringType), nullable = true)
    def lefts = Seq("a", "ab").map(identity)
    def rights = Seq("b", "c").map(identity)
    def vocab = Seq("a", "b", "c", "ab", "abc").map(identity)
    val i1 = BpeTokenIds(child, lefts, rights, vocab)
    val i2 = BpeTokenIds(child, lefts, rights, vocab)
    assert(i1 == i2 && i1.semanticEquals(i2) &&
      i1.canonicalized == i2.canonicalized)
    val c1 = BpeTokenCount(child, lefts, rights)
    val c2 = BpeTokenCount(child, lefts, rights)
    assert(c1 == c2 && c1.semanticEquals(c2))
    assert(i1 != BpeTokenIds(child, lefts, rights, vocab.reverse))
  }

  test("applyMerge is one left-to-right non-overlapping pass") {
    def am(toks: String*)(a: String, b: String): Seq[String] =
      Bpe.applyMerge(toks.toArray, a, b).toSeq
    assert(am("a", "b", "c")("a", "b") == Seq("ab", "c"))
    assert(am("a", "b", "a", "b")("a", "b") == Seq("ab", "ab"))
    // equal-halves runs merge alternating from the left
    assert(am("a", "a", "a")("a", "a") == Seq("aa", "a"))
    assert(am("a", "a", "a", "a")("a", "a") == Seq("aa", "aa"))
    assert(am("x", "a", "a", "a", "y")("a", "a") == Seq("x", "aa", "a", "y"))
    // no occurrence: unchanged
    assert(am("a", "b")("b", "a") == Seq("a", "b"))
  }

  test("trainMerges replays classic BPE on the Sennrich toy corpus") {
    // low/lower/newest/widest with counts 5/2/6/3: the classic worked
    // example (no </w> marker in our spec). Pair counts step 1:
    // es 6+3=9, st 9, lo 7, ow 7, ne 6, ew 6, we 6, wi 3, id 3, de 3,
    // er 2 — tie es/st broken lexicographically: es first.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val m = Bpe.trainMerges(vocab, 4)
    assert(m.map(x => (x.left, x.right, x.cnt)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("trainMerges stops when every word is a single token") {
    val m = Bpe.trainMerges(Seq(("ab", 3L), ("ab", 2L)), 10)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b")))
  }

  test("tokenCounts applies merges in rank order; empty docs carry zeros") {
    val docs = Seq(
      (1L, "low low lower newest"),
      (2L, "widest newest newest"),
      (3L, " "),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val model = Bpe.BpeModel(Seq(
      Bpe.Merge("e", "s", 9L), Bpe.Merge("es", "t", 9L),
      Bpe.Merge("l", "o", 7L), Bpe.Merge("lo", "w", 7L)), 1000L)
    val got = Bpe.tokenCounts(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect().toSet
    // low -> [low]=1; lower -> [low,e,r]=3; newest -> [n,e,w,est]=4;
    // widest -> [w,i,d,est]=4
    assert(got == Set(
      (1L, 4L, 1L + 1L + 3L + 4L),
      (2L, 3L, 4L + 4L + 4L),
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
  }

  test("bpeTrain on the documents table matches a driver-side replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = Bpe.bpeTrain(docs, "text", nMerges = 4, maxVocab = 10000)
    assert(model.coveragePerMille == 1000L)
    // independent replay: collect word counts with plain Spark SQL,
    // run the reference loop
    val wc = docs.filter(coalesce(length(trim(col("text"))), lit(0)) > 0)
      .select(explode(graft.operators.TextOps.words(col("text"))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toSeq
    val ref = Bpe.trainMergesRescan(
      wc.sortBy { case (w, c) => (-c, w) }, 4)
    assert(model.merges == ref)
    // token counts: n_tokens <= chars, >= n_words; deterministic rerun
    val tc = Bpe.tokenCounts(docs, "text", "doc_id", model)
    val bad = tc.join(docs, tc("id") === docs("doc_id"))
      .filter(col("n_tokens") < col("n_words") ||
        col("n_tokens") > length(col("text")))
      .count()
    assert(bad == 0L)
    val again = Bpe.tokenCounts(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == tc.as[(Long, Long, Long)].collect().toSet)
  }

  test("tokenIds numbers chars then merges; unknown chars encode -1") {
    // chars sorted: d=0 e=1 i=2 l=3 n=4 o=5 r=6 s=7 t=8 w=9;
    // merges: es=10 est=11 lo=12 low=13
    val model = Bpe.BpeModel(Seq(
      Bpe.Merge("e", "s", 9L), Bpe.Merge("es", "t", 9L),
      Bpe.Merge("l", "o", 7L), Bpe.Merge("lo", "w", 7L)), 1000L,
      chars = Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    val docs = Seq((1L, "low lower zap"), (2L, " ")).toDF("doc_id", "text")
    val got = Bpe.tokenIds(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect().toSet
    // low -> [low]=13; lower -> [low,e,r]=[13,1,6]; zap -> 3 unknowns
    assert(got == Set(
      (1L, 0L, 13L), (1L, 1L, 13L), (1L, 2L, 1L), (1L, 3L, 6L),
      (1L, 4L, -1L), (1L, 5L, -1L), (1L, 6L, -1L)))
    // a trained model carries the charset and encodes with no unknowns
    val corpus = Seq((1L, "low lower newest widest")).toDF("doc_id", "text")
    val trained = Bpe.bpeTrain(corpus, "text", nMerges = 4)
    assert(trained.chars == Seq("d", "e", "i", "l", "n", "o", "r", "s",
      "t", "w"))
    val ids = Bpe.tokenIds(corpus, "text", "doc_id", trained)
      .as[(Long, Long, Long)].collect()
    assert(ids.forall(_._3 >= 0L))
  }

  test("mergeTable round-trips through parquet into an identical model") {
    val docs = Seq((1L, "low low lower newest widest newest"))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", nMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.mergeTable(spark, model).write.mode("overwrite").parquet(dir)
    val back = Bpe.fromMergeTable(spark.read.parquet(dir))
    assert(back.merges == model.merges)
    // scoring under the rehydrated model is identical
    val a = Bpe.tokenCounts(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect().toSet
    val b = Bpe.tokenCounts(docs, "text", "doc_id", back)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("incremental trainMerges ≡ full-rescan reference, deep merge runs") {
    // the real corpus vocabulary, driven until the pair space is nearly
    // exhausted — every election, delta update and re-appearing pair
    // path gets exercised; both char- and byte-level decompositions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wc = docs.filter(coalesce(length(trim(col("text"))), lit(0)) > 0)
      .select(explode(graft.operators.TextOps.words(col("text"))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toSeq
      .sortBy { case (w, c) => (-c, w) }
    for (n <- Seq(1, 7, 40, 200)) {
      assert(Bpe.trainMerges(wc, n) == Bpe.trainMergesRescan(wc, n),
        s"divergence at nMerges=$n (char-level)")
      assert(Bpe.trainMerges(wc, n, Bpe.byteTokens) ==
        Bpe.trainMergesRescan(wc, n, Bpe.byteTokens),
        s"divergence at nMerges=$n (byte-level)")
    }
    // overlap-heavy degenerate vocab: equal-halves runs and pairs that
    // vanish then re-appear as neighbors fuse
    val runs = Seq(("aaaa", 5L), ("aaab", 4L), ("baaa", 3L), ("abab", 2L),
      ("bbbb", 2L), ("ab", 9L))
    for (n <- 1 to 12)
      assert(Bpe.trainMerges(runs, n) == Bpe.trainMergesRescan(runs, n),
        s"divergence at nMerges=$n (runs)")
  }

  test("byteTokens round-trips UTF-8 bytes; preTokens is GPT-2-class") {
    // ASCII: one byte per char
    assert(Bpe.byteTokens("low").toSeq == Seq("l", "o", "w"))
    assert(Bpe.byteTokens(" a").toSeq == Seq(" ", "a"))
    // non-ASCII decomposes into its UTF-8 bytes, all in [0,255] —
    // re-assembling the byte values reconstructs the original string
    val s = "café 中"
    val toks = Bpe.byteTokens(s)
    assert(toks.forall(t => t.length == 1 && t.charAt(0) < 256))
    val bytes = toks.map(t => t.charAt(0).toByte)
    assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == s)
    // every byte token is in the fixed base vocabulary at its own index
    assert(Bpe.byteVocab.length == 256)
    assert(toks.forall(t => Bpe.byteVocab(t.charAt(0).toInt) == t))
    // pretokens: space attaches to the following word, case preserved
    val pt = Seq(("a", "Key agg  row 12 x!y"))
      .toDF("id", "t")
      .select(Bpe.preTokens(col("t"))).as[Seq[String]].head()
    assert(pt == Seq("Key", " agg", "  ", "row", " 12", " x", "!", "y"))
  }

  test("bpeTrainBytes: byte ids 0..255, merges 256+, no -1 on any input") {
    val docs = Seq((1L, "low low lower newest widest newest"),
      (2L, "café domainée")).toDF("doc_id", "text")
    val model = Bpe.bpeTrainBytes(docs, "text", nMerges = 4)
    assert(model.byteLevel && model.chars == Bpe.byteVocab)
    val ids = Bpe.tokenIds(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect()
    // total encoding: no -1 even for the non-ASCII doc outside the
    // training word mass
    assert(ids.forall(_._3 >= 0L))
    // single-byte tokens carry their byte value as the id: doc 1's
    // first pretoken "low" cannot start with an id >= 256 unless it
    // was merged; all ids < 256 equal a byte of the input
    val maxBase = ids.map(_._3).filter(_ < 256L)
    assert(maxBase.forall(id => id >= 0L && id <= 255L))
    // byte-level token counts: doc 1 pretokenizes to "low" + 5 space-
    // prefixed words; n_tokens >= n_pretokens and <= byte length
    val tc = Bpe.tokenCounts(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect()
    assert(tc.exists(r => r._1 == 1L && r._2 == 6L))
    assert(tc.forall(r => r._3 >= r._2))
  }

  test("bpeTrainBytes merges can cross the space boundary (GPT-2 shape)") {
    // " the" dominates: expect a merge chain that includes the
    // space-prefixed pair (' ', 't') — the signature byte-level merge
    val docs = Seq((1L, "the the the the the the")).toDF("doc_id", "text")
    val model = Bpe.bpeTrainBytes(docs, "text", nMerges = 3)
    // merges: (h,e)=6, (t,he)=6, then the space-crossing (' ', the)=5
    assert(model.merges.map(m => (m.left, m.right, m.cnt)) == Seq(
      ("h", "e", 6L), ("t", "he", 6L), (" ", "the", 5L)))
    // the trained encoder reproduces a driver-side replay
    val ids = Bpe.tokenIds(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(ids.forall(_._3 >= 0L))
  }

  test("decodeTokenIds round-trips text exactly, including non-ASCII") {
    val docs = Seq(
      (1L, "low lower newest widest"),
      (2L, "café déjà vu 中文"), // multi-byte UTF-8
      (3L, "punct! and, (nums) 123 end.")
    ).toDF("doc_id", "text")
    val model = Bpe.bpeTrainBytes(docs, "text", nMerges = 5)
    val ids = Bpe.tokenIds(docs, "text", "doc_id", model)
    val back = Bpe.decodeTokenIds(ids, model)
      .as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    assert(back == orig, s"round-trip diverged: $back")
    // char-level models cannot reconstruct whitespace: loud error
    val charModel = Bpe.bpeTrain(docs, "text", nMerges = 2)
    val e = intercept[IllegalArgumentException] {
      Bpe.decodeTokenIds(ids, charModel)
    }
    assert(e.getMessage.contains("byteLevel"))
  }

  test("byte-level mergeTable round-trip recovers the full id numbering") {
    val docs = Seq((1L, "low low lower newest widest newest"))
      .toDF("doc_id", "text")
    val model = Bpe.bpeTrainBytes(docs, "text", nMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpeb").toString
    Bpe.mergeTable(spark, model).write.mode("overwrite").parquet(dir)
    val back = Bpe.fromMergeTable(spark.read.parquet(dir), byteLevel = true)
    assert(back.byteLevel && back.chars == Bpe.byteVocab)
    val a = Bpe.tokenIds(docs, "text", "doc_id", model)
      .as[(Long, Long, Long)].collect().toSet
    val b = Bpe.tokenIds(docs, "text", "doc_id", back)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.forall(_._3 >= 0L))
  }

  test("bpeTrain top-V election bounds the vocabulary and reports coverage") {
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", nMerges = 1, maxVocab = 2)
    // top-2 vocab = aa(3), bb(2); cc's mass is dropped from training
    assert(model.coveragePerMille == 833L) // 5 of 6 words
    assert(model.merges.map(m => (m.left, m.right, m.cnt)) ==
      Seq(("a", "a", 3L)))
  }
}
