package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

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
    val ref = Bpe.trainMerges(
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

  test("bpeTrain top-V election bounds the vocabulary and reports coverage") {
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val model = Bpe.bpeTrain(docs, "text", nMerges = 1, maxVocab = 2)
    // top-2 vocab = aa(3), bb(2); cc's mass is dropped from training
    assert(model.coveragePerMille == 833L) // 5 of 6 words
    assert(model.merges.map(m => (m.left, m.right, m.cnt)) ==
      Seq(("a", "a", 3L)))
  }
}
