package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Text}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles empty/blank/multi-space text") {
    val df = Seq("", "   ", "one", "a  b\tc", "x y z w").toDF("text")
      .select(Text.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 3, 4))
  }

  // NOTE: the synthetic documents table's `lang` column is a label only —
  // its texts are English-ish word soup for every label, so accuracy is
  // tested on real multilingual samples instead.
  test("langId identifies real multilingual samples") {
    val samples = Seq(
      ("en", "the cat is on the roof and the dog is in the garden with the children"),
      ("de", "der hund ist nicht mit der katze und das kind ist mit dem ball"),
      ("fr", "le chat est dans la maison et les enfants sont dans le jardin que nous aimons"),
      ("es", "el perro es grande y los gatos son pequeños con una casa para los niños"),
      ("it", "il cane non è per il gatto che sono una casa del mare per tutti"),
      ("zh", "今天天气很好我们一起去公园散步然后吃晚饭"),
      ("und", "xxxxx yyyyy zzzzz 12345"))
    val df = samples.toDF("expected", "text")
      .select(col("expected"), Text.langId(col("text")).as("got"))
    val bad = df.filter(col("expected") =!= col("got")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("fingerprint is stable and whitespace/case-insensitive") {
    val df = Seq("Hello  World", "hello world", "other").toDF("text")
      .select(Text.fingerprint(col("text")).as("fp")).as[Long].collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("quality score rewards prose over punctuation soup") {
    val df = Seq(
      "The cat sat on the mat and it was a good day for the cat.",
      "!!! ??? ,,, ;;; ::: !!!").toDF("text")
      .select(Text.qualityScore(col("text")).as("q")).as[Double].collect()
    assert(df(0) > df(1))
  }

  test("simhash of near-identical texts is near in hamming space") {
    val base = "the quick brown fox jumps over the lazy dog " * 10
    val a = Hashing.simHash(base)
    val b = Hashing.simHash(base.replace("lazy", "sleepy"))
    val c = Hashing.simHash("totally different words entirely unrelated " * 10)
    assert(Hashing.hamming64(a, b) < 10)
    assert(Hashing.hamming64(a, c) > 15)
  }

  test("minhash estimate approximates true jaccard") {
    val a = Hashing.shingleHashes("abcdefghijklmnopqrstuvwxyz" * 4, 5)
    val sigA = Hashing.minHashSignature(a, 128)
    val sigA2 = Hashing.minHashSignature(a, 128)
    assert(sigA.toSeq == sigA2.toSeq) // deterministic
    // identical sets → estimate 1.0
    assert(sigA.zip(sigA2).count(p => p._1 == p._2) == 128)
  }
}
