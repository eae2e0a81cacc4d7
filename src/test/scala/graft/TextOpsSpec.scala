package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats counts words, distincts and top word/bigram") {
    val df = Seq(
      (1L, "a b a b a"),           // 5 words, 2 distinct, top a=3, top 'a b'=2
      (2L, "x"),                   // single token: no bigrams
      (3L, "one two three")        // all distinct
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 5L, 2L, 3L, 2L),
      (2L, 1L, 1L, 1L, 0L),
      (3L, 3L, 3L, 1L, 1L)))
  }

  test("lineDedup keeps first occurrence corpus-wide, in order") {
    val boiler = "this website uses cookies everywhere"
    val df = Seq(
      (2L, s"unique line for doc two\n$boiler\nsecond unique two"),
      (1L, s"$boiler\nunique line for doc one"),
      (3L, boiler)
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1 has the smallest (id, pos) for the boilerplate: keeps it
    assert(got(1L) == ((1L, s"$boiler\nunique line for doc one", 2L, 0L)))
    assert(got(2L) ==
      ((2L, "unique line for doc two\nsecond unique two", 3L, 1L)))
    assert(got(3L) == ((3L, "", 1L, 1L)))
  }

  test("lineDedup drops later repeats inside the same doc") {
    val df = Seq((7L, "a repeated content line\nmiddle text line one\n" +
      "a repeated content line")).toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().head
    assert(got == ((7L,
      "a repeated content line\nmiddle text line one", 3L, 1L)))
  }

  test("lineDedup: short lines are structure — duplicated yet kept") {
    val df = Seq(
      (1L, "ok\nfirst body line of text\nok"),
      (2L, "ok\nsecond body line of text")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "text", "doc_id", minChars = 10)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "ok\nfirst body line of text\nok", 3L, 0L)))
    assert(got(2L) == ((2L, "ok\nsecond body line of text", 2L, 0L)))
  }

  test("lineDedup matches on the trimmed line but keeps original text") {
    val df = Seq(
      (1L, "  padded boilerplate line  "),
      (2L, "padded boilerplate line")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "  padded boilerplate line  ", 1L, 0L)))
    assert(got(2L) == ((2L, "", 1L, 1L)))
  }

  test("lineDedup: null text keeps the all-empty row") {
    val df = Seq((1L, Option("a real first line of text")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val got = TextOps.lineDedup(df, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, "", 0L, 0L)))
  }

  test("incrementalLineDedup: history blocks ALL batch occurrences") {
    val boiler = "this website uses cookies everywhere"
    val day1 = Seq((1L, s"$boiler\nday one unique body line"))
      .toDF("doc_id", "text")
    val hist = TextOps.lineFingerprints(day1, "text")
    val day2 = Seq(
      (10L, s"$boiler\nday two first unique body"),
      (11L, s"fresh repeated line for day two\n$boiler"),
      (12L, "fresh repeated line for day two"))
      .toDF("doc_id", "text")
    val got = TextOps.incrementalLineDedup(day2, hist, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // boiler is in history: even the batch's FIRST occurrence drops
    assert(got(10L) == ((10L, "day two first unique body", 2L, 1L)))
    // batch-internal election still applies to fresh lines
    assert(got(11L) ==
      ((11L, "fresh repeated line for day two", 2L, 1L)))
    assert(got(12L) == ((12L, "", 1L, 1L)))
    // append invariant: batch ∅ history == the batch lineDedup
    val empty = hist.filter(col("fp").isNull)
    val inc = TextOps.incrementalLineDedup(day2, empty, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().toSet
    val batchTier = TextOps.lineDedup(day2, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(inc == batchTier)
  }

  test("winnowOffsets matches brute-force rightmost-min on tie-heavy input") {
    import graft.functions.TextKernelExprs
    def brute(fps: Array[Long], w: Int): Seq[Int] = {
      if (fps.length < w) Nil
      else (w to fps.length).map { e =>
        var best = e - w
        var i = e - w + 1
        while (i < e) {
          if (java.lang.Long.compareUnsigned(fps(i), fps(best)) <= 0) best = i
          i += 1
        }
        best + 1
      }.distinct
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 60) {
      val n = rnd.nextInt(30)
      val w = 1 + rnd.nextInt(6)
      // tiny value range forces ties; a few negatives exercise the
      // unsigned order (negative longs are LARGE unsigned)
      val fps = Array.fill(n)(rnd.nextInt(4).toLong - 1L)
      val got = Seq(Tuple1(fps)).toDF("g")
        .select(TextKernelExprs.winnowOffsets(col("g"), w).as("o"))
        .as[Seq[Int]].head()
      assert(got == brute(fps, w), s"trial=$trial n=$n w=$w fps=${fps.toSeq}")
    }
  }

  test("winnowStats: shared 11-word substring guarantees a shared fp") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo" // w + k - 1 = 11 words
    val docs = Seq(
      (1L, s"one unique opening here for doc $shared closing words again ok"),
      (2L, s"$shared totally different tail content that shares nothing else"),
      (3L, "entirely distinct text with twelve words of its very own here"))
      .toDF("doc_id", "text")
    val got = TextOps.winnowStats(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._4 >= 1L, s"doc 1 must share a fingerprint: $got")
    assert(got(2L)._4 >= 1L, s"doc 2 must share a fingerprint: $got")
    assert(got(3L)._4 == 0L, s"doc 3 shares nothing: $got")
    // density guarantee: at least one selection per w grams
    got.values.foreach { case (id, ng, nw, _) =>
      if (ng >= 4) assert(nw >= ng / 4, s"doc $id under-selected: $got")
    }
  }

  test("scriptProfile: counts, dominant election, mixing permille") {
    val df = Seq(
      (1L, "hello world"),                 // pure latin
      (2L, "привет мир"),                  // pure cyrillic
      (3L, "hello мир 42!"),               // latin 5, cyrillic 3, digit 2
      (4L, "12345 !!!"),                   // no letters at all
      (5L, "数据 data"))                    // han 2, latin 4
      .toDF("doc_id", "text")
    val got = TextOps.scriptProfile(df, "text", "doc_id")
      .select(col("id"), col("n_latin"), col("n_cyrillic"), col("n_han"),
        col("n_digit"), col("n_other"), col("main_script"),
        col("mix_permille"))
      .as[(Long, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 10L, 0L, 0L, 0L, 0L, "latin", 0L)))
    assert(got(2L) == ((2L, 0L, 9L, 0L, 0L, 0L, "cyrillic", 0L)))
    // 3 of 8 letters outside latin -> 375 permille
    assert(got(3L) == ((3L, 5L, 3L, 0L, 2L, 1L, "latin", 375L)))
    assert(got(4L) == ((4L, 0L, 0L, 0L, 5L, 3L, "none", 0L)))
    assert(got(5L) == ((5L, 4L, 0L, 2L, 0L, 0L, "latin", 333L)))
    // tie-break: equal counts go to the alphabetically-LAST script
    val tie = Seq((9L, "ab пр")).toDF("doc_id", "text")
    val t = TextOps.scriptProfile(tie, "text", "doc_id")
      .select(col("main_script"), col("mix_permille"))
      .as[(String, Long)].head()
    assert(t == (("latin", 500L)))
  }

  test("packPairs: hand fixture — longest pairs with shortest that fits") {
    def doc(id: Long, len: Int) = (id, Seq.fill(len)("w").mkString(" "))
    val df = Seq(doc(1, 9), doc(2, 7), doc(3, 5), doc(4, 3))
      .toDF("doc_id", "text")
    val got = TextOps.packPairs(df, "text", "doc_id", budget = 10,
        buckets = 1)
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    // 9+3 > 10 -> 9 alone; 7+3 fits -> pair 0; 5 is the middle single
    assert(got(2L) == ((2L, 7L, 0L, 0)))
    assert(got(4L) == ((4L, 3L, 0L, 1)))
    assert(got(1L) == ((1L, 9L, 1L, 0)))
    assert(got(3L) == ((3L, 5L, 2L, 0)))
  }

  test("packPairs matches the per-item two-pointer reference") {
    def refPack(lens: Seq[(Long, Long)], budget: Long)
        : Map[Long, (Long, Long, Int)] = {
      val sorted = lens.sortBy { case (id, l) => (-l, id) }.toArray
      var i = 0; var j = sorted.length - 1
      var pairs = 0L
      val out = scala.collection.mutable.Map[Long, (Long, Long, Int)]()
      val singles = scala.collection.mutable.ArrayBuffer[Int]()
      while (i < j) {
        if (sorted(i)._2 + sorted(j)._2 <= budget) {
          out(sorted(i)._1) = (sorted(i)._2, pairs, 0)
          out(sorted(j)._1) = (sorted(j)._2, pairs, 1)
          pairs += 1; i += 1; j -= 1
        } else { singles += i; i += 1 }
      }
      if (i == j && sorted.nonEmpty) singles += i
      singles.zipWithIndex.foreach { case (p, k) =>
        out(sorted(p)._1) = (sorted(p)._2, pairs + k, 0)
      }
      out.toMap
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 12) {
      val n = 1 + rnd.nextInt(40)
      val budget = 4 + rnd.nextInt(12)
      val lens = (1L to n.toLong).map(id => (id, rnd.nextInt(13).toLong))
      val df = lens.map { case (id, l) =>
        (id, Seq.fill(l.toInt)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val got = TextOps.packPairs(df, "text", "doc_id", budget,
          buckets = 1)
        .as[(Long, Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val exp = refPack(lens, budget)
      assert(got == exp, s"trial=$trial n=$n budget=$budget lens=$lens")
      // invariants: no non-oversize pack exceeds budget; pairs have
      // slots {0,1}; every doc appears exactly once
      val byPack = got.toSeq.groupBy(_._2._2)
      byPack.foreach { case (pk, ms) =>
        assert(ms.size <= 2)
        if (ms.size == 2) {
          assert(ms.map(_._2._3).toSet == Set(0, 1))
          assert(ms.map(_._2._1).sum <= budget, s"pack $pk over budget")
        }
      }
      assert(got.size == n)
    }
  }

  test("winnowOverlapPairs ranks the heaviest verbatim copy first") {
    val shared1 = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa"
    val shared2 = "one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      (1L, s"$shared1 tail a"),
      (2L, s"head b $shared1"),        // big copy with 1
      (3L, s"$shared2 closing c"),
      (4L, s"opening d $shared2"),     // smaller copy with 3
      (5L, "entirely unrelated words that overlap with nothing else"))
      .toDF("doc_id", "text")
    val got = TextOps.winnowOverlapPairs(docs, "text", "doc_id",
        minShared = 1, topK = 10)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.head._1 == 1L && got.head._2 == 2L,
      s"16-word copy must rank first: ${got.toSeq}")
    assert(got.map(p => (p._1, p._2)).contains((3L, 4L)),
      s"11-word copy must appear: ${got.toSeq}")
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
    // ranking is (n_shared desc): head pair shares at least as much
    val byPair = got.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((1L, 2L)) >= byPair((3L, 4L)))
  }

  test("packPairs edges: empty corpus, all-oversize, all-empty docs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.packPairs(empty, "text", "doc_id", 10).count() == 0L)
    // oversize docs can never pair: every one packs alone
    val big = Seq((1L, Seq.fill(20)("w").mkString(" ")),
      (2L, Seq.fill(25)("w").mkString(" "))).toDF("doc_id", "text")
    val g1 = TextOps.packPairs(big, "text", "doc_id", 10, buckets = 1)
      .as[(Long, Long, Long, Int)].collect()
    assert(g1.map(_._3).distinct.length == 2 && g1.forall(_._4 == 0))
    // zero-token docs pair with each other (0 + 0 <= budget)
    val blank = Seq((1L, ""), (2L, "  "), (3L, null: String))
      .toDF("doc_id", "text")
    val g2 = TextOps.packPairs(blank, "text", "doc_id", 10, buckets = 1)
      .as[(Long, Long, Long, Int)].collect()
    assert(g2.forall(_._2 == 0L))
    assert(g2.map(_._3).distinct.length == 2) // one pair + one single
  }

  test("winnowOverlapPairs maxBucket cap drops viral fingerprints") {
    // every doc shares the same 11-word boilerplate: with a cap below
    // the doc count the shared fp's bucket is dropped and NO pairs
    // survive; with a generous cap the pairs appear
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo"
    val docs = (1L to 6L).map(i => (i, s"$boiler unique tail word$i"))
      .toDF("doc_id", "text")
    val capped = TextOps.winnowOverlapPairs(docs, "text", "doc_id",
      minShared = 1, topK = 100, maxBucket = 3)
    assert(capped.count() == 0L, "viral fp must be capped away")
    val open = TextOps.winnowOverlapPairs(docs, "text", "doc_id",
      minShared = 1, topK = 100, maxBucket = 1000)
    assert(open.count() >= 15L, "all 15 pairs share the boilerplate fp")
  }

  test("packPairsBy: per-stratum packing, globally unique pack ids") {
    val rnd = new scala.util.Random(5)
    val docs = (1L to 60L).map { id =>
      (id, if (id % 2 == 0) "en" else "de",
        Seq.fill(1 + rnd.nextInt(9))("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val got = TextOps.packPairsBy(docs, "text", "doc_id", "lang",
        budget = 10, buckets = 1)
      .as[(Long, String, Long, Long, Int)].collect()
    assert(got.length == 60)
    // no pack mixes strata; pack ids are globally unique across strata
    val byPack = got.groupBy(_._4)
    byPack.values.foreach { ms =>
      assert(ms.map(_._2).distinct.size == 1, s"mixed pack: ${ms.toSeq}")
      assert(ms.size <= 2)
      if (ms.size == 2) assert(ms.map(_._3).sum <= 10)
    }
    // each stratum's packing equals a standalone packPairs run on its
    // slice, modulo the stratum pack-id offset
    val offsets = got.groupBy(_._2).view
      .mapValues(_.map(_._4).min).toMap
    Seq("de", "en").foreach { s =>
      val alone = TextOps.packPairs(docs.filter(col("lang") === s),
          "text", "doc_id", budget = 10, buckets = 1)
        .as[(Long, Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val strat = got.filter(_._2 == s)
        .map(r => r._1 -> ((r._3, r._4 - offsets(s), r._5))).toMap
      assert(strat == alone, s"stratum $s diverged")
    }
  }

  test("splitContamination catches a planted train->val 8-gram copy") {
    val splits = Seq(("train", 900), ("val", 50), ("test", 50))
    val ids = (0L until 400L).toDF("doc_id")
    val asg = TextOps.splitAssign(ids, "doc_id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val trainId = asg.collectFirst { case (i, "train") => i }.get
    val valIds = asg.collect { case (i, "val") => i }.toSeq.sorted
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val df = (0L until 400L).map { i =>
      val text =
        if (i == trainId) s"$shared and some train only tail words"
        else if (i == valIds.head) s"prefix words then $shared here"
        else if (i == valIds(1)) "alpha bravo charlie" // <8 words: clean
        else (0 until 8).map(j => s"u${i}w$j").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val got = TextOps.splitContamination(df, "text", "doc_id", splits)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val nVal = asg.values.count(_ == "val").toLong
    val nTest = asg.values.count(_ == "test").toLong
    assert(got("val") ==
      (("val", nVal, 1L, 1000L / nVal)))
    assert(got("test") == (("test", nTest, 0L, 0L)))
  }

  test("vocabGrowth: types count at their first doc's checkpoint") {
    val df = Seq(
      (0L, "alpha beta alpha"),     // bucket 0: 3 tokens, types alpha beta
      (1L, "beta gamma"),           // bucket 0: gamma is new
      (2L, "alpha delta"),          // bucket 1: delta is new
      (3L, Option.empty[String].orNull), // bucket 1: null text, 0 tokens
      (5L, "epsilon")               // bucket 2 (id 4 absent)
    ).toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(df, "text", "doc_id", stepDocs = 2L)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 5L, 3L),   // alpha beta gamma
      (1L, 4L, 7L, 4L),   // + delta; null doc adds 0 tokens
      (2L, 5L, 8L, 5L)))  // + epsilon
  }

  test("trigramLmScore backs off trigram -> bigram -> add-alpha unigram") {
    val df = Seq(
      (1L, "a b c a b c", 1), // the train slice
      (2L, "a b c x", 0),     // seen trigram + full backoff to unigram
      (3L, "c c a", 0),       // unseen trigram, seen (c,a) bigram
      (4L, "x y", 0)          // < 3 tokens: zeros, null h
    ).toDF("doc_id", "text", "t")
    val got = TextOps.trigramLmScore(df, "text", "doc_id",
        isTrain = col("t") === 1)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // train counts: c1 a=2 b=2 c=2 (N=6, V=3); c2 ab=2 bc=2 ca=1;
    // c3 abc=2 bca=1 cab=1
    def bank(s: Double): Long = math.floor(math.log(s) * 1048576.0).toLong
    val lpHalf = bank(1.0 / 2.0)               // bca: c3=1/c2(b,c)=2
    val lpUni = bank(0.4 * 0.4 * ((0.0 + 0.5) / (6.0 + 0.5 * 3.0)))
    val lpBig = bank(0.4 * (1.0 / 2.0))        // cca -> 0.4*c2(c,a)/c1(c)
    // doc1: abc(x2, s=1), bca(s=1/2), cab(c3=1/c2(c,a)=1 -> s=1)
    assert(got(1L)._2 == 4L && got(1L)._3 == lpHalf)
    // doc2: abc (s=1, lp=0), bcx (unseen trigram AND bigram -> unigram
    // with c1(x)=0)
    assert(got(2L)._2 == 2L && got(2L)._3 == lpUni)
    assert(got(2L)._4.get == -lpUni.toDouble / (2.0 * 1048576.0))
    // doc3: cca -> bigram backoff
    assert(got(3L)._2 == 1L && got(3L)._3 == lpBig)
    // doc4: too short
    assert(got(4L) == (4L, 0L, 0L, None))
  }

  test("trigramLmScore with a reliable checkpoint dir: same scores") {
    // the connectedComponents checkpoint-parity pattern: identical
    // output under reliable checkpointing, and the checkpoint data
    // actually lands in the given directory (a cluster run survives
    // executor loss — localCheckpoint blocks would die with it)
    val df = Seq(
      (1L, "a b c a b c", 1), (2L, "a b c x", 0), (3L, "c c a", 0),
      (4L, "x y", 0)).toDF("doc_id", "text", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    val base = TextOps.trigramLmScore(df, "text", "doc_id",
        isTrain = col("t") === 1)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    val ckpt = TextOps.trigramLmScore(df, "text", "doc_id",
        isTrain = col("t") === 1, checkpointDir = Some(dir))
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    assert(ckpt == base)
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, s"no checkpoint data in $dir")
  }

  test("bigramLmScore matches a hand model; short docs carry null h") {
    val df = Seq(
      (1L, "a b a b"),     // bigrams: ab, ba, ab
      (2L, "a b c"),       // ab, bc
      (3L, "x"),           // 1 token: no bigrams
      (4L, "")             // empty: no bigrams
    ).toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(df, "text", "doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // corpus model: cb(a,b)=3 cb(b,a)=1 cb(b,c)=1; cp(a)=3 cp(b)=2;
    // V = |{b, a, c}| = 3; alpha = 0.5
    def lp(cb: Long, cp: Long): Long =
      math.floor(math.log((cb + 0.5) / (cp + 0.5 * 3)) * 1048576.0).toLong
    val (ab, ba, bc) = (lp(3, 3), lp(1, 2), lp(1, 2))
    val d1 = 2 * ab + ba
    val d2 = ab + bc
    assert(got(1L) == ((3L, d1, Some(-d1.toDouble / (3 * 1048576.0)))))
    assert(got(2L) == ((2L, d2, Some(-d2.toDouble / (2 * 1048576.0)))))
    assert(got(3L) == ((0L, 0L, None)))
    assert(got(4L) == ((0L, 0L, None)))
    // partitioning-independent (the sum is integer-exact)
    val re = TextOps.bigramLmScore(df.repartition(7), "text", "doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(re == got)
  }

  test("vocabProfile: tokens, vocab, hapax and head coverage per group") {
    val df = Seq(
      (1L, "a a a b", "en"),   // en: tokens a×3 b×1
      (2L, "a c", "en"),       // en totals: 6 tokens, vocab {a,b,c}
      (3L, "x y", "de")        // de: 2 tokens, both hapax
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.vocabProfile(df, "text", "doc_id", "lang", topK = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // en: 2 docs, 6 tokens, vocab 3, hapax {b,c}=2, top-1 a=4 -> 666‰
    assert(got("en") == ((2L, 6L, 3L, 2L, 666L)))
    // de: top-1 is "x" (tie broken by token asc) = 1 of 2 -> 500‰
    assert(got("de") == ((1L, 2L, 2L, 2L, 500L)))
    // partitioning independence
    val re = TextOps.vocabProfile(df.repartition(5), "text", "doc_id",
        "lang", topK = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(re == got)
  }

  test("epochUpsample: floor copies + deterministic fraction, zero-shuffle") {
    val df = (0L until 1000L).toDF("doc_id")
    val got = TextOps.epochUpsample(df, "doc_id", epochsPerMille = 2300)
      .as[(Long, Int, Int)].collect()
    val byId = got.groupBy(_._1)
    assert(byId.size == 1000)
    byId.foreach { case (id, rows) =>
      val n = rows.head._3
      assert(n == 2 || n == 3)
      assert(rows.map(_._2).sorted.toSeq == (0 until n))
    }
    // fraction lands near 30% (mix64 is uniform; 1000 ids)
    val extra = byId.values.count(_.head._3 == 3)
    assert(extra > 240 && extra < 360, s"extra-copy count $extra")
    // deterministic + partitioning-independent
    val re = TextOps.epochUpsample(df.repartition(7), "doc_id", 2300)
      .as[(Long, Int, Int)].collect()
    assert(re.sortBy(r => (r._1, r._2)).toSeq ==
      got.sortBy(r => (r._1, r._2)).toSeq)
    // sub-epoch rates (0.4 epochs) keep only the hash fraction
    val sub = TextOps.epochUpsample(df, "doc_id", 400)
      .as[(Long, Int, Int)].collect()
    assert(sub.forall(r => r._2 == 0 && r._3 == 1))
    assert(sub.length > 330 && sub.length < 470, s"sub count ${sub.length}")
    // the plan is a pure map-side projection: no exchange anywhere
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.epochUpsample(df, "doc_id", 2300)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("piiRedact replaces every email and phone occurrence") {
    val df = Seq(
      ("mail a@b.com and c.d+x@e-f.org now", 2L, 0L),
      ("call +1-555-0100 or +44-555-0199", 0L, 2L),
      ("clean text", 0L, 0L)).toDF("t", "ne", "np")
    val (nE, nP) = TextOps.piiCounts(col("t"))
    val got = df.select(col("ne"), col("np"), nE.as("ge"), nP.as("gp"),
      TextOps.piiRedact(col("t")).as("r")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3))
      assert(!r.getString(4).contains("@") ||
        r.getString(4).contains("<EMAIL>") == (r.getLong(0) > 0))
    }
    val red = df.filter(col("ne") === 2)
      .select(TextOps.piiRedact(col("t"))).as[String].head()
    assert(red == "mail <EMAIL> and <EMAIL> now")
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val a = TextOps.stratifiedSample(df, "id", "lang",
      Map("en" -> 100), 500).as[(Long, String)].collect().toSet
    val b = TextOps.stratifiedSample(df.repartition(7), "id", "lang",
      Map("en" -> 100), 500).as[(Long, String)].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    val en = a.count(_._2 == "en").toDouble / 2000
    val de = a.count(_._2 == "de").toDouble / 2000
    assert(math.abs(en - 0.10) < 0.03, s"en rate $en")
    assert(math.abs(de - 0.50) < 0.05, s"de rate $de")
  }

  test("decontaminate flags n-gram overlap and broadcasts the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // shares the bench 4-gram
      (2L, "zeta eta theta iota kappa"),       // disjoint
      (3L, "tiny doc")                         // shorter than n
    ).toDF("doc_id", "text")
    val bench = Seq((9L, "alpha beta gamma delta zzz")).toDF("doc_id", "text")
    val out = TextOps.decontaminate(docs, bench, "text", "doc_id", n = 4)
    val got = out.as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 1), (2L, 0L, 0), (3L, 0L, 0)))
    // the benchmark side must come in as a broadcast, not a shuffle —
    // AQE hides exchange nodes from executedPlan, so assert on the
    // statically-planned query
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val static = TextOps.decontaminate(docs, bench, "text", "doc_id", 4)
      val hasBroadcast = static.queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b
      }.nonEmpty
      assert(hasBroadcast, "benchmark gram join should be broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("topKSample: deterministic, k per stratum, WindowGroupLimit plan") {
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val a = TextOps.topKSample(df, "id", "lang", k = 4)
      .select("id", "lang", "sample_rank")
      .as[(Long, String, Long)].collect().toSet
    val b = TextOps.topKSample(df.repartition(13), "id", "lang", k = 4)
      .select("id", "lang", "sample_rank")
      .as[(Long, String, Long)].collect().toSet
    assert(a == b, "sample must be partitioning-independent")
    assert(a.count(_._2 == "en") == 4 && a.count(_._2 == "de") == 4)
    assert(a.filter(_._2 == "en").map(_._3) == Set(1L, 2L, 3L, 4L))
    // the rank-limit must push a partial top-k below the shuffle
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.topKSample(df, "id", "lang", 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"expected WindowGroupLimit pushdown in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("new samplers/dedup tolerate null and empty inputs") {
    // chunkDedupStats: null/empty text must yield (0, 0), not explode
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "real content here")).toDF("doc_id", "text")
    val stats = TextOps.chunkDedupStats(weird, "text", "doc_id")
      .select("id", "n_chunks", "n_kept")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(stats(1L) == ((0L, 0L)))
    assert(stats(4L) == ((1L, 1L)))
    // empty string normalizes to "" → one empty token → one chunk; the
    // two whitespace variants share that chunk's fingerprint
    assert(stats(2L)._1 == 1L && stats(3L)._1 == 1L)
    assert(stats(2L)._2 + stats(3L)._2 == 1L, "one winner between 2 and 3")

    // topKSample: a null stratum is its own group
    val strat = Seq((1L, "en"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("id", "lang")
    val topped = TextOps.topKSample(strat, "id", "lang", k = 1)
    assert(topped.count() == 2L, "one winner per stratum incl. null")

    // weightedSample: null weight never survives (null predicate)
    val wdf = Seq((1L, Some(1000000L)), (2L, None: Option[Long]))
      .toDF("id", "w")
    val kept = TextOps.weightedSample(wdf, "id", "w", 1000L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("round-7 ops tolerate null and empty text") {
    val weird = Seq((1L, null.asInstanceOf[String], "en"), (2L, "", "en"),
      (3L, "   ", "en"), (4L, "real content here", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    // packSequences: null text consumes no budget but keeps its row;
    // null stratum is its own group
    val packed = TextOps.packSequences(weird, "text", "doc_id", "lang",
      budget = 100, shards = 2).as[(Long, String, Long, Long, Long)].collect()
    assert(packed.length == 4)
    assert(packed.find(_._1 == 1L).get._3 == 0L, "null text = 0 tokens")
    assert(packed.forall(_._5 >= 0), "starts stay defined after a null")
    // salientTerms: null-text docs simply produce no terms
    val terms = TextOps.salientTerms(weird, "text", "doc_id", topK = 3)
      .as[(Long, String, Long, Long, Double, Int)].collect()
    assert(!terms.exists(_._1 == 1L) && terms.exists(_._1 == 4L))
    // splitAssign is a pure id projection: nulls elsewhere are irrelevant
    assert(TextOps.splitAssign(weird, "doc_id",
      Seq(("train", 990), ("heldout", 10))).count() == 4)
  }

  test("packSequences: empty/whitespace text counts 0 tokens like null") {
    val docs = Seq((1L, "two words", "en"), (2L, "", "en"),
      (3L, "   ", "en"), (4L, null.asInstanceOf[String], "en"),
      (5L, "one", "en")).toDF("doc_id", "text", "lang")
    val toks = TextOps.packSequences(docs, "text", "doc_id", "lang",
        budget = 100).as[(Long, String, Long, Long, Long)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(toks == Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 1L),
      s"got $toks")
  }

  test("deterministic-sampling ops accept int-typed id columns") {
    // mix64's type check requires BIGINT — every op must cast, and the
    // survivor/assignment sets must match the long-typed runs exactly
    val ints = (1 to 500).map(i => (i, i.toLong % 7, "en", s"doc $i"))
      .toDF("id", "w", "lang", "text")
    val longs = ints.withColumn("id", col("id").cast("long"))
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id").cast("long")).as[Long].collect().toSet
    assert(ids(TextOps.stratifiedSample(ints, "id", "lang", Map("en" -> 300), 0))
      == ids(TextOps.stratifiedSample(longs, "id", "lang", Map("en" -> 300), 0)))
    assert(ids(TextOps.weightedSample(ints, "id", "w", 200000L))
      == ids(TextOps.weightedSample(longs, "id", "w", 200000L)))
    assert(ids(TextOps.topKSample(ints, "id", "lang", 25))
      == ids(TextOps.topKSample(longs, "id", "lang", 25)))
    assert(TextOps.splitAssign(ints, "id", Seq(("a", 500), ("b", 500)))
        .as[(Long, String, Long, Long)].collect().toSet
      == TextOps.splitAssign(longs, "id", Seq(("a", 500), ("b", 500)))
        .as[(Long, String, Long, Long)].collect().toSet)
    assert(TextOps.packSequences(ints, "text", "id", "lang", budget = 64)
        .as[(Long, String, Long, Long, Long)].collect().toSet
      == TextOps.packSequences(longs, "text", "id", "lang", budget = 64)
        .as[(Long, String, Long, Long, Long)].collect().toSet)
  }

  test("salientTerms reuses the tf exchange (tokenize+count runs once)") {
    val docs = (1L to 50L).map(i => (i, s"alpha beta w$i gamma"))
      .toDF("doc_id", "text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.salientTerms(docs, "text", "doc_id", 3)
        .queryExecution.executedPlan.toString
      // tf is consumed twice (df derivation + the score join); the tf
      // aggregation's exchange must be shared, not recomputed
      assert(plan.contains("ReusedExchange"),
        s"expected ReusedExchange in:\n${plan.take(4000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("invertedIndex: doc-level df, capped sorted postings") {
    val docs = Seq(
      (3L, "alpha beta alpha"), // alpha appears twice but posts once
      (1L, "alpha gamma"),
      (2L, "alpha beta")).toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, "text", "doc_id",
        maxPostings = 2)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // df counts ALL postings; the string carries only the capped ids
    assert(out("alpha") == ((3L, "1,2")))
    assert(out("beta") == ((2L, "2,3")))
    assert(out("gamma") == ((1L, "1")))
    // partitioning-independent
    val re = TextOps.invertedIndex(docs.repartition(7), "text", "doc_id",
        maxPostings = 2)
      .as[(String, Long, String)].collect().toSet
    assert(re == out.map { case (t, (d, p)) => (t, d, p) }.toSet)
    // skew guard: the cap must push down (stopword partitions are
    // corpus-sized), and the distinct-pairs exchange must be shared
    // between the df branch and the postings branch
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.invertedIndex(docs, "text", "doc_id", 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), plan.take(3000))
      assert(plan.contains("ReusedExchange"), plan.take(3000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("containmentDecontaminate scores per-item gram coverage") {
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // item has 2 distinct 4-grams: "a b c d", "b c d e"
    val docs = Seq(
      (1L, "x a b c d e y"),   // both grams → 2/2, flagged at 800‰
      (2L, "z a b c d w"),     // one gram → 1/2 = 500‰, not flagged
      (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = TextOps.containmentDecontaminate(docs, bench, "text",
        "doc_id", n = 4, tauPerMille = 800)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(out(1L) == ((2L, 2L, 1)))
    assert(out(2L) == ((1L, 2L, 0)))
    assert(!out.contains(3L), "zero-overlap docs emit no row")
  }

  test("weightedSample: deterministic, weight-proportional, capped") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) 100L else 900L))
      .toDF("id", "w")
    // rate = w * 1000 / 1e6: w=100 → 10%, w=900 → 90%
    val a = TextOps.weightedSample(df, "id", "w", 1000L)
      .select("id").as[Long].collect().toSet
    val b = TextOps.weightedSample(df.repartition(11), "id", "w", 1000L)
      .select("id").as[Long].collect().toSet
    assert(a == b, "survivor set must be partitioning-independent")
    val light = a.count(_ % 2 == 0) / 2000.0
    val heavy = a.count(_ % 2 == 1) / 2000.0
    assert(math.abs(light - 0.1) < 0.03, s"light keep rate $light")
    assert(math.abs(heavy - 0.9) < 0.03, s"heavy keep rate $heavy")
    // weight at/above the cap keeps everything
    val all = TextOps.weightedSample(df, "id", "w", 100000L)
    assert(all.count() == 4000L)
  }

  test("salientTerms: rare terms outrank stopwords, top-k plan pushes down") {
    // 'the' appears in every doc (df=N → odds idf ≈ 0.1); each doc has
    // one private term (df=1 → high idf)
    val docs = (1L to 10L).map(i => (i, s"the the the term$i common"))
      .toDF("doc_id", "text")
    val out = TextOps.salientTerms(docs, "text", "doc_id", topK = 2)
      .as[(Long, String, Long, Long, Double, Int)].collect()
    assert(out.length == 20)
    out.groupBy(_._1).foreach { case (id, rows) =>
      val byRank = rows.sortBy(_._6).map(_._2)
      // private term first despite tf=1 vs tf=3 for 'the'
      assert(byRank.head == s"term$id", s"doc $id got ${byRank.toSeq}")
    }
    // 'common' (df=10, tf=1) scores below 'the' (df=10, tf=3): tf matters
    // within equal df — check ordering is (score, term), deterministic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.salientTerms(docs, "text", "doc_id", 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"expected WindowGroupLimit pushdown in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("splitAssign: complete, disjoint, proportional, shuffle-decorrelated") {
    val docs = (1L to 5000L).toDF("doc_id")
    val out = TextOps.splitAssign(docs, "doc_id",
        Seq(("train", 800), ("val", 100), ("test", 100)), nFiles = 8)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 5000)                       // complete: one row each
    val byS = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byS("train") - 4000) < 200, s"train ${byS("train")}")
    assert(math.abs(byS("val") - 500) < 120 && math.abs(byS("test") - 500) < 120)
    assert(out.forall(r => r._3 >= 0 && r._3 < 8))   // file_idx in range
    assert(out.forall(r => r._3 == r._4 % 8))        // file derives from key
    // shuffle key decorrelated from split: each split spans all files
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSet.size == 8)
    }
    // stable under corpus growth: same assignment for the common prefix
    val sub = TextOps.splitAssign((1L to 100L).toDF("doc_id"), "doc_id",
        Seq(("train", 800), ("val", 100), ("test", 100)), nFiles = 8)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(sub.subsetOf(out.toSet))
  }

  test("packSequences: budget-respecting starts, shard-namespaced packs") {
    val docs = (1L to 60L).map(i => (i, ("w " * (i % 9 + 1).toInt).trim, "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.packSequences(docs, "text", "doc_id", "lang",
        budget = 10, shards = 2)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.length == 60)
    // every doc STARTS inside its pack: offset in [0, budget)
    assert(out.forall(r => r._5 >= 0 && r._5 < 10))
    // pack ids are shard-namespaced: shard = pack_id >> 40
    val shards = out.map(_._4 >> 40).toSet
    assert(shards.subsetOf(Set(0L, 1L)) && shards.size == 2)
    // within a shard, cumulative layout: sum of tokens before each pack
    // boundary is monotone — replay sequentially per shard
    out.groupBy(_._4 >> 40).foreach { case (_, rows) =>
      val byStart = rows.sortBy(r => (r._4 & ((1L << 40) - 1), r._5))
      val starts = byStart.map(r => (r._4 & ((1L << 40) - 1)) * 10 + r._5)
      assert(starts.sameElements(starts.sorted))
      // starts are exactly the running token total
      starts.zip(byStart.map(_._3).scanLeft(0L)(_ + _)).foreach {
        case (s, cum) => assert(s == cum)
      }
    }
  }

  test("packSequences matches a sequential reference model (seeded random)") {
    val rnd = new scala.util.Random(20260812L)
    val docs = (1L to 300L).map { i =>
      (i, ("t " * (rnd.nextInt(40) + 1)).trim,
        Seq("en", "de", "zh")(rnd.nextInt(3)))
    }
    val got = TextOps.packSequences(docs.toDF("doc_id", "text", "lang"),
        "text", "doc_id", "lang", budget = 50, shards = 3)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    // reference: group by (lang, mix64-shard), walk in (key, id) order,
    // accumulate token counts sequentially
    val expected = docs.groupBy { case (id, _, lang) =>
      (lang, (graft.functions.Hashing.mix64(id) >>> 12) % 3)
    }.flatMap { case ((_, shard), members) =>
      var cum = 0L
      members.sortBy { case (id, _, _) =>
        (graft.functions.Hashing.mix64(id) >>> 12, id)
      }.map { case (id, text, _) =>
        val n = text.split("\\s+").length.toLong
        val start = cum
        cum += n
        id -> ((shard * (1L << 40) + start / 50, start % 50))
      }
    }
    assert(got == expected)
  }

  test("packSequences is partitioning-independent") {
    val docs = (1L to 200L).map(i =>
      (i, ("tok " * (i % 17 + 1).toInt).trim, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "text", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.packSequences(d, "text", "doc_id", "lang", budget = 64,
        shards = 4).as[(Long, String, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val base = run(docs)
    assert(run(docs.repartition(13)) == base)
    assert(run(docs.repartition(1)) == base)
  }

  test("rebalanceMixture hits target proportions; binding stratum keeps all") {
    // 8000 a's vs 2000 b's, target 50/50 → b binds: all b kept,
    // a downsampled to ~2000
    val rows = ((1L to 8000L).map((_, "a")) ++ (8001L to 10000L).map((_, "b")))
      .toDF("id", "src")
    val out = TextOps.rebalanceMixture(rows, "id", "src",
        Map("a" -> 500, "b" -> 500))
      .select(col("id"), col("src"), col("kept"))
      .as[(Long, String, Int)].collect()
    assert(out.length == 10000, "audit output keeps every input row")
    val kept = out.filter(_._3 == 1)
    assert(kept.count(_._2 == "b") == 2000, "binding stratum keeps all")
    val aKept = kept.count(_._2 == "a")
    assert(math.abs(aKept - 2000) < 150, s"a kept $aKept, want ~2000")
    // strata outside the share map are dropped
    val extra = TextOps.rebalanceMixture(
      rows.withColumn("src", when(col("id") % 2 === 0, "c")
        .otherwise(col("src"))), "id", "src",
      Map("a" -> 500, "b" -> 500))
    assert(extra.filter(col("src") === "c" && col("kept") === 1).count() == 0)
    // deterministic: same keep-set under any partitioning
    val again = TextOps.rebalanceMixture(rows.repartition(17), "id", "src",
        Map("a" -> 500, "b" -> 500))
      .select(col("id"), col("src"), col("kept"))
      .as[(Long, String, Int)].collect()
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
    // a target stratum with ZERO observed rows makes the mixture
    // unsatisfiable: T = 0, nothing kept (loud, never silently skewed)
    val unsat = TextOps.rebalanceMixture(rows, "id", "src",
      Map("a" -> 400, "b" -> 400, "missing" -> 200))
    assert(unsat.filter(col("kept") === 1).count() == 0)
  }

  test("chunkDedupRebuild reassembles first-occurrence chunks in order") {
    // doc 1 owns both chunks; doc 2 repeats doc 1's first chunk then
    // adds a novel one; doc 3 is a full copy of doc 1
    val docs = Seq(
      (1L, "a b c d e f"),       // chunks (3 words): "a b c", "d e f"
      (2L, "a b c x y z"),
      (3L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDedupRebuild(docs, "text", "doc_id",
        chunkWords = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (("a b c d e f", 2L)))
    assert(out(2L) == (("x y z", 1L)))
    assert(out(3L) == (("", 0L)), "full duplicate rebuilds to empty")
    // agreement with chunkDedupStats on the kept counts
    val stats = TextOps.chunkDedupStats(docs, "text", "doc_id", 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(stats == out.view.mapValues(_._2).toMap)
  }

  test("slidingChunks covers every token with the declared overlap") {
    val docs = Seq((1L, (1 to 10).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.slidingChunks(docs, "text", "doc_id",
        chunkWords = 4, strideWords = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    // starts at words 1,3,5,7,9 → 5 chunks; last is the 2-word tail
    assert(out.length == 5)
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.head._4 == "w1 w2 w3 w4")
    assert(out(1)._4 == "w3 w4 w5 w6", "stride-2 overlap")
    assert(out.last._4 == "w9 w10" && out.last._3 == 2L)
    // every token appears in at least one chunk
    val covered = out.flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map("w" + _).toSet)
  }

  test("windowDupStats catches shifted copies that disjoint chunks miss") {
    val original = (1 to 60).map("w" + _).mkString(" ")
    val shifted = ((1 to 10).map("junk" + _) ++ (1 to 60).map("w" + _))
      .mkString(" ")
    val docs = Seq((1L, original), (2L, shifted)).toDF("doc_id", "text")
    // disjoint 30-word chunks: the 10-word prefix desynchronizes every
    // chunk — doc 2 looks fully novel
    val chunked = TextOps.chunkDedupStats(docs, "text", "doc_id", 30)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(chunked(2L)._3 == chunked(2L)._2, "disjoint chunks all 'novel'")
    // sliding 30-word windows every 10: the copy re-synchronizes
    val windowed = TextOps.windowDupStats(docs, "text", "doc_id",
        windowWords = 30, strideWords = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(windowed(1L) == ((1L, 4L, 4L)))  // owns all 4 of its windows
    // doc 2: 5 full windows, only the junk-prefixed first is novel
    assert(windowed(2L) == ((2L, 5L, 1L)),
      s"got ${windowed(2L)}: shifted spans must be caught")
  }

  test("substringDupStats catches copies windowDupStats cannot re-sync") {
    // a 35-word verbatim copy at offset 7 (NOT a multiple of the window
    // stride 10): doc 2's windows never line up with doc 1's, so the
    // window tier sees zero duplication — the exact-substring tier must
    // recover the whole copied span
    val original = (1 to 60).map("w" + _).mkString(" ")
    val copied = ((1 to 7).map("junkA" + _) ++ (10 to 44).map("w" + _) ++
      (1 to 8).map("junkB" + _)).mkString(" ")
    val docs = Seq((1L, original), (2L, copied)).toDF("doc_id", "text")
    val windowed = TextOps.windowDupStats(docs, "text", "doc_id",
        windowWords = 30, strideWords = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(windowed(2L)._3 == windowed(2L)._2,
      s"precondition: window tier must MISS the off-stride copy, " +
        s"got ${windowed(2L)}")
    val sub = TextOps.substringDupStats(docs, "text", "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is first occurrence everywhere: nothing duplicated
    assert(sub(1L) == ((1L, 53L, 0L, 0L, 0L)))
    // doc 2: 50 words -> 43 grams; the copy spans words 8..42 (35
    // words) -> 28 duplicated grams merged into ONE maximal span
    // covering exactly the 35 copied words
    assert(sub(2L) == ((2L, 43L, 28L, 1L, 35L)),
      s"got ${sub(2L)}: expected one 35-word maximal span")
  }

  test("normalizeText: NFC composes, invisibles drop, newlines survive") {
    val rows = Seq(
      (1L, "e\u0301clair"),                  // decomposed -> composed
      (2L, "\ufeffbom zero\u200bwidth\u0001"), // BOM + ZWSP + C0 control
      (3L, "  keep\nlines\tand tabs  "),      // trim spaces only
      (4L, "A\u030arhus"),                    // combining ring -> composed
      (5L, null.asInstanceOf[String]),
      (6L, "already clean"))
    val got = TextOps.normalizeText(rows.toDF("doc_id", "text"),
        "text", "doc_id")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "\u00e9clair", 1)))
    assert(got(2L) == ((2L, "bom zerowidth", 1)))
    assert(got(3L) == ((3L, "keep\nlines\tand tabs", 1)))
    assert(got(4L) == ((4L, "\u00c5rhus", 1)))
    assert(got(5L) == ((5L, "", 0)))
    assert(got(6L) == ((6L, "already clean", 0)))
    // the cleanup makes byte-different spellings fingerprint-equal:
    // 7 code units in, 6 out
    assert(got(1L)._2.length == 6)
  }

  test("qualityGate: first-failing reason codes, integer gates") {
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "it runs off to the forest with its friends for a while longer " +
      "because the day is warm and the path is clear").trim
    val docs = Seq(
      (1L, good),                                   // ok
      (2L, "way too short"),                        // too_short
      (3L, (1 to 40).map(i => s"w$i").mkString(" ")), // no stopwords
      (4L, ("spam " * 35).trim + " the of and to in a is that"), // repetitive
      (5L, ""), (6L, null.asInstanceOf[String])     // empty/null
    ).toDF("doc_id", "text")
    val got = TextOps.qualityGate(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, String, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._5 == "ok" && got(1L)._6 == 1)
    assert(got(2L)._5 == "too_short" && got(2L)._6 == 0)
    assert(got(3L)._5 == "low_stopword")
    // doc 4: 43 tokens, 8 stopwords (186 permille >= 20), top word
    // "spam" ×35 = 813 permille > 150 -> repetitive
    assert(got(4L) == ((4L, 43L, 8L, 35L, "repetitive", 0)))
    assert(got(5L) == ((5L, 0L, 0L, 0L, "too_short", 0)))
    assert(got(6L) == ((6L, 0L, 0L, 0L, "too_short", 0)))
    // ordering: a doc failing BOTH length and stopword gates reports
    // the FIRST (too_short)
    val both = Seq((9L, "x1 x2 x3")).toDF("doc_id", "text")
    assert(TextOps.qualityGate(both, "text", "doc_id")
      .select("reason").as[String].head() == "too_short")
  }

  test("substringDecontaminate excises the bench span, keeps the prose") {
    // a 12-word bench item embedded mid-document: the whole embedded
    // block drops as one span; the doc's own prose survives; a clean
    // doc passes untouched; the bench doc itself wipes completely
    val item = (1 to 12).map("b" + _).mkString(" ")
    val pre = (1 to 9).map("p" + _).mkString(" ")
    val post = (1 to 9).map("q" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$pre $item $post"),
      (2L, (1 to 15).map("c" + _).mkString(" ")),
      (3L, item)).toDF("doc_id", "text")
    val bench = Seq((100L, item)).toDF("doc_id", "text")
    val got = TextOps.substringDecontaminate(docs, bench, "text",
        "doc_id", k = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, s"$pre $post", 18L, 12L)), s"got ${got(1L)}")
    assert(got(2L)._3 == 15L && got(2L)._4 == 0L)
    assert(got(3L) == ((3L, "", 0L, 12L)))
    // partitioning independence
    val re = TextOps.substringDecontaminate(docs.repartition(5), bench,
        "text", "doc_id", k = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(re == got)
  }

  test("incrementalSubstring: history blocks ALL batch occurrences") {
    // history carries a 12-word block; batch doc 10 embeds it verbatim
    // (its FIRST batch occurrence still flags — history blocks), batch
    // doc 11 repeats doc 10's fresh tail (batch-internal election:
    // first occurrence in doc 10 survives, doc 11's copy flags)
    val histBlock = (1 to 12).map("h" + _).mkString(" ")
    val freshTail = (1 to 10).map("f" + _).mkString(" ")
    val hist = TextOps.substringFingerprints(
      Seq((1L, histBlock)).toDF("doc_id", "text"), "text", k = 8)
    val batch = Seq(
      (10L, histBlock + " " + freshTail),
      (11L, (1 to 9).map("x" + _).mkString(" ") + " " + freshTail)
    ).toDF("doc_id", "text")
    val got = TextOps.incrementalSubstring(batch, hist, "text",
        "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 10: 22 words -> 15 grams; grams fully inside the hist block
    // = offsets 1..5 (5 grams) -> one span covering words 1..12
    assert(got(10L) == ((10L, 15L, 5L, 1L, 12L)), s"got ${got(10L)}")
    // doc 11: 19 words -> 12 grams; the freshTail 10-word run's grams
    // (offsets 10..12, 3 grams over words 10..19) dup against doc 10's
    // first occurrence -> one 10-word span
    assert(got(11L) == ((11L, 12L, 3L, 1L, 10L)), s"got ${got(11L)}")
    // append invariant: adding the batch's fingerprints to history and
    // re-running the SAME batch flags every gram (everything seen)
    val hist2 = hist.union(TextOps.substringFingerprints(batch, "text",
      k = 8)).distinct()
    val again = TextOps.incrementalSubstring(batch, hist2, "text",
        "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(again.forall(r => r._3 == r._2), s"got ${again.toSeq}")
    // partitioning independence
    val re = TextOps.incrementalSubstring(batch.repartition(7), hist,
        "text", "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(re == got)
  }

  test("substringDupStats merges abutting gram intervals; repeats within one doc count") {
    // doc 1 repeats its own 8-word block back-to-back: the second block
    // duplicates the first (within-document), and the two dup
    // intervals [9..16] must merge with nothing else
    val block = (1 to 8).map("b" + _).mkString(" ")
    val selfRep = s"$block $block"
    // doc 2: empty and null texts produce zero grams
    val docs = Seq((1L, selfRep), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sub = TextOps.substringDupStats(docs, "text", "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 16 words -> 9 grams; gram at offset 9 equals gram at offset 1 ->
    // exactly one duplicated gram, one span of 8 words
    assert(sub(1L) == ((1L, 9L, 1L, 1L, 8L)), s"got ${sub(1L)}")
    assert(sub(2L) == ((2L, 0L, 0L, 0L, 0L)))
    assert(sub(3L) == ((3L, 0L, 0L, 0L, 0L)))
    // partitioning independence of the global election
    val re = TextOps.substringDupStats(docs.repartition(5), "text",
        "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(re == sub)
  }

  test("substringDedupRebuild drops exactly the covered span, keeps order") {
    // doc 2 copies doc 1's words 10..44 at offset 7: the rebuild must
    // drop exactly those 35 words and stitch junkA + junkB back
    // together in original order; doc 1 (first occurrence) is untouched
    val original = (1 to 60).map("w" + _).mkString(" ")
    val copied = ((1 to 7).map("junkA" + _) ++ (10 to 44).map("w" + _) ++
      (1 to 8).map("junkB" + _)).mkString(" ")
    val docs = Seq((1L, original), (2L, copied)).toDF("doc_id", "text")
    val got = TextOps.substringDedupRebuild(docs, "text", "doc_id", k = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, original, 60L, 0L)))
    // the rebuild emits NORMALIZED words (words() lowercases), like
    // every fingerprint-tier rebuild
    val expected2 = ((1 to 7).map("junka" + _) ++
      (1 to 8).map("junkb" + _)).mkString(" ")
    assert(got(2L) == ((2L, expected2, 15L, 35L)), s"got ${got(2L)}")
    // stats agreement: removed words == dup_words from the stats tier
    val stats = TextOps.substringDupStats(docs, "text", "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(stats(2L) == got(2L)._4)
    // short/empty docs survive unchanged with zero removals
    val edge = Seq((1L, "too short"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val g2 = TextOps.substringDedupRebuild(edge, "text", "doc_id", k = 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(g2(1L) == ((1L, "too short", 2L, 0L)))
    assert(g2(2L)._2 == "" && g2(2L)._4 == 0L)
    assert(g2(3L)._2 == "" && g2(3L)._4 == 0L)
  }

  test("featureShift surfaces the direction and rank of slice drift") {
    // A is all-alpha, B is all-beta, shared filler on both sides
    val df = Seq(
      (1L, "alpha alpha filler", "a"),
      (2L, "alpha filler", "a"),
      (3L, "beta beta filler", "b"),
      (4L, "beta filler", "b"),
      (5L, "neither at all", "c")  // outside both slices: ignored
    ).toDF("doc_id", "text", "src")
    val got = TextOps.featureShift(df, "text",
        isA = col("src") === "a", isB = col("src") === "b",
        buckets = 64, topK = 100)
      .as[(Long, Long, Long, Long, Long)].collect()
    // every bucket row carries counts from the two slices only
    assert(got.nonEmpty)
    val byRank = got.sortBy(_._5)
    assert(byRank.map(_._5).toSeq == (1L to got.length))
    // ranks are ordered by |llr| descending
    val absSeq = byRank.map(r => math.abs(r._4)).toSeq
    assert(absSeq == absSeq.sorted.reverse)
    // A-heavy buckets score positive, B-heavy negative: find the
    // bucket holding "alpha" (c_a > 0, c_b == 0) and vice versa
    assert(got.exists(r => r._2 > 0 && r._3 == 0 && r._4 > 0))
    assert(got.exists(r => r._2 == 0 && r._3 > 0 && r._4 < 0))
    // partitioning independence (banked integers)
    val re = TextOps.featureShift(df.repartition(7), "text",
        isA = col("src") === "a", isB = col("src") === "b",
        buckets = 64, topK = 100)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(re.toSet == got.toSet)
  }

  test("chunkDedupStats elects corpus-wide first occurrence per chunk") {
    val chunk1 = (1 to 50).map(i => s"w$i").mkString(" ")
    val chunk2 = (51 to 100).map(i => s"w$i").mkString(" ")
    val tail = "unique tail content"
    val docs = Seq(
      (10L, s"$chunk1 $chunk2"),  // 2 chunks, both first occurrences
      (20L, s"$chunk1 $tail"),    // chunk1 dups doc 10; partial chunk new
      (30L, s"$chunk2 $chunk2")   // both 50-word chunks equal doc 10's
                                  // second chunk — zero novel chunks
    ).toDF("doc_id", "text")
    val byId = TextOps.chunkDedupStats(docs, "text", "doc_id")
      .select("id", "n_chunks", "n_kept")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(10L) == ((2L, 2L)))
    assert(byId(20L) == ((2L, 1L)))
    assert(byId(30L) == ((2L, 0L)))
    // partitioning independence (winner election is a global min)
    val re = TextOps.chunkDedupStats(docs.repartition(5), "text", "doc_id")
      .select("id", "n_chunks", "n_kept")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(re == byId)
  }

  test("langConsistency: confusion matrix of metadata vs detection") {
    val docs = Seq(
      (1L, "en", "the cat and the dog with food for all"),  // en ✓
      (2L, "en", "der hund ist nicht mit der katze"),        // de text!
      (3L, "de", "der hund ist nicht mit der katze"),        // de ✓
      (4L, "fr", "qwzx vbnm")                                // no markers
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.langConsistency(docs, "text", "lang")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("en", "en") -> 1L, ("en", "de") -> 1L,
      ("de", "de") -> 1L, ("fr", "und") -> 1L))
  }

  test("dupNgramStats: repeat occurrences per order, short-doc shrink") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 6 toks: 5 bigrams 2 distinct; 4 trigrams
                             // 2 distinct; 3 4-grams 2 distinct
      (2L, "x y"),           // 2 toks: n=3,4 shrink to eff=2 -> 1 gram
      (3L, "solo"),          // 1 tok: eff=1, total=1, distinct=1
      (4L, "")               // empty -> all zero
    ).toDF("doc_id", "text")
    val got = TextOps.dupNgramStats(docs, "text", "doc_id")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 2)) == ((5L, 2L, 3L)))
    assert(got((1L, 3)) == ((4L, 2L, 2L)))
    assert(got((1L, 4)) == ((3L, 2L, 1L)))
    assert(got((2L, 2)) == ((1L, 1L, 0L)))
    assert(got((2L, 3)) == ((1L, 1L, 0L)), "eff shrinks to doc length")
    assert(got((3L, 4)) == ((1L, 1L, 0L)))
    assert(got((4L, 2)) == ((0L, 0L, 0L)))
    assert(got.size == 12)
  }

  test("bpePairCounts: word-frequency-weighted char pairs, ranked") {
    val docs = Seq(
      (1L, "abab abab cd"),   // "abab" x2, "cd" x1
      (2L, "abab x")          // "abab" x1 more; "x" has no pairs
    ).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(docs, "text", topK = 10)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    // "abab" (count 3) contributes ab x2, ba x1 per occurrence
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map("ab" -> 6L, "ba" -> 3L, "cd" -> 1L))
    assert(got.map(_._1).toSeq == Seq("ab", "ba", "cd"),
      "rank follows (cnt desc, pair asc)")
    // topK truncation keeps the best-ranked pairs
    val top1 = TextOps.bpePairCounts(docs, "text", topK = 1)
      .as[(String, Long, Long)].collect()
    assert(top1.toSeq == Seq(("ab", 6L, 1L)))
  }

  test("c4LineFilter: line gates, order-preserving rebuild, page gates") {
    val docs = Seq(
      // 3 good lines + 1 short + 1 unterminated -> page kept
      (1L, "one two three four five six.\nshort line.\nthis line has no terminal punct at all\nseven eight nine ten eleven twelve!\nanother good line with five words?"),
      // only 2 good lines -> below minLines
      (2L, "one two three four five six.\nseven eight nine ten eleven."),
      // curly brace kills the page even with 3 good lines
      (3L, "one two three four five six.\nseven eight nine ten eleven twelve.\nmore words in a fine line.\nvar x = {1};"),
      // lorem ipsum (case-insensitive) kills the page
      (4L, "one two three four five six.\nseven eight nine ten eleven twelve.\nLoReM IpSuM dolor sit amet here.")
    ).toDF("doc_id", "text")
    val got = TextOps.c4LineFilter(docs, "text", "doc_id")
      .as[(Long, String, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L,
      "one two three four five six.\nseven eight nine ten eleven twelve!\nanother good line with five words?",
      5L, 3L, 1)))
    assert(got(2L)._4 == 2L && got(2L)._5 == 0)
    assert(got(3L)._5 == 0, "curly brace must kill the page")
    assert(got(4L)._5 == 0, "lorem ipsum must kill the page")
    // kept lines preserve original order even under repartition
    val re = TextOps.c4LineFilter(docs.repartition(5), "text", "doc_id")
      .as[(Long, String, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(re == got)
  }

  test("temperatureSample: p^alpha keep-rates, rarest stratum keeps all") {
    // 64 'big' rows vs 4 'small' rows; alpha = 0.5 →
    // big keeps floor(1e6·exp(-0.5·ln(16))) = 250000 per million
    val df = ((1L to 64L).map(i => (i, "big")) ++
      (65L to 68L).map(i => (i, "small")) ++
      Seq((69L, null.asInstanceOf[String]))).toDF("doc_id", "stratum")
    val got = TextOps.temperatureSample(df, "doc_id", "stratum", 500)
      .select("doc_id", "kept").as[(Long, Int)].collect().toMap
    // model: the exact salted-bucket predicate at rate 250000/1e6
    def bucket(id: Long) =
      (graft.functions.Hashing.mix64(id + 151515157L) >>> 12) % 1000000L
    (1L to 64L).foreach { i =>
      assert(got(i) == (if (bucket(i) < 250000L) 1 else 0), s"doc $i") }
    (65L to 68L).foreach(i => assert(got(i) == 1, "rarest keeps all"))
    assert(got(69L) == 0, "null stratum dropped")
    // alpha = 1000‰ is the identity (every non-null stratum rate 1e6)
    val all = TextOps.temperatureSample(df, "doc_id", "stratum", 1000)
      .filter(col("stratum").isNotNull).agg(sum("kept")).as[Long].head()
    assert(all == 68L)
    // partitioning independence
    val re = TextOps.temperatureSample(df.repartition(5), "doc_id",
        "stratum", 500)
      .select("doc_id", "kept").as[(Long, Int)].collect().toMap
    assert(re == got)
  }

  test("temperatureRates + applySampleRates replay the online sampler") {
    val df = ((1L to 64L).map(i => (i, "big")) ++
      (65L to 68L).map(i => (i, "small")) ++
      Seq((69L, null.asInstanceOf[String]))).toDF("doc_id", "stratum")
    val rates = TextOps.temperatureRates(df, "stratum", 500)
    assert(rates == Map("big" -> 250000L, "small" -> 1000000L))
    val frozen = TextOps.applySampleRates(df, "doc_id", "stratum", rates)
      .select("doc_id", "kept").as[(Long, Int)].collect().toMap
    val online = TextOps.temperatureSample(df, "doc_id", "stratum", 500)
      .select("doc_id", "kept").as[(Long, Int)].collect().toMap
    assert(frozen == online)
    // unknown stratum under frozen rates -> kept 0
    val other = Seq((99L, "unseen")).toDF("doc_id", "stratum")
    assert(TextOps.applySampleRates(other, "doc_id", "stratum", rates)
      .select("kept").as[Int].head() == 0)
    // empty rate map keeps nothing, loudly typed
    assert(TextOps.applySampleRates(df, "doc_id", "stratum", Map.empty)
      .agg(sum("kept")).as[Long].head() == 0L)
  }

  /** Sequential reference model of [[TextOps.dsirWeights]]: same
    * tokenization, feature set, bucket hash and integer LLR banks.
    */
  private def dsirModel(docs: Seq[(Long, String, Boolean)], buckets: Int,
      alpha: Double): Map[Long, (Long, Long)] = {
    def polyHash(s: String): Long =
      s.foldLeft(1125899906842597L)((h, c) => 31 * h + c)
    def feats(t: String): Seq[String] = {
      val toks = t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val tokenized = docs.filter { case (_, t, _) =>
      t != null && t.trim.nonEmpty }
      .map { case (id, t, tgt) =>
        (id, tgt, feats(t).map(w =>
          (graft.functions.Hashing.mix64(polyHash(w)) >>> 12) % buckets)) }
    val ct = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cr = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    tokenized.foreach { case (_, tgt, bs) => bs.foreach { b =>
      if (tgt) ct(b) += 1; cr(b) += 1 } }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def lnp(c: Long, t: Long) =
      math.log((c + alpha) / (t + alpha * buckets))
    val lrm = cr.keys.map(b => b ->
      math.floor((lnp(ct(b), tt) - lnp(cr(b), tr)) * 1048576.0).toLong).toMap
    docs.map { case (id, t, _) =>
      val bs = if (t == null || t.trim.isEmpty) Seq.empty
        else tokenized.find(_._1 == id).get._3
      id -> ((bs.size.toLong, bs.map(lrm).sum))
    }.toMap
  }

  test("dsirWeights matches the sequential reference model") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", true),
      (2L, "the quick brown fox", true),
      (3L, "lorem ipsum dolor sit amet consectetur", false),
      (4L, "sphinx of black quartz judge my vow", false),
      (5L, "the quick brown fox jumps again and again", false),
      (6L, "", false),                       // empty → 0 features
      (7L, null.asInstanceOf[String], false) // null → 0 features
    )
    val df = docs.toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(df, "text", "doc_id", col("tgt"),
        buckets = 64)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val model = dsirModel(docs, buckets = 64, alpha = 0.5)
    docs.foreach { case (id, _, _) =>
      val (nf, lw) = model(id)
      assert(got(id)._2 == nf, s"n_feats mismatch for doc $id")
      assert(got(id)._3 == lw, s"logw_micro mismatch for doc $id")
      assert(got(id)._4 == (if (nf == 0) None else Some(lw / 1048576.0)))
    }
    // target-vocabulary doc outweighs off-target vocabulary
    assert(got(2L)._3 > got(3L)._3)
    // partitioning independence (integer banks end-to-end)
    val re = TextOps.dsirWeights(df.repartition(5), "text", "doc_id",
        col("tgt"), buckets = 64)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(re == got)
  }

  test("dsirScoreFrozen: bit-equal to dsirWeights; unseen grams bank default") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", true),
      (2L, "the quick brown fox", true),
      (3L, "lorem ipsum dolor sit amet consectetur", false),
      (4L, "sphinx of black quartz judge my vow", false),
      (5L, "", false),
      (6L, null.asInstanceOf[String], false))
    val df = docs.toDF("doc_id", "text", "tgt")
    val model = TextOps.dsirTrain(df, "text", "doc_id", col("tgt"),
      buckets = 64)
    val frozen = TextOps.dsirScoreFrozen(df, "text", "doc_id", model)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    val online = TextOps.dsirWeights(df, "text", "doc_id", col("tgt"),
        buckets = 64)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    assert(frozen == online, "frozen scoring must replay the online chain")
    // a doc of entirely unseen grams scores n_feats · defaultLrMicro
    // (modulo bucket collisions with trained grams — none here for the
    // distinctive tokens chosen)
    val novel = Seq((7L, "xylophone zeppelin")).toDF("doc_id", "text")
    val got = TextOps.dsirScoreFrozen(novel, "text", "doc_id", model)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(got._2 == 3L) // 2 unigrams + 1 bigram
    if (Seq("xylophone", "zeppelin", "xylophone zeppelin").forall { w =>
      def ph(s: String) = s.foldLeft(1125899906842597L)((h, c) => 31 * h + c)
      !model.lrMicro.contains(
        (graft.functions.Hashing.mix64(ph(w)) >>> 12) % 64)
    }) assert(got._3 == 3L * model.defaultLrMicro)
  }

  test("dsirResample: k rows, rank follows the Gumbel-perturbed weight") {
    val docs = (1L to 40L).map(i =>
      (i, if (i <= 8) "alpha beta gamma" else "delta epsilon zeta",
        i <= 8))
    val df = docs.toDF("doc_id", "text", "tgt")
    val kept = TextOps.dsirResample(df, "text", "doc_id", col("tgt"),
        k = 10)
      .as[(Long, Long, Option[Double], Long, Long)].collect()
    assert(kept.length == 10)
    assert(kept.map(_._5).sorted.toSeq == (1L to 10L))
    // ranks are ordered by (key_micro desc, id asc)
    val byRank = kept.sortBy(_._5)
    assert(byRank.map(_._4).toSeq ==
      byRank.map(r => (r._4, r._1)).sortBy(p => (-p._1, p._2)).map(_._1).toSeq)
    // the 20%-of-corpus target slice dominates the sample: its exp(logw)
    // is e^~2.4 ≈ 11× the raw slice's, so a majority of the 10 kept
    val tgtKept = kept.count(_._1 <= 8)
    assert(tgtKept >= 5, s"target slice under-sampled: $tgtKept/10")
    // partitioning independence
    val re = TextOps.dsirResample(df.repartition(7), "text", "doc_id",
        col("tgt"), k = 10)
      .as[(Long, Long, Option[Double], Long, Long)].collect()
    assert(re.sortBy(_._5).toSeq == byRank.toSeq)
  }
}
