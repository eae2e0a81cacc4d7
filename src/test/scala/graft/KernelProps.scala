package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import graft.functions.{Hashing, Hll, Quantiles, TextKernelExprs}

/** Property-based cross-validation of the hashing/sketch kernels against
  * naive reference implementations — the merge-scan Jaccard, the HLL
  * register algebra, and the quantile histogram's rank contract.
  */
object KernelProps extends Properties("Kernels") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(Soak.knob("GRAFT_KERNEL_GENS", 200, 2000))

  private val genSortedSet: Gen[Array[Long]] =
    Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted.toArray)

  property("jaccardEval equals naive set Jaccard on sorted inputs") =
    forAll(genSortedSet, genSortedSet) { (a, b) =>
      val got = TextKernelExprs.jaccardEval(
        UnsafeArrayData.fromPrimitiveArray(a),
        UnsafeArrayData.fromPrimitiveArray(b))
      val (sa, sb) = (a.toSet, b.toSet)
      val expect =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else if (sa.isEmpty || sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      got == expect
    }

  private val genValues: Gen[List[Long]] =
    Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))

  private def sketchOf(vs: Seq[Long], p: Int): Array[Byte] = {
    val regs = new Array[Byte](1 << p)
    vs.foreach { v =>
      val h = Hashing.mix64(v)
      val b = (h >>> (64 - p)).toInt
      val low = h & ((1L << (64 - p)) - 1L)
      val rho =
        if (low == 0L) 64 - p + 1
        else 64 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      if (rho > regs(b)) regs(b) = rho.toByte
    }
    regs
  }

  property("HLL merge = sketch of the union (associative, idempotent)") =
    forAll(genValues, genValues) { (xs, ys) =>
      val p = 6
      val merged = sketchOf(xs, p).zip(sketchOf(ys, p)).map {
        case (a, b) => (a max b).toByte
      }
      val direct = sketchOf(xs ++ ys, p)
      val idem = sketchOf(xs ++ xs, p)
      merged.sameElements(direct) && idem.sameElements(sketchOf(xs, p))
    }

  property("HLL rho is within [1, 64-p+1] for any hash") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { v =>
      val p = 8
      val h = Hashing.mix64(v)
      val low = h & ((1L << (64 - p)) - 1L)
      val rho =
        if (low == 0L) 64 - p + 1
        else 64 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      rho >= 1 && rho <= 64 - p + 1
    }

  private val genNonNeg: Gen[List[Long]] =
    Gen.listOf(Gen.oneOf(Gen.choose(0L, 100L), Gen.choose(0L, Long.MaxValue)))

  property("qhist quantile lower bound never exceeds the true quantile") =
    forAll(genNonNeg, Gen.choose(0.0, 1.0)) { (vs, q) =>
      vs.isEmpty || {
        val counts = new Array[Long](Quantiles.NumBuckets)
        vs.foreach(v => counts(Quantiles.bucketOf(v)) += 1L)
        val got = Quantiles.quantileEval(
          UnsafeArrayData.fromPrimitiveArray(counts), q)
        val sorted = vs.sorted
        val rank = math.max(1L, math.ceil(q * vs.length).toLong).toInt
        val truth = sorted(rank - 1)
        // the bucket lower bound brackets the true order statistic from
        // below, within the histogram's 1/16 relative error
        got <= truth && (truth == 0L || got.toDouble >= truth / 17.0)
      }
    }

  property("estimate stays within 3x of truth from 1 to 100k (p=8)") =
    forAll(Gen.choose(1, 100000)) { n =>
      val regs = sketchOf((1L to n.toLong).map(_ * 7919L), 8)
      val est = Hll.estimateOf(regs.map(_.toInt))
      est >= n / 3 && est <= n.toLong * 3
    }

  private val genWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6))
  private val genText: Gen[String] =
    Gen.listOf(genWord).map(_.mkString(" "))

  private def utf8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  property("wordNgramDistinctCounts agrees with per-order wordNgramHashes") =
    forAll(genText, Gen.someOf(1, 2, 3, 4, 5)) { (t, nsRaw) =>
      val ns = if (nsRaw.isEmpty) Array(2) else nsRaw.toArray
      val got = Hashing.wordNgramDistinctCounts(t, ns)
      got.toSeq == ns.toSeq.map(n =>
        Hashing.wordNgramHashes(t, n).length.toLong)
    }

  property("dsirScoreEval = sum over the dsirBucketsEval multiset") =
    forAll(genText, Gen.choose(2, 64)) { (t, b) =>
      val toks = t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(toks.map(utf8))
      val lr = Array.tabulate(b)(i => (i.toLong + 3L) * 17L)
      val buckets = TextKernelExprs.dsirBucketsEval(arr, b).toLongArray()
      val score = TextKernelExprs.dsirScoreEval(arr, b, lr)
      // n tokens -> n unigrams + (n-1) bigrams, and the score is the
      // banked sum over exactly that multiset
      buckets.length == (if (toks.isEmpty) 0 else 2 * toks.length - 1) &&
        score == buckets.map(x => lr(x.toInt)).sum
    }

  property("dsirBucketsEval matches explicit unigram+bigram hashing") =
    forAll(genText, Gen.choose(2, 1024)) { (t, b) =>
      val toks = t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      def ph(s: String) = s.foldLeft(1125899906842597L)((h, c) => 31 * h + c)
      def bucket(s: String) = (Hashing.mix64(ph(s)) >>> 12) % b
      val grams = toks.toSeq ++ toks.toSeq.sliding(2)
        .filter(_.size == 2).map(_.mkString(" "))
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(toks.map(utf8))
      TextKernelExprs.dsirBucketsEval(arr, b).toLongArray()
        .sorted.toSeq == grams.map(bucket).sorted
    }

  private val genTokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee", "the", "of"))

  property("topTokenCountEval equals the naive max duplicate count") =
    forAll(genTokens) { toks =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(toks.map(utf8).toArray)
      val expect =
        if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.size).max.toLong
      TextKernelExprs.topTokenCountEval(arr) == expect
    }

  property("tokenSetCountEval equals the naive membership count") =
    forAll(genTokens) { toks =>
      val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      Seq("the", "of", "a").foreach(w => set.add(utf8(w)))
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(toks.map(utf8).toArray)
      TextKernelExprs.tokenSetCountEval(arr, set) ==
        toks.count(Set("the", "of", "a")).toLong
    }

  property("winnowOffsetsEval equals brute rightmost-min (tie-heavy)") =
    forAll(Gen.listOf(Gen.choose(-2L, 2L)), Gen.choose(1, 6)) { (fps0, w) =>
      val fps = fps0.toArray
      val arr = UnsafeArrayData.fromPrimitiveArray(fps)
      val got = TextKernelExprs.winnowOffsetsEval(arr, w)
        .toIntArray().toSeq
      val expect =
        if (fps.length < w) Seq.empty[Int]
        else (w to fps.length).map { e =>
          var best = e - w
          var i = e - w + 1
          while (i < e) {
            if (java.lang.Long.compareUnsigned(fps(i), fps(best)) <= 0)
              best = i
            i += 1
          }
          best + 1
        }.distinct
      got == expect
    }

  property("scriptCountsEval partitions every non-whitespace codepoint") =
    forAll(Gen.listOf(Gen.oneOf(
        Gen.alphaChar, Gen.numChar, Gen.const(' '),
        Gen.choose('Ѐ', 'ӿ'), Gen.choose('一', '丯'),
        Gen.const('!'), Gen.const('×')))) { chars =>
      val s = chars.mkString
      val c = TextKernelExprs.scriptCountsEval(utf8(s)).toLongArray()
      val nonWs = s.count(ch => ch != ' ' && ch != '\t' && ch != '\n' &&
        ch != '\r')
      c.sum == nonWs &&
        c(1) == s.count(ch => ch >= 'Ѐ' && ch <= 'ӿ') &&
        c(3) == s.count(ch => ch >= '一' && ch <= '丯') &&
        c(7) == s.count(_.isDigit)
    }
}
