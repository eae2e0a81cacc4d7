package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bloom, CountMin, Hashing}

/** Count-Min and Bloom sketch specs: exactness bounds, merge-order
  * independence (the map-side-combine contract), and driver-side
  * reference parity of the bit/bucket math.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- CM

  test("count-min estimate upper-bounds and is exact without collisions") {
    // 20 distinct values, width 1024: collision-free with d=4 rows in
    // this fixed dataset, so min-over-rows equals the true count
    val rows = (1L to 20L).flatMap(v => Seq.fill(v.toInt)(v))
    val df = rows.toDF("v")
    val sk = df.agg(CountMin.sketch(col("v"), 4, 1024).as("sk"))
    val est = df.distinct()
      .crossJoin(sk)
      .select(col("v"), CountMin.estimate(col("sk"), col("v"), 4).as("e"))
      .as[(Long, Long)].collect().toMap
    (1L to 20L).foreach(v => assert(est(v) == v, s"v=$v est=${est(v)}"))
  }

  test("count-min estimate never under-counts under forced collisions") {
    val rows = (1L to 500L).flatMap(v => Seq.fill((v % 7).toInt + 1)(v))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = rows.toDF("v")
    val sk = df.agg(CountMin.sketch(col("v"), 4, 32).as("sk"))
    val est = df.distinct().crossJoin(sk)
      .select(col("v"), CountMin.estimate(col("sk"), col("v"), 4).as("e"))
      .as[(Long, Long)].collect()
    est.foreach { case (v, e) =>
      assert(e >= truth(v), s"under-count at $v: $e < ${truth(v)}")
    }
    // width 32 over 500 values MUST collide somewhere
    assert(est.exists { case (v, e) => e > truth(v) })
  }

  test("count-min counters are merge-order independent and match reference") {
    val rows = (1L to 3000L).map(v => v % 97)
    val df = rows.toDF("v")
    def counters(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(CountMin.sketch(col("v"), 2, 64).as("sk"))
        .select(col("sk")).as[Seq[Long]].head()
    val base = counters(df)
    assert(counters(df.repartition(13)) == base)
    assert(counters(df.repartition(1)) == base)
    // driver-side reference of the same bucket math
    val expect = new Array[Long](2 * 64)
    rows.foreach { v =>
      (0 until 2).foreach { j =>
        expect(j * 64 + CountMin.bucketOf(v, j, 64)) += 1L
      }
    }
    assert(base == expect.toSeq)
  }

  test("count-min ignores nulls and rejects bad depth at estimate") {
    val df = Seq(Some(1L), None, Some(1L), None).toDF("v")
    val sk = df.agg(CountMin.sketch(col("v"), 4, 64).as("sk"))
    val e = sk.select(
      CountMin.estimate(col("sk"), lit(1L), 4).as("e")).as[Long].head()
    assert(e == 2L)
    val err = intercept[Exception] {
      sk.select(CountMin.estimate(col("sk"), lit(1L), 7)).collect()
    }
    assert(err.getMessage.contains("not a multiple of depth") ||
      err.getCause != null)
  }

  // ------------------------------------------------------------- Bloom

  test("bloom has no false negatives and deterministic bit array") {
    val vals = (1L to 400L).map(_ * 31L)
    val df = vals.toDF("v")
    val bloom = df.agg(Bloom.agg(col("v"), 1 << 14, 3).as("b"))
    val hits = df.crossJoin(bloom)
      .select(Bloom.mightContain(col("b"), col("v"), 3).as("h"))
      .as[Boolean].collect()
    assert(hits.forall(identity), "false negative")
    // driver-side reference of the same bit math
    val bits = bloom.select(col("b")).as[Array[Byte]].head()
    val expect = new Array[Byte](1 << 11)
    vals.foreach { v =>
      (0 until 3).foreach { i =>
        val p = Bloom.posOf(v, i, 1 << 14)
        expect(p >>> 3) = (expect(p >>> 3) | (1 << (p & 7))).toByte
      }
    }
    assert(bits.toSeq == expect.toSeq)
  }

  test("bloom false-positive rate stays near theory at 10% fill") {
    val member = (1L to 1800L)
    val bloom = member.toDF("v")
      .agg(Bloom.agg(col("v"), 1 << 16, 3).as("b"))
    val probes = (1000001L to 1010000L).toDF("v")
    val fp = probes.crossJoin(bloom)
      .filter(Bloom.mightContain(col("b"), col("v"), 3))
      .count()
    // fill ~ 1 - exp(-3*1800/65536) ~ 7.9%; fp ~ 0.079^3 ~ 5e-4
    assert(fp < 30, s"false positives $fp of 10000")
  }

  test("bloom bit array is merge-order independent across partitionings") {
    val df = (1L to 5000L).toDF("v")
    def bits(d: org.apache.spark.sql.DataFrame): Seq[Byte] =
      d.agg(Bloom.agg(col("v"), 1 << 13, 3).as("b"))
        .select(col("b")).as[Array[Byte]].head().toSeq
    val base = bits(df)
    assert(bits(df.repartition(29)) == base)
    assert(bits(df.repartition(1)) == base)
  }

  test("streaming incremental count-min matches batch (mergeable state)") {
    // counter arrays merge exactly across micro-batches — streaming
    // heavy-hitter detection with depth*width longs of state per group
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("grp", "v")
      .groupBy(col("grp")).agg(CountMin.sketch(col("v"), 2, 32).as("sk"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    try {
      input.addData((1L to 400L).map(i => ("a", i % 50)))
      q.processAllAvailable()
      input.addData((1L to 400L).map(i => ("a", i % 90)))
      q.processAllAvailable()
      val got = spark.table("cm_stream")
        .select(col("sk")).as[Seq[Long]].head()
      val batch = ((1L to 400L).map(_ % 50) ++ (1L to 400L).map(_ % 90))
        .toDF("v").agg(CountMin.sketch(col("v"), 2, 32).as("sk"))
        .select(col("sk")).as[Seq[Long]].head()
      assert(got == batch, "streamed counters must equal batch counters")
    } finally q.stop()
  }

  test("registered in SQL: graft_cm/graft_bloom families") {
    graft.plans.GraftExtensions.registerAll(
      spark.sessionState.functionRegistry)
    (1L to 100L).map(v => v % 10).toDF("v").createOrReplaceTempView("sk_v")
    val est = spark.sql(
      """SELECT graft_cm_estimate(sk, 3, 4) AS e FROM
        |  (SELECT graft_cm(v, 4, 256) AS sk FROM sk_v)""".stripMargin)
      .as[Long].head()
    assert(est == 10L, s"cm estimate $est")
    val hit = spark.sql(
      """SELECT graft_bloom_contains(b, 7, 3) AS h,
        |       graft_bloom_contains(b, 999, 3) AS miss FROM
        |  (SELECT graft_bloom(v, 65536, 3) AS b FROM sk_v)""".stripMargin)
      .as[(Boolean, Boolean)].head()
    assert(hit._1 && !hit._2)
  }

  test("bloomDecontaminate flags exactly the oracle's maybe-set") {
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 4-grams
      (2L, "one two three four five six"),    // disjoint
      (3L, "zzz alpha beta gamma delta qqq")  // shares one 4-gram
    ).toDF("doc_id", "text")
    val out = operators.TextOps
      .bloomDecontaminate(corpus, bench, "text", "doc_id", n = 4)
      .orderBy(col("id")).as[(Long, Long, Int)].collect()
    assert(out(0) == ((1L, 2L, 1)))
    assert(out(1)._3 == 0) // 16k-bit filter, 3 grams: no false positive
    assert(out(2) == ((3L, 1L, 1)))
  }
}
