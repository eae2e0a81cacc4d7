package graft

import org.apache.spark.sql.functions._
import graft.functions.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("bucket math: lowerBound(bucketOf(v)) <= v within 1/16 relative") {
    val probes = (0L until 2048L) ++
      Seq(1L << 20, (1L << 20) + 7, 1L << 40, Long.MaxValue / 3,
        Long.MaxValue - 1, Long.MaxValue) ++
      (0 until 1000).map(i => math.abs(new scala.util.Random(i).nextLong()))
    probes.foreach { v =>
      val b = Quantiles.bucketOf(v)
      val lb = Quantiles.lowerBound(b)
      assert(lb <= v, s"v=$v bucket=$b lb=$lb")
      if (v >= 32)
        assert(v - lb <= lb / 16 + 1, s"v=$v lb=$lb error too big")
      else assert(lb == v, s"small values are exact: v=$v lb=$lb")
      // buckets are monotone: the next bucket's bound is above v
      if (b + 1 < Quantiles.NumBuckets)
        assert(Quantiles.lowerBound(b + 1) > v, s"v=$v not below next bound")
    }
  }

  test("quantileUb: exclusive upper bound covers the quantile bucket") {
    // all values in ONE coarse bucket: lb == lb but ub > every value —
    // the band [p10_lb, p90_ub) keeps the whole corpus instead of none
    val xs = Seq(3388L, 3393L, 3411L, 3470L, 3399L)
    val got = xs.toDF("v").agg(Quantiles.qhist(col("v")).as("h"))
      .select(Quantiles.quantile(col("h"), 0.1).as("lo"),
        Quantiles.quantileUb(col("h"), 0.9).as("hi"))
      .as[(Long, Long)].head()
    assert(got._1 <= xs.min)
    assert(got._2 > xs.max)
    assert(xs.forall(v => v >= got._1 && v < got._2))
    // exact domain (< 32): ub is lb + 1 — the band is a true order-stat
    val ex = (1L to 10L).toDF("v").agg(Quantiles.qhist(col("v")).as("h"))
      .select(Quantiles.quantile(col("h"), 0.5).as("lo"),
        Quantiles.quantileUb(col("h"), 0.5).as("hi"))
      .as[(Long, Long)].head()
    assert(ex == ((5L, 6L)))
  }

  test("qhist quantiles: exact on small domains, merge-order independent") {
    // values < 32 bucket exactly, so quantiles are exact order stats
    val xs = (1L to 20L) ++ (1L to 20L) ++ Seq(25L, 25L)
    val df = xs.toDF("v")
    def quant(d: org.apache.spark.sql.DataFrame) = d
      .agg(Quantiles.qhist(col("v")).as("h"))
      .select(Quantiles.quantile(col("h"), 0.5).as("p50"),
        Quantiles.quantile(col("h"), 1.0).as("p100"))
      .as[(Long, Long)].head()
    // n=42, rank ceil(0.5*42)=21; pairs 1..10 fill ranks 1-20, so the
    // 21st order statistic is 11
    val (p50, p100) = quant(df)
    assert(p50 == 11L && p100 == 25L)
    // different partitionings merge partials in different orders —
    // the commutative buffer must not care
    assert(quant(df.repartition(13)) == ((p50, p100)))
    assert(quant(df.repartition(1)) == ((p50, p100)))
  }

  test("out-of-range quantile fraction fails fast") {
    // literal out-of-range q dies at analysis (TypeCheckFailure), not
    // by silently returning lowerBound(959) ~ 2^62
    val df = Seq(1L, 2L, 3L).toDF("v").agg(Quantiles.qhist(col("v")).as("h"))
    val e = intercept[Exception] {
      df.select(Quantiles.quantile(col("h"), 1.5)).collect()
    }
    assert(e.getMessage.contains("[0, 1]"))
    // non-literal path: the runtime kernel rejects too
    val e2 = intercept[IllegalArgumentException] {
      Quantiles.quantileEval(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(new Array[Long](Quantiles.NumBuckets)), -0.1)
    }
    assert(e2.getMessage.contains("[0, 1]"))
  }

  test("qhist registered in SQL; empty histogram quantile is -1") {
    graft.plans.GraftExtensions.registerAll(
      spark.sessionState.functionRegistry)
    Seq(100L, 200L, 300L).toDF("v").createOrReplaceTempView("qh_v")
    val got = spark.sql(
      """SELECT graft_qhist_quantile(graft_qhist(v), 0.5d) AS p50
        |FROM qh_v""".stripMargin).as[Long].head()
    // 200 buckets to [192, 208): lb 192
    assert(got == Quantiles.lowerBound(Quantiles.bucketOf(200L)))
    val empty = spark.sql(
      """SELECT graft_qhist_quantile(graft_qhist(v), 0.5d) AS p50
        |FROM qh_v WHERE v < 0""".stripMargin).as[Long].head()
    assert(empty == -1L)
    // the exclusive upper bound is registered too and brackets the lb
    val ub = spark.sql(
      """SELECT graft_qhist_quantile_ub(graft_qhist(v), 0.5d) AS u
        |FROM qh_v""".stripMargin).as[Long].head()
    assert(ub == Quantiles.lowerBound(Quantiles.bucketOf(200L) + 1))
  }

  test("streaming incremental qhist matches batch (mergeable state)") {
    // the histogram's commutative merge makes it a valid streaming
    // aggregate: per-group state is 960 longs, quantiles stay exact
    // across micro-batch boundaries
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("grp", "v")
      .groupBy(col("grp")).agg(Quantiles.qhist(col("v")).as("h"))
      .writeStream.format("memory").queryName("qh_stream")
      .outputMode("complete").start()
    try {
      input.addData((1L to 500L).map(i => ("a", i)))
      q.processAllAvailable()
      input.addData((501L to 1000L).map(i => ("a", i)))
      q.processAllAvailable()
      val got = spark.table("qh_stream")
        .select(Quantiles.quantile(col("h"), 0.5)).as[Long].head()
      val batch = (1L to 1000L).toDF("v")
        .agg(Quantiles.qhist(col("v")).as("h"))
        .select(Quantiles.quantile(col("h"), 0.5)).as[Long].head()
      assert(got == batch, s"streamed p50 $got != batch p50 $batch")
    } finally q.stop()
  }

  test("null inputs are skipped, negatives clamp to bucket 0") {
    val df = Seq(Some(5L), None, Some(-3L), Some(5L)).toDF("v")
    val h = df.agg(Quantiles.qhist(col("v")).as("h"))
      .select(col("h")).as[Seq[Long]].head()
    assert(h.sum == 3L) // null skipped
    assert(h(0) == 1L && h(5) == 2L)
  }
}
