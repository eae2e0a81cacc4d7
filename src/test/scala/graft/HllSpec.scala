package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Hll}

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("registers match a reference computation and ignore nulls") {
    val vals = (1L to 500L).map(Some(_)) ++ Seq(None, None)
    val regs = vals.toDF("v")
      .agg(Hll.sketch(col("v")).as("r"))
      .select(col("r")).as[Seq[Int]].head()
    // reference: same mix64/bucket/rho math on the driver
    val expect = new Array[Int](256)
    (1L to 500L).foreach { v =>
      val h = Hashing.mix64(v)
      val b = (h >>> 56).toInt
      val low = h & ((1L << 56) - 1L)
      val rho = if (low == 0L) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      if (rho > expect(b)) expect(b) = rho
    }
    assert(regs == expect.toSeq)
  }

  test("sketch is merge-order independent across partitionings") {
    val df = (1L to 20000L).toDF("v")
    def regs(d: org.apache.spark.sql.DataFrame) =
      d.agg(Hll.sketch(col("v")).as("r")).select(col("r")).as[Seq[Int]].head()
    val base = regs(df)
    assert(regs(df.repartition(17)) == base)
    assert(regs(df.repartition(1)) == base)
  }

  test("estimate within HLL error bounds at 20k distinct (p=8)") {
    val est = (1L to 20000L).toDF("v")
      .agg(Hll.sketch(col("v")).as("r"))
      .select(Hll.estimate(col("r")).as("e")).as[Long].head()
    // standard error 1.04/sqrt(256) ~ 6.5%; this data is deterministic,
    // assert a comfortable 3-sigma band
    assert(math.abs(est - 20000L) < 4000L, s"estimate $est")
  }

  test("linear counting is near-exact at low cardinality") {
    val est = (1L to 30L).toDF("v")
      .agg(Hll.sketch(col("v")).as("r"))
      .select(Hll.estimate(col("r")).as("e")).as[Long].head()
    assert(math.abs(est - 30L) <= 3L, s"estimate $est")
  }

  test("streaming incremental sketch matches batch (mergeable state)") {
    // the register buffer merges exactly across micro-batches — an
    // approximate-distinct over an unbounded stream with 256 B of state
    // per group, no distinct-value shuffle
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("grp", "v")
      .groupBy(col("grp")).agg(Hll.sketch(col("v")).as("r"))
      .select(col("grp"), Hll.estimate(col("r")).as("est"), col("r"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      input.addData((1L to 700L).map(i => ("a", i % 400)))
      q.processAllAvailable()
      input.addData((1L to 700L).map(i => ("a", 300 + i)))
      q.processAllAvailable()
      val got = spark.table("hll_stream")
        .select(col("grp"), col("r")).as[(String, Seq[Int])].head()
      val batch = ((1L to 700L).map(_ % 400) ++ (1L to 700L).map(300 + _))
        .toDF("v").agg(Hll.sketch(col("v")).as("r"))
        .select(col("r")).as[Seq[Int]].head()
      assert(got._2 == batch, "streamed registers must equal batch registers")
    } finally q.stop()
  }

  test("registered in SQL: graft_hll + graft_hll_estimate + p override") {
    graft.plans.GraftExtensions.registerAll(
      spark.sessionState.functionRegistry)
    (1L to 1000L).toDF("v").createOrReplaceTempView("hll_v")
    val est = spark.sql(
      "SELECT graft_hll_estimate(graft_hll(v)) AS e FROM hll_v")
      .as[Long].head()
    assert(math.abs(est - 1000L) < 250L, s"estimate $est")
    // p=12 → 4096 registers → tighter estimate
    val est12 = spark.sql(
      "SELECT graft_hll_estimate(graft_hll(v, 12)) AS e FROM hll_v")
      .as[Long].head()
    assert(math.abs(est12 - 1000L) < 100L, s"p=12 estimate $est12")
  }
}
