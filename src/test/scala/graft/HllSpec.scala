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
