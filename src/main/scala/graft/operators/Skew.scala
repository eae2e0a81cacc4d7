package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins. AQE's runtime skew-join split handles most
  * cases for free (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default); explicit salting is for the residual worst case — a single
  * key so hot one task would still drown (the 100 TB "viral document" /
  * bot-user shape) or non-AQE execution paths.
  */
object Skew {

  /** Salted equi-join: the left (big, skewed) side gets a random salt in
    * [0, saltFactor); the right side is replicated `saltFactor`× with
    * every salt value, and the join key becomes (key, salt) — a hot key
    * now spreads over `saltFactor` reducers instead of one.
    *
    * Right-side replication costs |right| × saltFactor rows, so use a
    * dimension-sized right side (same regime as a broadcast candidate
    * that is a bit too large to broadcast).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    // right_outer/full_outer would emit each UNMATCHED right row once per
    // salt replica (saltFactor duplicates); only left-preserving joins
    // are sound under right-side replication
    val norm = joinType.toLowerCase.replaceAll("[_ ]", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti").contains(norm),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched right " +
        "rows saltFactor times; use inner/left_outer/left_semi/left_anti")
    val salted = left.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Per-key frequency histogram — pick saltFactor from the hottest
    * key's share: saltFactor ≈ ceil(maxKeyCount / targetRowsPerTask).
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
