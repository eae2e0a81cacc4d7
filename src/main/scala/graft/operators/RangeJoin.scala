package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key. Spark's planner can only
  * produce a BroadcastNestedLoopJoin for a pure range predicate —
  * O(|points| × |intervals|) compared pairs, a non-starter at scale.
  *
  * Bucketing makes it an exact equi-join: intervals explode to the
  * fixed-width buckets they cover, points map to their single bucket,
  * the join runs on the bucket key, and the exact predicate filters the
  * bucket-local candidates. Every qualifying (point, interval) pair
  * meets exactly once (in the point's bucket), so no dedup is needed
  * and the result is identical to the naive join.
  *
  * Cost: one shuffle on the bucket key; interval replication factor is
  * `(hi-lo)/bucketWidth + 1` — pick bucketWidth near the typical
  * interval length.
  */
object RangeJoin {

  /** Join `points` (pt column) to `intervals` ([lo, hi] columns,
    * inclusive) — column names must not collide across the two inputs.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pt: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("_bk", floor(col(pt) / bucketWidth))
    val i = intervals.withColumn("_bk", explode(sequence(
      floor(col(lo) / bucketWidth), floor(col(hi) / bucketWidth))))
    p.join(i, Seq("_bk"))
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("_bk")
  }

  /** Interval×interval OVERLAP join: every (left, right) pair whose
    * closed intervals intersect (`aLo <= bHi AND bLo <= aHi`) — the
    * sessions-vs-maintenance-windows / annotation-alignment join.
    * Column names must not collide across the two inputs.
    *
    * Same bucketing idea as [[pointInInterval]], with the standard
    * first-common-bucket trick replacing dedup: an overlapping pair
    * shares every bucket its intersection covers, so the exact
    * predicate additionally pins the pair to the FIRST bucket both
    * intervals cover — `max(floor(aLo/W), floor(bLo/W))` — and each
    * qualifying pair meets exactly once. One shuffle on the bucket
    * key, no distinct, result identical to the naive nested loop.
    * Replication factor per side is `span/bucketWidth + 1`; pick
    * `bucketWidth` near the typical interval length.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val a = left.withColumn("_bk", explode(sequence(
      floor(col(aLo) / bucketWidth), floor(col(aHi) / bucketWidth))))
    val b = right.withColumn("_bk", explode(sequence(
      floor(col(bLo) / bucketWidth), floor(col(bHi) / bucketWidth))))
    a.join(b, Seq("_bk"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("_bk") === greatest(
        floor(col(aLo) / bucketWidth), floor(col(bLo) / bucketWidth)))
      .drop("_bk")
  }
}
