package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row with
  * `rightTs <= leftTs` in the same key group. Spark has no native
  * operator for this; the naive range join explodes to every
  * (left, earlier-right) pair before aggregation.
  *
  * Composition used here (the scale-correct shape): union both sides
  * tagged, one hash-shuffle on the key, sort by (ts, side), and carry
  * the right side's values forward with `last(..., ignoreNulls)` over a
  * running frame — every left row then holds exactly the most recent
  * right values. O(n log n) per key partition, one shuffle, no pair
  * blow-up, whole-stage codegen'd window.
  *
  * Right rows at equal (key, ts) must be unique (dedup first) for a
  * deterministic result — same contract as DuckDB/kdb asof joins.
  */
object AsofJoin {

  /** @param rightVals right columns carried onto left rows, output as
    *                  `asof_<name>`
    * @param leftOuter keep left rows with no earlier right row (nulls)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      leftOuter: Boolean = false): DataFrame = {
    val lTagged = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_is_left", lit(1))
    val rTagged = rightVals.foldLeft(
        right.select((keyCols :+ rightTs).map(col) ++
          rightVals.map(c => col(c).as(s"asof_$c")): _*)) { (df, _) => df }
      .withColumn("_ats", col(rightTs))
      .withColumn("_is_left", lit(0))
      .drop(rightTs)
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal ts, so a right
    // row at exactly leftTs is visible — the `>=` as-of convention
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    val leftRows = filled.filter(col("_is_left") === 1).drop("_ats", "_is_left")
    if (leftOuter) leftRows
    else leftRows.filter(
      rightVals.map(c => col(s"asof_$c").isNotNull).reduce(_ && _))
  }
}
