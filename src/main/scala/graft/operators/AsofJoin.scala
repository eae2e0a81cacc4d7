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
    // All carried values travel inside ONE struct so `last(ignoreNulls)`
    // picks them atomically from the same right row — per-column fills
    // would mix values from different right rows whenever a newer right
    // row has a NULL in one carried column.
    val rTagged = right
      .select(keyCols.map(col) :+ col(rightTs).as("_ats") :+
        struct(rightVals.map(col): _*).as("_asof_vals"): _*)
      .withColumn("_is_left", lit(0))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal ts, so a right
    // row at exactly leftTs is visible — the `>=` as-of convention
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("_asof_vals",
      last(col("_asof_vals"), ignoreNulls = true).over(w))
    val matched = filled.filter(col("_is_left") === 1)
    // inner mode = "an earlier right row exists": one null check on the
    // struct itself, never on the carried values (which may be NULL)
    val kept = if (leftOuter) matched
               else matched.filter(col("_asof_vals").isNotNull)
    rightVals.foldLeft(kept) { (df, c) =>
        df.withColumn(s"asof_$c", col("_asof_vals").getField(c))
      }
      .drop("_ats", "_is_left", "_asof_vals")
  }
}
