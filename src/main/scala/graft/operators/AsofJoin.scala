package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single nearest right row in the
  * same key group under a direction convention (the pandas
  * `merge_asof` surface): `backward` = latest right with `rightTs <=
  * leftTs` (the kdb/DuckDB default), `forward` = earliest right with
  * `rightTs >= leftTs`, `nearest` = whichever of the two is closer
  * (ties to backward, the pandas rule). An optional `tolerance` bounds
  * the match distance: farther candidates count as no match. Spark has
  * no native operator for any of these; the naive range join explodes
  * to every (left, candidate-right) pair before aggregation.
  *
  * Composition used here (the scale-correct shape): union both sides
  * tagged, one hash-shuffle on the key, sort by (ts, side), and carry
  * the right side's packed values across with `last(..., ignoreNulls)`
  * over a running frame (backward) / `first(...)` over a following
  * frame (forward) — every left row then holds exactly its nearest
  * right row per direction. O(n log n) per key partition, ONE shuffle,
  * no pair blow-up, whole-stage codegen'd windows. `nearest` evaluates
  * both frames on the same partitioning (two sorts differing only in
  * the equal-ts side order, no extra exchange).
  *
  * Right rows at equal (key, ts) must be unique (dedup first) for a
  * deterministic result — same contract as DuckDB/kdb asof joins.
  */
object AsofJoin {

  /** @param rightVals right columns carried onto left rows, output as
    *                  `asof_<name>`
    * @param leftOuter keep left rows with no qualifying right row
    *                  (nulls)
    * @param direction `backward` (default), `forward`, or `nearest`
    * @param tolerance max `|leftTs − rightTs|` for a match, in the ts
    *                  column's own unit; `None` = unbounded
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      leftOuter: Boolean = false, direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0: $t"))
    val lTagged = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_is_left", lit(1))
    // All carried values travel inside ONE struct (with the right ts,
    // for distance math) so the window fill picks them atomically from
    // the same right row — per-column fills would mix values from
    // different right rows whenever a newer right row has a NULL in
    // one carried column.
    val rTagged = right
      .select(keyCols.map(col) :+ col(rightTs).as("_ats") :+
        struct(col(rightTs).as("_rts") +: rightVals.map(col): _*)
          .as("_asof_vals"): _*)
      .withColumn("_is_left", lit(0))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // backward: right (side 0) sorts before left (side 1) at equal ts,
    // so a right row at exactly leftTs is visible — the `>=` convention
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left sorts before right at equal ts, and the frame looks
    // ahead — a right row at exactly leftTs is again visible
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = direction match {
      case "backward" => u.withColumn("_m",
        last(col("_asof_vals"), ignoreNulls = true).over(wB))
      case "forward" => u.withColumn("_m",
        first(col("_asof_vals"), ignoreNulls = true).over(wF))
      case _ =>
        val both = u
          .withColumn("_mb",
            last(col("_asof_vals"), ignoreNulls = true).over(wB))
          .withColumn("_mf",
            first(col("_asof_vals"), ignoreNulls = true).over(wF))
        // closer side wins; equal distance ties to backward (pandas)
        both.withColumn("_m",
            when(col("_mb").isNull, col("_mf"))
              .when(col("_mf").isNull, col("_mb"))
              .when(col("_ats") - col("_mb._rts") <=
                col("_mf._rts") - col("_ats"), col("_mb"))
              .otherwise(col("_mf")))
          .drop("_mb", "_mf")
    }
    val gated = tolerance match {
      case Some(t) => filled.withColumn("_m",
        when(abs(col("_ats") - col("_m._rts")) <= t, col("_m")))
      case None => filled
    }
    val matched = gated.filter(col("_is_left") === 1)
    // inner mode = "a qualifying right row exists": one null check on
    // the struct itself, never on the carried values (which may be NULL)
    val kept = if (leftOuter) matched
               else matched.filter(col("_m").isNotNull)
    rightVals.foldLeft(kept) { (df, c) =>
        df.withColumn(s"asof_$c", col("_m").getField(c))
      }
      .drop("_ats", "_is_left", "_asof_vals", "_m")
  }
}
