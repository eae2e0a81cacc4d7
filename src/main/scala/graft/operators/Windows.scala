package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** The Siddhi window family re-expressed on Spark.
  *
  * Siddhi windows emit *per-event* results over a trailing scope
  * (reference exercises: `#window.length(5)` at SiddhiCEPITCase.java:315,
  * `#window.time(500)` at :316, batch variants via the generic window
  * handler at utils/SiddhiExecutionPlanner.java:222-227). In batch those
  * are exactly SQL window frames — codegen'd, shuffle-once-per-key,
  * spillable; in streaming the time-based ones are `window()` /
  * `session_window()` groups and the count-based ones a stateful op.
  *
  * All helpers take an explicit (ts, tieBreak) total order so results are
  * deterministic and oracle-comparable.
  */
object Windows {

  private def ordered(partition: Seq[Column], ts: Column, tie: Column): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(ts.asc, tie.asc)

  /** `#window.length(n)`: trailing n-row frame per key (per-event emit). */
  def length(partition: Seq[Column], ts: Column, tie: Column, n: Int): WindowSpec =
    ordered(partition, ts, tie).rowsBetween(-(n - 1), Window.currentRow)

  /** `#window.time(d)`: trailing event-time range frame, microseconds. */
  def time(partition: Seq[Column], tsMicros: Column, rangeMicros: Long): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(tsMicros.asc)
      .rangeBetween(-rangeMicros, Window.currentRow)

  /** `maxForever` / `minForever`: unbounded-preceding running frame. */
  def forever(partition: Seq[Column], ts: Column, tie: Column): WindowSpec =
    ordered(partition, ts, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** `#window.lengthBatch(n)`: assigns each row its tumbling count-batch
    * index per key (0-based); group by key + batch id for batch emits.
    */
  def lengthBatchId(partition: Seq[Column], ts: Column, tie: Column, n: Int): Column =
    floor((row_number().over(ordered(partition, ts, tie)) - 1) / n)

  /** `#window.timeBatch(d)`: tumbling event-time bucket (window start). */
  def timeBatchStart(ts: Column, duration: String): Column =
    window(ts, duration).getField("start")

  /** Session window start per Structured Streaming `session_window`;
    * batch equivalent: gap-based session id via lag().
    */
  def sessionId(partition: Seq[Column], ts: Column, tie: Column,
      gapMicros: Long, tsMicros: Column): Column = {
    val w = ordered(partition, ts, tie)
    val newSession = when(
      tsMicros - lag(tsMicros, 1).over(w) > gapMicros || lag(tsMicros, 1).over(w).isNull,
      1).otherwise(0)
    sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** `#window.sort(n, attr)`: top-n rows per key by an ordering. */
  def topN(df: DataFrame, partition: Seq[Column], order: Seq[Column], n: Int): DataFrame =
    df.withColumn("_rank",
        row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col("_rank") <= n)
      .drop("_rank")
}
