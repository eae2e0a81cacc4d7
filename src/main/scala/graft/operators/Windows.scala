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

  /** `#window.externalTime(tsAttr, d)`: identical to [[time]] — every
    * window here is already driven by the event's own timestamp
    * attribute, which IS Siddhi's externalTime semantics (the wall-clock
    * flavor does not exist in a batch/event-time engine).
    */
  def externalTime(partition: Seq[Column], tsMicros: Column,
      rangeMicros: Long): WindowSpec = time(partition, tsMicros, rangeMicros)

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

  /** `#window.session(gap)`: gap-based session id per key (1-based,
    * in first-event order). Batch equivalent of Structured Streaming's
    * `session_window`; two window passes over ONE shuffle (same
    * partitioning + ordering, Catalyst reuses the sort).
    */
  def withSessionId(df: DataFrame, partition: Seq[Column], tsMicros: Column,
      tie: Column, gapMicros: Long, out: String = "session_id"): DataFrame = {
    val w = ordered(partition, tsMicros, tie)
    df.withColumn("_new_session",
        when(lag(tsMicros, 1).over(w).isNull ||
          tsMicros - lag(tsMicros, 1).over(w) > gapMicros, 1L).otherwise(0L))
      .withColumn(out, sum(col("_new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** `#window.frequent(n)`: the n most frequent values of `attr` per key
    * (count desc, value asc tie-break). Exact counts — at 100 TB scale
    * the groupBy is a map-side-combined hash agg on (key, attr), tiny
    * unless attr cardinality explodes.
    */
  def frequent(df: DataFrame, partition: Seq[Column], attr: Column, n: Int): DataFrame = {
    val counted = df.groupBy((partition :+ attr): _*)
      .agg(count(lit(1)).as("cnt"))
    counted.withColumn("_rank",
        row_number().over(Window.partitionBy(partition: _*)
          .orderBy(col("cnt").desc, attr.asc)))
      .filter(col("_rank") <= n)
      .drop("_rank")
  }

  /** `#window.delay(d)`: events become visible d later — batch shape is
    * a shifted event-time column (streaming: watermark + d hold-back).
    */
  def delayed(tsMicros: Column, delayMicros: Long): Column =
    tsMicros + delayMicros

  /** The delay window joined with its own source: for each event, how
    * many same-key events are already visible from the d-delayed stream
    * (delayed timestamp ts+d at or before the event's ts). One range
    * frame over one shuffle — the batch dual of Siddhi's
    * `#window.delay(d)` join pattern.
    */
  def delayedVisibleCount(partition: Seq[Column], tsMicros: Column,
      delayMicros: Long): Column =
    count(lit(1)).over(Window.partitionBy(partition: _*)
      .orderBy(tsMicros.asc)
      .rangeBetween(Window.unboundedPreceding, -delayMicros))

  /** `#window.sort(n, attr)`: top-n rows per key by an ordering. */
  def topN(df: DataFrame, partition: Seq[Column], order: Seq[Column], n: Int): DataFrame =
    df.withColumn("_rank",
        row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col("_rank") <= n)
      .drop("_rank")

  /** `#window.timeLength(d, n)`: trailing scope bounded by BOTH an
    * event-time range and a row count — the window holds the newest
    * ≤ n events no older than d. Values inside the time range are
    * collected per event and the newest n kept (`slice` from the tail),
    * so any fold over the array implements the per-event aggregate.
    * One shuffle + sort; array size is bounded by the time range.
    */
  def timeLengthValues(partition: Seq[Column], tsMicros: Column,
      tie: Column, rangeMicros: Long, n: Int, value: Column): Column = {
    // rangeBetween forbids a tie-break in orderBy, and the range frame
    // includes same-ts LATER events — collect (ts, tie, value) structs,
    // re-sort, and keep only entries at or before this event's (ts, tie)
    val collected = collect_list(struct(tsMicros.as("t"), tie.as("k"),
      value.as("v"))).over(Window.partitionBy(partition: _*)
        .orderBy(tsMicros.asc).rangeBetween(-rangeMicros, Window.currentRow))
    val upTo = filter(array_sort(collected),
      s => s.getField("t") < tsMicros ||
        (s.getField("t") === tsMicros && s.getField("k") <= tie))
    val vals = transform(upTo, s => s.getField("v"))
    when(size(vals) <= n, vals).otherwise(slice(vals, -n, n))
  }

  /** `#window.unique(attr)`: the window holds the LATEST event per
    * distinct `attr` value within each key — older same-attr events are
    * expired on arrival of a newer one.
    */
  def uniqueLatest(df: DataFrame, partition: Seq[Column], attr: Column,
      ts: Column, tie: Column): DataFrame =
    df.withColumn("_rank",
        row_number().over(Window.partitionBy((partition :+ attr): _*)
          .orderBy(ts.desc, tie.desc)))
      .filter(col("_rank") === 1)
      .drop("_rank")
}
