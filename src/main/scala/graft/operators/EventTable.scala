package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SiddhiQL `define table` equivalent: a keyed, updatable relation that
  * streams join against and queries insert into / update / delete from
  * (the reference forwards table DDL+DML verbatim to its embedded
  * engine; Spark has no mutable relation, so this is the idiomatic
  * rebuild: immutable DataFrame snapshots + generation-tagged upserts).
  *
  * Semantics (matching Siddhi's in-memory table):
  *  - `upsert`: incoming rows REPLACE same-key rows (last writer wins;
  *    within one call, duplicates collapse to the max of `winner`);
  *  - `delete`: removes rows matching a predicate;
  *  - `toDF`: the current compacted snapshot — join it (broadcast: the
  *    table is dimension-sized by contract, like Siddhi's in-memory
  *    tables) or register it as a view.
  *
  * Scale: each upsert pre-compacts ONLY the incoming batch (one shuffle
  * of batch size); the lazily-compacted union resolves last-writer by a
  * driver-side generation counter, so snapshot compaction is one
  * hash-agg over the table — never over the stream joined against it.
  */
final class EventTable private (val keyCols: Seq[String]) {

  private var gen = 0L
  @volatile private var cur: Option[DataFrame] = None

  /** Insert-or-update: per-key winner of `rows` (max of `winner`
    * ordering, e.g. a version/timestamp column) replaces any existing
    * row of that key.
    */
  def upsert(rows: DataFrame, winner: Seq[Column]): this.type =
    synchronized {
      gen += 1
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(winner.map(_.desc): _*)
      val batch = rows.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1).drop("_rk")
        .withColumn("_gen", lit(gen))
      cur = Some(cur.map(_.unionByName(batch)).getOrElse(batch))
      this
    }

  /** Delete rows currently in the table matching `cond`. Compacts
    * first: deleting a key's CURRENT row must not resurface the
    * superseded row from an earlier upsert generation. SQL DELETE-WHERE
    * semantics: rows where `cond` is NULL are KEPT (a bare `!cond`
    * filter would silently drop them — !NULL is NULL).
    */
  def delete(cond: Column): this.type = synchronized {
    cur = cur.map(_ => toDF.filter(!coalesce(cond, lit(false)))
      .withColumn("_gen", lit(0L)))
    this
  }

  /** Current snapshot: one row per key (highest generation wins). */
  def toDF: DataFrame = {
    val df = cur.getOrElse(
      throw new IllegalStateException("EventTable is empty — upsert first"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_gen").desc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk", "_gen")
  }

  /** Materialize the compaction and TRUNCATE LINEAGE: without this, a
    * long-running upsert stream grows the snapshot's logical plan by one
    * union+window per batch until planning time dominates.
    * `localCheckpoint(eager)` cuts the plan to the materialized blocks.
    */
  def compact(): this.type = synchronized {
    cur = cur.map(_ => toDF.localCheckpoint(eager = true)
      .withColumn("_gen", lit(0L)))
    this
  }

  /** Maintain the table from a stream (`update or insert into <table>`
    * in SiddhiQL): every micro-batch upserts by the table key with
    * `winner` ordering intra-batch. Start the returned writer to run.
    *
    * The micro-batch frame is only valid inside its batch, so rows are
    * materialized before landing in the table — fine by the
    * dimension-sized contract (Siddhi tables are in-memory too). The
    * contract is ENFORCED by `maxBatchRows`: a misrouted fact stream
    * fails the batch loudly instead of OOMing the driver, and at most
    * `maxBatchRows + 1` rows are ever materialized (the collect is
    * limit-bounded, not count-then-collect).
    *
    * That failure is TERMINAL for the streaming query (a foreachBatch
    * exception stops it; there is no skip/retry path) — intentional:
    * a fact stream routed at a dimension table is a wiring bug, not a
    * transient. Note the cap bounds ROWS, not bytes — for very wide
    * dimensions size the cap accordingly; `spark.driver.maxResultSize`
    * remains the byte-level backstop on the collect.
    */
  def sink(stream: DataFrame, winner: Seq[Column],
      compactEvery: Int = 16, maxBatchRows: Int = 1 << 20):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val rows = batch.limit(maxBatchRows + 1).collect().toIndexedSeq
        if (rows.size > maxBatchRows)
          throw new IllegalStateException(
            s"EventTable.sink batch $batchId exceeds maxBatchRows=" +
              s"$maxBatchRows — EventTables hold dimension-sized data " +
              "only; route fact streams elsewhere or raise the cap")
        if (rows.nonEmpty) {
          val stable = batch.sparkSession.createDataFrame(
            batch.sparkSession.sparkContext.parallelize(rows), batch.schema)
          upsert(stable, winner)
          // periodic lineage truncation: each upsert deepens the lazy
          // union chain; unbounded streams would otherwise grow planning
          // time per batch
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
            compact()
        }
        ()
    }
}

object EventTable {
  def apply(keyCols: String*): EventTable = {
    require(keyCols.nonEmpty, "EventTable needs at least one key column")
    new EventTable(keyCols)
  }
}
