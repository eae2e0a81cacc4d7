package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication for ingest pipelines: emit only the
  * FIRST-SEEN row per content fingerprint across the stream's lifetime
  * — the streaming counterpart of [[graft.operators.Dedup.exact]], for
  * the "same document arrives from many crawlers/hours apart" shape a
  * 100 TB ingest sees.
  *
  * State is one marker per distinct fingerprint, partitioned by the
  * fingerprint key — O(distinct content) total, spread across
  * executors, checkpointed with the query. Within a micro-batch the
  * winner among same-fingerprint rows is chosen by `order` (a total
  * order makes the emission deterministic under replay); across
  * micro-batches, stream arrival order decides — the first batch to
  * present a fingerprint wins, which is exactly the ingest contract.
  *
  * `ttl` bounds state for unbounded streams: a fingerprint idle longer
  * than the TTL is evicted (processing-time timeout), re-admitting
  * later copies — the standard bounded-memory trade: dedup exactness
  * within the TTL horizon, O(active fingerprints) state instead of
  * O(all time). Spark drops state on timeout only at a trigger, so
  * eviction granularity is the trigger interval.
  *
  * `history` seeds the state with a batch fingerprint store (e.g. the
  * accumulated [[graft.operators.Dedup.incrementalExact]] history) via
  * Structured Streaming's initial-state support — the stream then
  * continues the BATCH pipeline's dedup invariant instead of starting
  * blank: a document the batch corpus already holds is never re-emitted
  * by the stream. Applied only on the first run of a query; afterwards
  * the checkpoint owns the state.
  */
object StreamDedup {

  def firstSeen[E: Encoder, O: Ordering](
      ds: Dataset[E], fingerprint: E => Long, order: E => O,
      ttl: Option[java.time.Duration] = None,
      history: Option[Dataset[Long]] = None): Dataset[E] = {
    implicit val stateEnc: Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    implicit val keyEnc: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    val timeout = ttl.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout)
    val step = (_: Long, rows: Iterator[E], state: GroupState[Boolean]) =>
      if (state.hasTimedOut) {
        // eviction trigger: no rows to process, just drop the marker
        state.remove()
        Iterator.empty: Iterator[E]
      } else {
        val fresh = !state.exists
        state.update(true)
        ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
        if (fresh) Iterator.single(rows.minBy(order))
        else Iterator.empty
      }
    val grouped = ds.groupByKey(fingerprint)
    history match {
      case Some(h) =>
        val init = h.groupByKey(identity).mapValues(_ => true)
        grouped.flatMapGroupsWithState(OutputMode.Append(), timeout,
          init)(step)
      case None =>
        grouped.flatMapGroupsWithState(OutputMode.Append(), timeout)(step)
    }
  }
}
