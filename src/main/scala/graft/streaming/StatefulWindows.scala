package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming variants of the count-based / unbounded Siddhi windows that
  * have no Structured Streaming primitive (SURVEY B6/B8 count flavor,
  * B14 maxForever/minForever): per-key keyed state via
  * flatMapGroupsWithState, one emitted row per input event — matching
  * Siddhi's per-event window output.
  *
  * State per key is O(n) for lengthWindow (the last n events) and O(1)
  * for foreverAgg — both bounded, 100 TB-safe under key distribution.
  */
object StatefulWindows {

  /** `#window.length(n)` streaming: per event, aggregate over the
    * trailing n events of its key (processing order within the key).
    * @param agg fold over the current window contents
    */
  def lengthWindow[E, K: Encoder, V, O: Encoder](
      ds: Dataset[E], key: E => K, n: Int,
      value: E => V)(
      emit: (K, E, Seq[V]) => O): Dataset[O] = {
    implicit val stateEnc: Encoder[List[V]] = Encoders.kryo[List[V]]
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: K, it: Iterator[E], state: GroupState[List[V]]) =>
        var window = state.getOption.getOrElse(Nil) // newest first
        val out = it.map { e =>
          window = (value(e) :: window).take(n)
          emit(k, e, window.reverse)
        }.toList
        state.update(window)
        out.iterator
    }
  }

  /** `#window.lengthBatch(n)` streaming: emits one aggregate row per
    * completed batch of n events per key.
    */
  def lengthBatch[E, K: Encoder, O: Encoder](
      ds: Dataset[E], key: E => K, n: Int)(
      emit: (K, Seq[E]) => O): Dataset[O] = {
    implicit val stateEnc: Encoder[List[E]] = Encoders.kryo[List[E]]
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: K, it: Iterator[E], state: GroupState[List[E]]) =>
        var pending = state.getOption.getOrElse(Nil) // newest first
        var count = pending.length // counted once per micro-batch, then O(1)
        val emitted = List.newBuilder[O]
        it.foreach { e =>
          pending = e :: pending
          count += 1
          if (count == n) {
            emitted += emit(k, pending.reverse)
            pending = Nil
            count = 0
          }
        }
        state.update(pending)
        emitted.result().iterator
    }
  }

  /** `#window.time(d)` streaming: per event, aggregate over the key's
    * trailing `windowTs` event-time units. The buffer self-prunes on
    * every event, so state per key is O(events inside the window), and
    * eviction needs no timers (Siddhi's sliding time window emits on
    * arrival; the trailing scope is defined by the arriving event's own
    * timestamp).
    */
  def timeWindow[E, K: Encoder, O: Encoder](
      ds: Dataset[E], key: E => K, ts: E => Long, windowTs: Long)(
      emit: (K, E, Seq[E]) => O): Dataset[O] = {
    implicit val stateEnc: Encoder[List[E]] = Encoders.kryo[List[E]]
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: K, it: Iterator[E], state: GroupState[List[E]]) =>
        var window = state.getOption.getOrElse(Nil) // newest first
        val out = it.map { e =>
          val t = ts(e)
          window = e :: window.filter(x => t - ts(x) <= windowTs)
          emit(k, e, window.reverse)
        }.toList
        state.update(window)
        out.iterator
    }
  }

  /** `#window.sort(n, attr)` streaming: keeps the key's n best events
    * (by `ord`) seen so far; per input event emits the CURRENT sorted
    * top-n — Siddhi's sort window retains the n "smallest" and expires
    * the rest. State per key is O(n).
    */
  def sortWindow[E, K: Encoder, O: Encoder](
      ds: Dataset[E], key: E => K, n: Int, ord: Ordering[E])(
      emit: (K, E, Seq[E]) => O): Dataset[O] = {
    implicit val stateEnc: Encoder[List[E]] = Encoders.kryo[List[E]]
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: K, it: Iterator[E], state: GroupState[List[E]]) =>
        var best = state.getOption.getOrElse(Nil) // sorted ascending by ord
        val out = it.map { e =>
          // insertion into a size-n sorted list — O(n) per event
          val (lt, ge) = best.span(x => ord.lt(x, e))
          best = (lt ::: e :: ge).take(n)
          emit(k, e, best)
        }.toList
        state.update(best)
        out.iterator
    }
  }

  /** `#window.frequent(n)` streaming: per event, the key's n most
    * frequent values of `attr` so far (count desc, value asc tie-break).
    *
    * Scale: the top-n list is maintained INCREMENTALLY — counts only
    * rise, so each event can change the exact top-n only at its own
    * value; per-event cost is O(n log n), never a re-sort of the whole
    * value→count map. State per key is that map, hard-bounded by
    * `maxDistinct` via Space-Saving eviction (the least-frequent entry
    * is dropped and its count inherited by the newcomer) — beyond the
    * cap, counts become the standard Space-Saving overestimates; below
    * it they are exact (the batch [[graft.operators.Windows.frequent]]
    * is always exact).
    */
  def frequentWindow[E, K: Encoder, A, O: Encoder](
      ds: Dataset[E], key: E => K, attr: E => A, n: Int,
      maxDistinct: Int = 4096)(
      emit: (K, E, Seq[(A, Long)]) => O)(
      implicit ordA: Ordering[A]): Dataset[O] = {
    require(maxDistinct > n, s"maxDistinct ($maxDistinct) must exceed n ($n)")
    type St = (Map[A, Long], List[(A, Long)])
    implicit val stateEnc: Encoder[St] = Encoders.kryo[St]
    // emission order: count desc, value asc
    val topOrd: Ordering[(A, Long)] =
      Ordering.by[(A, Long), (Long, A)] { case (v, c) => (-c, v) }(
        Ordering.Tuple2(Ordering.Long, ordA))
    // eviction victim: count asc, value desc — the exact inverse, so
    // with distinct values the victim is never inside the top-n
    val victimOrd: Ordering[(A, Long)] =
      Ordering.by[(A, Long), (Long, A)] { case (v, c) => (c, v) }(
        Ordering.Tuple2(Ordering.Long, ordA.reverse))
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: K, it: Iterator[E], state: GroupState[St]) =>
        var (counts, top) = state.getOption
          .getOrElse((Map.empty[A, Long], List.empty[(A, Long)]))
        val out = it.map { e =>
          val a = attr(e)
          val prev = counts.get(a)
          if (prev.isEmpty && counts.size >= maxDistinct) {
            val (vMin, cMin) = counts.min(victimOrd)
            counts = counts - vMin + (a -> (cMin + 1L))
          } else counts = counts.updated(a, prev.getOrElse(0L) + 1L)
          // the updated value is the only possible change to the top-n
          // (all other counts are unchanged and the threshold is
          // monotone): re-rank it against the current list
          top = ((a, counts(a)) :: top.filterNot(_._1 == a))
            .sorted(topOrd).take(n)
          emit(k, e, top)
        }.toList
        state.update((counts, top))
        out.iterator
    }
  }

  /** Kryo can't encode bare primitives as state — box the accumulator. */
  final case class Box[B](value: B)

  /** maxForever/minForever streaming: running fold over the key's whole
    * history, one output per event. O(1) state.
    */
  def foreverAgg[E, K: Encoder, B, O: Encoder](
      ds: Dataset[E], key: E => K, zero: B)(
      fold: (B, E) => B)(
      emit: (K, E, B) => O): Dataset[O] = {
    implicit val stateEnc: Encoder[Box[B]] = Encoders.kryo[Box[B]]
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: K, it: Iterator[E], state: GroupState[Box[B]]) =>
        var acc = state.getOption.map(_.value).getOrElse(zero)
        val out = it.map { e => acc = fold(acc, e); emit(k, e, acc) }.toList
        state.update(Box(acc))
        out.iterator
    }
  }
}
