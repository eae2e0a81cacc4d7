package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulWindows

case class WEvt(id: Long, user: Long, v: Double)
case class WOut(user: Long, id: Long, sum: Double)
case class BOut(user: Long, n: Int, sum: Double)
case class TWEvt(id: Long, ts: Long, user: Long, v: Double)

class StatefulWindowsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    WEvt(1, 1, 1.0), WEvt(2, 1, 2.0), WEvt(3, 1, 3.0), WEvt(4, 1, 4.0),
    WEvt(5, 2, 10.0))

  test("streaming length window emits trailing-n sums per event (B6)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WEvt]
    val out = StatefulWindows.lengthWindow[WEvt, Long, Double, WOut](
      input.toDS(), _.user, 3, _.v) {
      (k, e, window) => WOut(k, e.id, window.sum)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("lw_out").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val got = spark.table("lw_out").as[WOut].collect()
        .map(o => o.id -> o.sum).toMap
      // user1: 1 | 1+2 | 1+2+3 | 2+3+4 ; user2: 10
      assert(got == Map(1L -> 1.0, 2L -> 3.0, 3L -> 6.0, 4L -> 9.0, 5L -> 10.0))
    } finally q.stop()
  }

  test("streaming lengthBatch emits one row per full batch of n (B8)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WEvt]
    val out = StatefulWindows.lengthBatch[WEvt, Long, BOut](
      input.toDS(), _.user, 2) {
      (k, batch) => BOut(k, batch.length, batch.map(_.v).sum)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("lb_out").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val got = spark.table("lb_out").as[BOut].collect().toSet
      // user1: (1,2) then (3,4); user2: incomplete batch held in state
      assert(got == Set(BOut(1, 2, 3.0), BOut(1, 2, 7.0)))
    } finally q.stop()
  }

  test("streaming sliding time window emits trailing-duration sums (B7)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TWEvt]
    val out = StatefulWindows.timeWindow[TWEvt, Long, WOut](
      input.toDS(), _.user, _.ts, windowTs = 10L) {
      (k, e, window) => WOut(k, e.id, window.map(_.v).sum)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("tw_out").start()
    try {
      input.addData(Seq(
        TWEvt(1, 100, 1, 1.0), TWEvt(2, 105, 1, 2.0)))
      q.processAllAvailable()
      input.addData(Seq( // state carries across micro-batches
        TWEvt(3, 112, 1, 4.0), TWEvt(4, 130, 1, 8.0)))
      q.processAllAvailable()
      val got = spark.table("tw_out").as[WOut].collect()
        .map(o => o.id -> o.sum).toMap
      // trailing 10: [1] | [1,2] | [2(105≥102),3] | [4] (others expired)
      assert(got == Map(1L -> 1.0, 2L -> 3.0, 3L -> 6.0, 4L -> 8.0))
    } finally q.stop()
  }

  test("streaming foreverAgg keeps running max per key (B14 tail)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WEvt]
    val out = StatefulWindows.foreverAgg[WEvt, Long, Double, WOut](
      input.toDS(), _.user, Double.MinValue)((acc, e) => math.max(acc, e.v)) {
      (k, e, acc) => WOut(k, e.id, acc)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fa_out").start()
    try {
      input.addData(Seq(WEvt(1, 1, 5.0), WEvt(2, 1, 3.0), WEvt(3, 1, 7.0)))
      q.processAllAvailable()
      input.addData(Seq(WEvt(4, 1, 6.0))) // across micro-batches
      q.processAllAvailable()
      val got = spark.table("fa_out").as[WOut].collect()
        .map(o => o.id -> o.sum).toMap
      assert(got == Map(1L -> 5.0, 2L -> 5.0, 3L -> 7.0, 4L -> 7.0))
    } finally q.stop()
  }

  test("streaming sort window retains the n smallest per key (B9)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WEvt]
    val out = StatefulWindows.sortWindow[WEvt, Long, WOut](
      input.toDS(), _.user, 2, Ordering.by((e: WEvt) => e.v)) {
      (k, e, best) => WOut(k, e.id, best.map(_.v).sum)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sw_out").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val got = spark.table("sw_out").as[WOut].collect()
        .map(o => o.id -> o.sum).toMap
      // user1 top-2 smallest after each event: {1}, {1,2}, {1,2}, {1,2}
      assert(got == Map(1L -> 1.0, 2L -> 3.0, 3L -> 3.0, 4L -> 3.0,
        5L -> 10.0))
    } finally q.stop()
  }

  test("streaming frequent window tracks top-n values per key (B9)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)] // (id, user, kind)
    val out = StatefulWindows.frequentWindow[(Long, Long, String), Long,
        String, (Long, Long, String, Long)](
      input.toDS(), _._2, _._3, 1) {
      (k, e, top) => (k, e._1, top.head._1, top.head._2)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fw_out").start()
    try {
      input.addData(Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "b"),
        (4L, 1L, "a"), (5L, 1L, "c")))
      q.processAllAvailable()
      val got = spark.table("fw_out")
        .as[(Long, Long, String, Long)].collect()
        .map(r => r._2 -> ((r._3, r._4))).toMap
      // after each event: a:1 | tie a/b -> a | b:2 | tie a/b 2:2 -> a | a
      assert(got == Map(1L -> (("a", 1L)), 2L -> (("a", 1L)),
        3L -> (("b", 2L)), 4L -> (("a", 2L)), 5L -> (("a", 2L))))
    } finally q.stop()
  }

  test("frequent window: incremental top-n == full recount (model check)") {
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(7)
    val kinds = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val evs = (1 to 240).map(i =>
      (i.toLong, (i % 2).toLong, kinds(r.nextInt(kinds.size))))
    val input = MemoryStream[(Long, Long, String)]
    val out = StatefulWindows.frequentWindow[(Long, Long, String), Long,
        String, (Long, Long, String)](
      input.toDS(), _._2, _._3, 3) {
      (k, e, top) =>
        (k, e._1, top.map(t => s"${t._1}:${t._2}").mkString(","))
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fw_model").start()
    try {
      evs.grouped(40).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("fw_model").as[(Long, Long, String)]
        .collect().map(r2 => r2._2 -> r2._3).toMap
      // reference: exact per-event recount over the full history
      val counts = collection.mutable.Map.empty[(Long, String), Long]
      val expected = evs.map { case (id, u, kind) =>
        counts((u, kind)) = counts.getOrElse((u, kind), 0L) + 1L
        val top = counts.collect { case ((`u`, v), c) => (v, c) }.toSeq
          .sortBy { case (v, c) => (-c, v) }.take(3)
        id -> top.map(t => s"${t._1}:${t._2}").mkString(",")
      }.toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("frequent window: maxDistinct triggers Space-Saving eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val out = StatefulWindows.frequentWindow[(Long, Long, String), Long,
        String, (Long, Long, String, Long)](
      input.toDS(), _._2, _._3, 1, maxDistinct = 2) {
      (k, e, top) => (k, e._1, top.head._1, top.head._2)
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fw_evict").start()
    try {
      input.addData(Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")))
      q.processAllAvailable()
      val got = spark.table("fw_evict")
        .as[(Long, Long, String, Long)].collect()
        .map(r => r._2 -> ((r._3, r._4))).toMap
      // c evicts the count-tie victim with the larger value (b) and
      // inherits its count + 1 — the Space-Saving overestimate
      assert(got(3L) == (("c", 2L)))
    } finally q.stop()
    assertThrows[IllegalArgumentException](
      StatefulWindows.frequentWindow[(Long, Long, String), Long,
          String, (Long, Long, String, Long)](
        input.toDS(), _._2, _._3, 3, maxDistinct = 3) {
        (k, e, top) => (k, e._1, top.head._1, top.head._2)
      })
  }
}
