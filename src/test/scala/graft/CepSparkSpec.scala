package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.cep.{Absence, Cep, PatternDef, Step}

case class TEvt(id: Long, ts_ms: Long, user: Long, typ: String)
case class TOut(user: Long, a_id: Long, b_id: Long)

/** Batch and streaming CEP executors must agree (one-kernel parity). */
class CepSparkSpec extends SparkSpec {
  import spark.implicits._

  private val pat = PatternDef[TEvt](IndexedSeq(
    Step[TEvt]("a", _.typ == "A"),
    Step[TEvt]("b", _.typ == "B")),
    withinMs = Some(60000L))

  private val events = Seq(
    TEvt(1, 1000, 1, "A"), TEvt(2, 2000, 1, "C"), TEvt(3, 3000, 1, "B"),
    TEvt(4, 1500, 2, "A"), TEvt(5, 70000, 2, "B"), // outside within
    TEvt(6, 80000, 2, "A"), TEvt(7, 81000, 2, "B"),
    TEvt(8, 5000, 3, "B")) // B with no A

  private val expected = Set(TOut(1, 1, 3), TOut(2, 6, 7))

  test("batch executor matches hand-computed result") {
    val got = Cep.batchCollected[TEvt, Long, TOut](
      events.toDS(), _.user, pat, _.ts_ms, _.id) {
      (k, m) => Iterator.single(TOut(k, m.head("a").id, m.head("b").id))
    }.collect().toSet
    assert(got == expected)
  }

  test("sorted-group batch streams a 10^6-event hot key (bounded memory)") {
    import spark.implicits._
    val n = 1000000L
    // one single key: the skew worst case. flatMapSortedGroups must
    // stream the group from the shuffle — state stays O(live partials).
    val ds = spark.range(n).map { i =>
      TEvt(i, i * 10, 1L, if (i % 2 == 0) "A" else "B")
    }
    val hotPat = PatternDef[TEvt](IndexedSeq(
      Step[TEvt]("a", _.typ == "A"),
      Step[TEvt]("b", _.typ == "B")),
      withinMs = Some(100L))
    val got = Cep.batch[TEvt, Long, TOut](
      ds, _.user, hotPat, _.ts_ms, Seq(col("ts_ms"), col("id"))) {
      (k, m) => Iterator.single(TOut(k, m.head("a").id, m.head("b").id))
    }
    // alternating A,B: every A pairs with the immediately-next B
    assert(got.count() == n / 2)
  }

  test("streaming absence emits at the deadline via event-time timers") {
    implicit val sqlCtx = spark.sqlContext
    val absPat = PatternDef[TEvt](IndexedSeq(
      Step[TEvt]("a", _.typ == "A"),
      Absence(Step[TEvt]("nb", _.typ == "B"), forMs = 10000L)))
    val input = MemoryStream[TEvt]
    val withTs = input.toDS()
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withWatermark("ts", "2 seconds")
      .as[TEvt]
    val out = Cep.streaming[TEvt, Long, TOut](
      withTs, _.user, absPat, _.ts_ms, _.id) {
      (k, m) => Iterator.single(TOut(k, m.head("a").id, m.endTs))
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cep_abs")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cep_abs_ck").toString)
      .start()
    try {
      // user 1: A then no B — alert at 1000+10000; user 2: A then B
      // inside the window — suppressed
      input.addData(TEvt(1, 1000, 1, "A"), TEvt(2, 2000, 2, "A"),
        TEvt(3, 4000, 2, "B"))
      q.processAllAvailable()
      // watermark far past both deadlines; no further events on key 1 —
      // emission must come from the timer path
      input.addData(TEvt(99, 100000L, 99, "X"))
      q.processAllAvailable()
      input.addData(TEvt(98, 200000L, 98, "X")) // extra trigger for timers
      q.processAllAvailable()
      val got = spark.table("cep_abs").as[TOut].collect().toSet
      assert(got == Set(TOut(1, 1, 11000L)))
    } finally q.stop()
  }

  test("transformWithState executor: out-of-order release + absence " +
      "timer parity with flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs column families => RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val absPat = PatternDef[TEvt](IndexedSeq(
      Step[TEvt]("a", _.typ == "A"),
      Absence(Step[TEvt]("nb", _.typ == "B"), forMs = 10000L)))
    val input = MemoryStream[TEvt]
    val withTs = input.toDS()
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withWatermark("ts", "2 seconds")
      .as[TEvt]
    val out = Cep.streamingTws[TEvt, Long, TOut](
      withTs, _.user, absPat, _.ts_ms, _.id) {
      (k, m) => Iterator.single(TOut(k, m.head("a").id, m.endTs))
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cep_tws")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cep_tws_ck").toString)
      .start()
    try {
      // intra-batch disorder: the A arrives after an unrelated later
      // event; user 1's absence window must still fire via the TIMER
      // path (no further events on that key), user 2's B suppresses
      input.addData(TEvt(3, 4000, 2, "B"), TEvt(1, 1000, 1, "A"),
        TEvt(2, 2000, 2, "A"))
      q.processAllAvailable()
      input.addData(TEvt(99, 100000L, 99, "X"))
      q.processAllAvailable()
      input.addData(TEvt(98, 200000L, 98, "X"))
      q.processAllAvailable()
      val got = spark.table("cep_tws").as[TOut].collect().toSet
      assert(got == Set(TOut(1, 1, 11000L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming executor in a microsecond event-time domain (tsScale)") {
    implicit val sqlCtx = spark.sqlContext
    // the ts_ms field carries MICROSECONDS here; watermark stays in ms
    val usPat = PatternDef[TEvt](IndexedSeq(
      Step[TEvt]("a", _.typ == "A"),
      Step[TEvt]("b", _.typ == "B")),
      withinMs = Some(60000000L)) // 60 s in µs
    val input = MemoryStream[TEvt]
    val withTs = input.toDS()
      .withColumn("ts", timestamp_micros($"ts_ms"))
      .withWatermark("ts", "1 second")
      .as[TEvt]
    val out = Cep.streaming[TEvt, Long, TOut](
      withTs, _.user, usPat, _.ts_ms, _.id, tsScale = 1000L) {
      (k, m) => Iterator.single(TOut(k, m.head("a").id, m.head("b").id))
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cep_us")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cep_us_ck").toString)
      .start()
    try {
      input.addData(TEvt(1, 1000000L, 1, "A"), TEvt(2, 2000000L, 1, "B"))
      q.processAllAvailable()
      input.addData(TEvt(99, 10000000000L, 99, "X")) // watermark flush
      q.processAllAvailable()
      val got = spark.table("cep_us").as[TOut].collect().toSet
      assert(got == Set(TOut(1, 1, 2)))
    } finally q.stop()
  }

  test("streaming logical-or pattern agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    val orPat = PatternDef[TEvt](IndexedSeq(
      Step[TEvt]("s", _.typ == "A"),
      graft.cep.Logical.or(Step[TEvt]("b", _.typ == "B"),
        Step[TEvt]("c", _.typ == "C"))))
    val orEvents = Seq(
      TEvt(1, 1000, 1, "A"), TEvt(2, 2000, 1, "X"), TEvt(3, 3000, 1, "C"),
      TEvt(4, 1000, 2, "A"), TEvt(5, 2500, 2, "B"))
    def outOf(m: graft.cep.PatternMatch[TEvt], k: Long) = TOut(k,
      m.head("s").id, m.get("b").headOption.orElse(m.get("c").headOption).get.id)
    val expectedOr = Cep.batchCollected[TEvt, Long, TOut](
      orEvents.toDS(), _.user, orPat, _.ts_ms, _.id) {
      (k, m) => Iterator.single(outOf(m, k))
    }.collect().toSet
    assert(expectedOr == Set(TOut(1, 1, 3), TOut(2, 4, 5)))

    val input = MemoryStream[TEvt]
    val withTs = input.toDS()
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withWatermark("ts", "5 seconds")
      .as[TEvt]
    val out = Cep.streaming[TEvt, Long, TOut](
      withTs, _.user, orPat, _.ts_ms, _.id) {
      (k, m) => Iterator.single(outOf(m, k))
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cep_or")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cep_or_ck").toString)
      .start()
    try {
      input.addData(scala.util.Random.shuffle(orEvents))
      q.processAllAvailable()
      input.addData(TEvt(99, 10000000L, 99, "X"))
      q.processAllAvailable()
      assert(spark.table("cep_or").as[TOut].collect().toSet == expectedOr)
    } finally q.stop()
  }

  test("streaming executor agrees with batch (out-of-order input)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TEvt]
    val withTs = input.toDS()
      .withColumn("ts", timestamp_millis($"ts_ms"))
      .withWatermark("ts", "5 seconds")
      .as[TEvt]
    val out = Cep.streaming[TEvt, Long, TOut](
      withTs, _.user, pat, _.ts_ms, _.id) {
      (k, m) => Iterator.single(TOut(k, m.head("a").id, m.head("b").id))
    }
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cep_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cep_ck").toString)
      .start()
    try {
      // deliver out-of-order WITHIN the watermark delay (later-than-delay
      // data is late by definition and correctly dropped): chunk by time,
      // shuffle inside each chunk; then a far-future flush event
      val (early, lateChunk) = events.partition(_.ts_ms < 10000)
      input.addData(scala.util.Random.shuffle(early))
      q.processAllAvailable()
      input.addData(scala.util.Random.shuffle(lateChunk))
      q.processAllAvailable()
      input.addData(TEvt(99, 10000000L, 99, "X"))
      q.processAllAvailable()
      val got = spark.table("cep_out").as[TOut].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}
