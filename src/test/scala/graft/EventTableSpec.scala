package graft

import org.apache.spark.sql.functions._
import graft.operators.EventTable

class EventTableSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces same-key rows, last writer wins") {
    val t = EventTable("k")
    t.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq(col("v")))
    t.upsert(Seq((1L, "a2")).toDF("k", "v"), Seq(col("v")))
    val got = t.toDF.as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b")))
  }

  test("duplicate keys within one upsert collapse to the winner") {
    val t = EventTable("k")
    t.upsert(Seq((1L, 3, "mid"), (1L, 7, "new"), (1L, 1, "old"))
      .toDF("k", "ver", "v"), Seq(col("ver")))
    assert(t.toDF.select("v").as[String].collect().toSeq == Seq("new"))
  }

  test("delete keeps rows where the predicate is NULL (SQL semantics)") {
    val t = EventTable("k")
    t.upsert(Seq((1L, Some("a")), (2L, None: Option[String]))
      .toDF("k", "v"), Seq(col("v")))
    t.delete($"v" === "a")
    // key 2's v is NULL: (v = 'a') is NULL there, and NULL-predicate
    // rows must survive a DELETE-WHERE
    assert(t.toDF.select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("batch MatchRecognize rejects a streaming frame (fresh NFA per " +
      "micro-batch would silently drop cross-batch matches)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val sdf = input.toDF().toDF("event_id", "ts_us", "user_id", "event_type")
    assertThrows[IllegalArgumentException](
      graft.plans.MatchRecognize(sdf, Seq("user_id"), "ts_us", "event_id",
        Seq(graft.plans.MatchRecognize.EStep("a", $"event_type" === "A"))))
  }

  test("delete removes the CURRENT row without resurfacing older ones") {
    val t = EventTable("k")
    t.upsert(Seq((1L, "old")).toDF("k", "v"), Seq(col("v")))
    t.upsert(Seq((1L, "new")).toDF("k", "v"), Seq(col("v")))
    t.delete($"v" === "new")
    assert(t.toDF.count() == 0) // the superseded "old" row must NOT return
  }

  test("streaming sink maintains the table per micro-batch " +
      "(update-or-insert-into)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val t = EventTable("k")
    val q = t.sink(input.toDF().toDF("k", "v"), Seq(col("v"))).start()
    try {
      input.addData(Seq((1L, "a"), (2L, "b")))
      q.processAllAvailable()
      input.addData(Seq((1L, "a2")))
      q.processAllAvailable()
      val got = t.toDF.as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a2"), (2L, "b")))
    } finally q.stop()
  }

  test("streaming sink rejects a batch over maxBatchRows instead of " +
      "materializing it on the driver") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.StreamingQueryException
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val t = EventTable("k")
    val q = t.sink(input.toDF().toDF("k", "v"), Seq(col("v")),
      maxBatchRows = 5).start()
    try {
      input.addData((1L to 10L).map(k => (k, s"v$k")))
      val ex = intercept[StreamingQueryException](q.processAllAvailable())
      def msgs(e: Throwable): Seq[String] =
        if (e == null) Nil
        else String.valueOf(e.getMessage) +: msgs(e.getCause)
      assert(msgs(ex).exists(_.contains("maxBatchRows")))
    } finally q.stop()
  }

  test("model check: random upsert/delete sequences match a driver-side " +
      "map (8 seeds)") {
    for (seed <- 0 until 8) {
      val r = new scala.util.Random(seed)
      val t = EventTable("k")
      val model = scala.collection.mutable.Map.empty[Long, Long]
      // seed with one batch so delete-before-first-upsert can't throw
      val init = (1L to 5L).map(k => (k, r.nextLong(100)))
      t.upsert(init.toDF("k", "ver"), Seq(col("ver")))
      init.foreach { case (k, v) => model(k) = v }
      for (_ <- 0 until 12) {
        if (r.nextInt(4) > 0) {
          // upsert a random batch (keys 1..8, random versions; per-key
          // winner inside the batch = max version)
          val batch = (0 until (1 + r.nextInt(6)))
            .map(_ => (1L + r.nextInt(8), r.nextLong(100)))
          t.upsert(batch.toDF("k", "ver"), Seq(col("ver")))
          batch.groupBy(_._1).foreach { case (k, rows) =>
            model(k) = rows.map(_._2).max
          }
        } else {
          // delete a random version threshold
          val cut = r.nextLong(100)
          t.delete(col("ver") < cut)
          model.filterInPlace { case (_, v) => v >= cut }
        }
      }
      val got = t.toDF.as[(Long, Long)].collect().toMap
      assert(got == model.toMap, s"seed=$seed diverged")
    }
  }

  test("compacted snapshot joins as a broadcast dimension") {
    val t = EventTable("k")
    t.upsert(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price"), Seq(col("price")))
    t.compact()
    val stream = Seq((100L, 1L), (101L, 1L), (102L, 2L)).toDF("ev", "k")
    val joined = stream.join(broadcast(t.toDF), "k")
    assert(joined.count() == 3)
    assert(joined.filter($"k" === 1L).select("price")
      .as[Double].collect().forall(_ == 10.0))
  }
}
