package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Emission

case class Ev(id: Long, user: Long)

/** B26 output rate limiting / snapshot and B28 triggers. */
class EmissionSpec extends SparkSpec {
  import spark.implicits._

  test("firstEveryN emits the first event of each count-batch per key") {
    val ds = (1L to 10L).map(i => Ev(i, 1L)).toDS()
    val got = Emission.firstEveryN[Ev, Long](ds, _.user, 3)
      .collect().map(_.id).sorted
    assert(got.toSeq == Seq(1L, 4L, 7L, 10L))
  }

  test("lastEveryN emits the last event of each count-batch per key") {
    val ds = (1L to 10L).map(i => Ev(i, 1L)).toDS()
    val got = Emission.lastEveryN[Ev, Long](ds, _.user, 3)
      .collect().map(_.id).sorted
    assert(got.toSeq == Seq(3L, 6L, 9L))
  }

  test("count-batch emission state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Emission.lastEveryN[Ev, Long](input.toDS(), _.user, 3)
      .writeStream.format("memory").queryName("emission_out")
      .outputMode("append").start()
    try {
      input.addData(Ev(1, 1), Ev(2, 1)) // counter at 2, nothing out
      q.processAllAvailable()
      input.addData(Ev(3, 1), Ev(4, 1)) // 3rd event crosses the batch line
      q.processAllAvailable()
      val got = spark.table("emission_out").as[Ev].collect().map(_.id).sorted
      assert(got.toSeq == Seq(3L))
    } finally q.stop()
  }

  test("snapshot writer emits the full aggregation state each tick (B26)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDF().groupBy($"user").count()
    val q = Emission.snapshot(agg, "1 second")
      .format("memory").queryName("snap_out").start()
    try {
      input.addData(Ev(1, 1), Ev(2, 1), Ev(3, 2))
      q.processAllAvailable()
      val got = spark.table("snap_out").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("triggerStream is a streaming tick source with one column (B28)") {
    val t = Emission.triggerStream(spark, 5, ticksPerSecond = 10)
    assert(t.isStreaming)
    assert(t.columns.toSeq == Seq("triggered_time"))
  }
}
