package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.control._

class ControlPlaneSpec extends SparkSpec {

  test("JSON codec round-trips every control event type (A15)") {
    val evs: Seq[ControlEvent] = Seq(
      AddPlan("p1", "SELECT 1 AS x"),
      UpdatePlan("p1", "SELECT 2 AS x"),
      RemovePlan("p1"), EnablePlan("p1"), DisablePlan("p1"))
    evs.foreach { e =>
      assert(ControlEvent.fromJson(ControlEvent.toJson(e)) == Right(e))
    }
    assert(ControlEvent.fromJson("""{"type":"nope"}""").isLeft)
    assert(ControlEvent.fromJson("not even json").isLeft)
    // plan text with quotes/newlines survives
    val tricky = AddPlan("p2", "SELECT \"a\" AS x,\n 1 AS y")
    assert(ControlEvent.fromJson(ControlEvent.toJson(tricky)) == Right(tricky))
  }

  test("plan lifecycle: add/disable/enable/update/remove (§2.C)") {
    spark.readStream.format("rate").option("rowsPerSecond", "5").load()
      .createOrReplaceTempView("rate_view")

    val cp = new ControlPlane(spark,
      (id: String, df: DataFrame) => Some[StreamingQuery](
        df.writeStream.format("memory")
          .queryName(s"cp_$id").outputMode("append").start()))
    try {
      cp.handle(AddPlan("p1", "SELECT value * 2 AS v FROM rate_view"))
      assert(cp.planIds == Seq("p1") && cp.isEnabled("p1"))
      assert(cp.runningQuery("p1").exists(_.isActive))
      intercept[IllegalArgumentException] {
        cp.handle(AddPlan("p1", "SELECT 1"))
      }

      cp.handle(DisablePlan("p1"))
      assert(!cp.isEnabled("p1") && cp.runningQuery("p1").isEmpty)
      cp.handle(DisablePlan("p1")) // idempotent

      cp.handle(EnablePlan("p1"))
      assert(cp.isEnabled("p1") && cp.runningQuery("p1").exists(_.isActive))

      val before = cp.runningQuery("p1").get.id
      cp.handle(UpdatePlan("p1", "SELECT value * 3 AS v FROM rate_view"))
      assert(cp.runningQuery("p1").exists(q => q.isActive && q.id != before))

      cp.handle(RemovePlan("p1"))
      assert(cp.planIds.isEmpty)
      intercept[NoSuchElementException] {
        cp.handle(UpdatePlan("p1", "SELECT 1"))
      }
    } finally cp.shutdown()
  }
}
