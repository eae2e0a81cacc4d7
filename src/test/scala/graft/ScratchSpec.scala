package graft
class ScratchSpec extends SparkSpec {
  import spark.implicits._
  test("scratch") {
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "X"), (3L, 30L, 1L, "B"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
      .createOrReplaceTempView("mr_scratch_view")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    for (am <- Seq("", "AFTER MATCH SKIP TO NEXT ROW")) {
      val rows = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, parser.parsePlan(
        s"""SELECT * FROM mr_scratch_view MATCH_RECOGNIZE (
           |  PARTITION BY user_id
           |  ORDER BY ts_us, event_id
           |  MEASURES FIRST(a.ts_us) AS s_ts, count(a.event_id) AS n_a, count(b.event_id) AS n_b
           |  $am
           |  PATTERN (a+ b)
           |  DEFINE a AS event_type IN ('A', 'X'), b AS event_type IN ('X', 'B')
           |)""".stripMargin))
        .select($"s_ts", $"n_a", $"n_b")
        .as[(Long, Long, Long)].collect().toSet
      println(s"AM='$am' -> $rows")
    }
  }
}
