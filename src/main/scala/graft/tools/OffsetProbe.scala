package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** One-off cost probe behind the SUBSET-union offset cap (DIALECT
  * exclusion 2): the gate is always true, so the match topology is
  * identical at every k and only the merged-offset selection
  * expression cost varies. BASELINE.md round 16 records the result.
  */
object OffsetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 2000000L
    val df = spark.range(n).select(
      F.col("id").as("event_id"),
      (F.col("id") * 7L).as("ts_us"),
      (F.col("id") / 100L).as("user_id"),
      F.element_at(F.array(F.lit("click"), F.lit("click"),
        F.lit("view"), F.lit("purchase")),
        (F.col("id") % 4L + 1L).cast("int")).as("event_type"),
      (F.col("id") % 97L).cast("double").as("value"))
    df.createOrReplaceTempView("probe_off")
    val parser = new graft.plans.GraftSqlParser(
      spark.sessionState.sqlParser, spark)
    def stmt(k: Int) =
      s"""SELECT * FROM probe_off MATCH_RECOGNIZE (
         |  PARTITION BY user_id
         |  ORDER BY ts_us, event_id
         |  MEASURES FIRST(a.event_id) AS a1_id, b.event_id AS b_id,
         |           c.event_id AS c_id
         |  PATTERN (a{2,2} b c)
         |  SUBSET s = (a, b)
         |  DEFINE a AS event_type = 'click',
         |         b AS event_type = 'view',
         |         c AS event_type = 'purchase'
         |           AND coalesce(FIRST(s.value, $k), -1) > -2
         |)""".stripMargin
    for (k <- Seq(1, 9, 19); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        parser.parsePlan(stmt(k)))
      out.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"k":$k,"rep":$rep,"sec":$dt%.2f}""")
    }
    spark.stop()
  }
}
