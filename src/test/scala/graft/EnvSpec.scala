package graft

import org.apache.spark.sql.functions._
import graft.out.Returns

class EnvSpec extends SparkSpec {
  import spark.implicits._

  private def freshEnv(): GraftCEP = {
    val env = GraftCEP(spark)
    env.registerStream("ev", Tables.load(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_raw"))
    env
  }

  test("driver entry smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("Returns.as gives a typed Dataset (A9 POJO path)") {
    import spark.implicits._
    case class Out(id: Long, name: String)
    val ds = graft.out.Returns.as[(Long, String)](
      Seq((1L, "x")).toDF("_1", "_2"))
    assert(ds.collect().toSeq == Seq((1L, "x")))
  }

  test("duplicate stream registration throws") {
    val env = freshEnv()
    intercept[DuplicatedStreamException] {
      env.registerStream("ev", spark.range(1).toDF())
    }
  }

  test("querying an unregistered stream throws") {
    intercept[UndefinedStreamException] { freshEnv().from("nope") }
  }

  test("field-name binding selects named fields, rejects unknown (A1/A4)") {
    val env = GraftCEP(spark)
    val df = Seq((1L, "x", 2.0)).toDF("id", "name", "v")
    env.registerStream("named", df, "id", "v")
    assert(env.getStream("named").columns.toSeq == Seq("id", "v"))
    intercept[UndefinedFieldException] {
      env.registerStream("bad", df, "id", "nope")
    }
  }

  test("fluent filter/select/insertInto pipeline (B1-B5)") {
    val env = freshEnv()
    val out = env.from("ev")
      .where($"event_type" === "click" && $"value" > 0.5)
      .select($"event_id", $"user_id", $"value")
      .insertInto("clicks_hi")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "value"))
    assert(out.count() > 0)
    // output stream is itself registered and queryable
    assert(env.from("clicks_hi").toDF.count() == out.count())
  }

  test("groupBy + having (B13/B15) matches direct DataFrame result") {
    val env = freshEnv()
    val viaDsl = env.from("ev")
      .groupBy($"user_id")
      .agg(avg($"value").as("v"), count(lit(1)).as("n"))
      .having($"v" > 0.5)
      .toDF.collect().toSet
    val direct = Tables.load(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(avg($"value").as("v"), count(lit(1)).as("n"))
      .filter($"v" > 0.5).collect().toSet
    assert(viaDsl == direct)
  }

  test("routedUnion tags rows with their source stream (A2/A3)") {
    val env = GraftCEP(spark)
    env.registerStream("s1", Seq((1, "a")).toDF("id", "x"))
    env.registerStream("s2", Seq((2, "b"), (3, "c")).toDF("id", "x"))
    val u = env.routedUnion("s1", "s2").toDF
    assert(u.count() == 3)
    assert(u.filter($"_stream_id" === "s2").count() == 2)
  }

  test("multiple queries into one output stream union (B5/B24)") {
    val env = freshEnv()
    val n1 = env.from("ev").where($"event_type" === "click")
      .select($"event_id").insertInto("merged_out").count()
    val n2 = env.from("ev").where($"event_type" === "view")
      .select($"event_id").insertInto("merged_out").count()
    // second insert returns the UNION of both queries' results
    assert(n2 == n1 + env.getStream("ev")
      .filter($"event_type" === "view").count())
    assert(env.from("merged_out").toDF.count() == n2)
  }

  test("insertInto refuses a registered INPUT stream id (no silent " +
      "feedback union into a source view)") {
    val env = freshEnv()
    assertThrows[DuplicatedStreamException](
      env.from("ev").where($"event_type" === "click")
        .select($"event_id").insertInto("ev"))
  }

  test("env.plan compiles SQL and pattern dialects (.cql parity)") {
    import spark.implicits._
    val env = GraftCEP(spark)
    env.registerStream("pe",
      Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B")).toDF("id", "ts", "u", "t"))
    assert(env.plan("SELECT count(*) AS n FROM pe").as[Long].head() == 2L)
    val m = env.plan(
      "pattern:\nfrom pe\nkey u ; ts ts ; tie id\n" +
        "step a where t = 'A'\nstep b where t = 'B'")
      .selectExpr("binds['a'] AS a", "binds['b'] AS b")
      .as[(Long, Long)].collect().toSeq
    assert(m == Seq((1L, 2L)))
  }

  test("registered UDF extension is callable from SQL (B23)") {
    val env = freshEnv()
    env.registerFunction("custom_plus", udf((a: Double, b: Double) => a + b))
    val r = spark.sql("SELECT custom_plus(1.5, 2.5) AS s").as[Double].head()
    assert(r == 4.0)
  }

  test("Returns.asMap produces a map column per row (A9)") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val m = Returns.asMap(df).as[Map[String, String]].head()
    assert(m == Map("id" -> "1", "name" -> "x"))
  }

  test("Returns.tagged unions multiple outputs with stream ids (B25)") {
    val a = Seq((1L, 2.0)).toDF("id", "v")
    val b = Seq(("z", 9L)).toDF("s", "k")
    val t = Returns.tagged("outA" -> a, "outB" -> b)
    assert(t.columns.toSeq == Seq("_out_stream", "value"))
    assert(t.count() == 2)
    val streams = t.select("_out_stream").as[String].collect().toSet
    assert(streams == Set("outA", "outB"))
  }
}
