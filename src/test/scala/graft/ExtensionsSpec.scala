package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Native expressions surfaced as SQL functions via the Catalyst
  * function registry / SparkSessionExtensions.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot is callable from SQL after registration") {
    GraftExtensions.registerAll(spark.sessionState.functionRegistry)
    val r = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r == 11.0)
    // and from a dynamic plan through the control-plane dialect
    Seq((1L, Seq(1.0f, 1.0f))).toDF("id", "v").createOrReplaceTempView("vecs")
    val viaPlan = graft.control.PlanCompiler.compile(spark,
      "sql: SELECT array_dot(v, v) AS n2 FROM vecs").as[Double].head()
    assert(viaPlan == 2.0)
  }

  test("graft_simhash / graft_fingerprint registered and deterministic") {
    GraftExtensions.registerAll(spark.sessionState.functionRegistry)
    val (sh, fp) = spark.sql(
      "SELECT graft_simhash('hello world'), graft_fingerprint('hello world')")
      .as[(Long, Long)].head()
    assert(sh == graft.functions.Hashing.simHash("hello world"))
    val again = spark.sql("SELECT graft_fingerprint('hello world')")
      .as[Long].head()
    assert(fp == again)
  }

  test("graft_mix64 registered: SQL-side deterministic sampling predicate") {
    GraftExtensions.registerAll(spark.sessionState.functionRegistry)
    val got = spark.sql("SELECT graft_mix64(42L)").as[Long].head()
    assert(got == graft.functions.Hashing.mix64(42L))
    // the sampling predicate shape matches TextOps.stratifiedSample
    spark.range(1000).createOrReplaceTempView("mx_ids")
    val n = spark.sql(
      """SELECT count(*) FROM mx_ids
        |WHERE (shiftrightunsigned(graft_mix64(id), 12)) % 1000 < 100
        |""".stripMargin).as[Long].head()
    assert(math.abs(n - 100L) < 40, s"kept $n of 1000 at 10%")
  }

  test("graft_nearest_centroid registered: SQL-side assignment kernel") {
    GraftExtensions.registerAll(spark.sessionState.functionRegistry)
    val cid = spark.sql(
      """SELECT graft_nearest_centroid(array(1.0D, 0.0D),
        |  array(named_struct('cid', 5L, 'cv', array(10.0D, 10.0D)),
        |        named_struct('cid', 7L, 'cv', array(1.0D, 0.1D))))
        |""".stripMargin).as[Long].head()
    assert(cid == 7L)
    // exact tie → smaller cid
    val tie = spark.sql(
      """SELECT graft_nearest_centroid(array(0.0D),
        |  array(named_struct('cid', 9L, 'cv', array(2.0D)),
        |        named_struct('cid', 3L, 'cv', array(2.0D))))
        |""".stripMargin).as[Long].head()
    assert(tie == 3L)
  }

  test("GraftSqlParser: 'pattern:' statements compile to CEP plans, " +
      "plain SQL delegates untouched") {
    import graft.plans.GraftSqlParser
    val parser = new GraftSqlParser(spark.sessionState.sqlParser, spark)
    Seq((1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"))
      .toDF("id", "ts", "user", "typ")
      .createOrReplaceTempView("parser_ev")
    val plan = parser.parsePlan(
      """pattern:
        |from parser_ev
        |key user ; ts ts ; tie id
        |step a where typ = 'A'
        |step b where typ = 'B'""".stripMargin)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
      .select($"key", element_at($"binds", "a"), element_at($"binds", "b"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("1", 1L, 2L)))
    // delegation: ordinary SQL still parses through Spark's parser
    val n = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      parser.parsePlan("SELECT count(*) AS n FROM parser_ev"))
      .as[Long].head()
    assert(n == 2L)
  }

  test("SQL MATCH_RECOGNIZE: standard syntax compiles onto the custom " +
      "operator (pattern, quantifier, FIRST/LAST, WITHIN)") {
    import graft.plans.GraftSqlParser
    val parser = new GraftSqlParser(spark.sessionState.sqlParser, spark)
    Seq(
      (1L, 10L, 1L, "click", 0.5), (2L, 20L, 1L, "view", 0.1),
      (3L, 30L, 1L, "view", 0.2), (4L, 40L, 1L, "purchase", 0.9),
      (5L, 10L, 2L, "click", 0.3), (6L, 5000L, 2L, "purchase", 0.7))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .createOrReplaceTempView("mr_sql_ev")
    val plan = parser.parsePlan(
      """SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_us, event_id
        |  MEASURES a.event_id AS a_id, FIRST(b.event_id) AS b0_id,
        |           LAST(b.event_id) AS b1_id, c.event_id AS c_id,
        |           MATCH_END AS me
        |  PATTERN (a b+ c)
        |  WITHIN 1000
        |  DEFINE a AS event_type = 'click', b AS event_type = 'view',
        |         c AS event_type = 'purchase'
        |)""".stripMargin)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // user 1: click(1) view(2) view(3) purchase(4); b+ collects from the
    // FIRST qualifying view (skip-till-next-match), branching into
    // b=[2] and b=[2,3] — both complete on the purchase.
    // user 2: purchase outside WITHIN 1000 and no view — no match
    assert(got == Set(
      (1L, 1L, 2L, 2L, 4L, 40L),
      (1L, 1L, 2L, 3L, 4L, 40L)))
  }

  test("SQL MATCH_RECOGNIZE scanner robustness: underscore identifiers, " +
      "split keywords, literals stay intact") {
    import graft.plans.GraftSqlParser
    val parser = new GraftSqlParser(spark.sessionState.sqlParser, spark)
    // a PARTITION BY column containing the keyword 'pattern', a newline
    // inside 'PARTITION BY', and a literal measure containing both a
    // var.col-shaped substring and the phrase 'after match'
    Seq((1L, 1L, "A", 10L), (1L, 2L, "B", 20L))
      .toDF("pattern_id", "event_id", "typ", "ts_us")
      .createOrReplaceTempView("mr_rob_ev")
    val plan = parser.parsePlan(
      """SELECT * FROM mr_rob_ev MATCH_RECOGNIZE (
        |  PARTITION
        |      BY pattern_id
        |  ORDER BY ts_us, event_id
        |  MEASURES a.typ AS a_t, 'b.typ after match' AS lit
        |  PATTERN (a b)
        |  DEFINE a AS typ = 'A', b AS typ = 'B'
        |)""".stripMargin)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "A", "b.typ after match")))
  }

  test("SQL MATCH_RECOGNIZE aggregate measures: COUNT(v.*), SUM, AVG " +
      "over the variable's bound events") {
    import graft.plans.GraftSqlParser
    val parser = new GraftSqlParser(spark.sessionState.sqlParser, spark)
    Seq((1L, 10L, 1L, "A", 1.0), (2L, 20L, 1L, "B", 2.0),
      (3L, 30L, 1L, "B", 4.0), (4L, 40L, 1L, "C", 0.0))
      .toDF("event_id", "ts_us", "user_id", "typ", "v")
      .createOrReplaceTempView("mr_agg_ev")
    val plan = parser.parsePlan(
      """SELECT * FROM mr_agg_ev MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_us, event_id
        |  MEASURES count(b.*) AS nb, sum(b.v) AS sb, avg(b.v) AS ab
        |  PATTERN (a b{2,2} c)
        |  DEFINE a AS typ = 'A', b AS typ = 'B', c AS typ = 'C'
        |)""".stripMargin)
    val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
      .as[(Long, Int, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 2, 6.0, 3.0)))
  }

  test("SQL MATCH_RECOGNIZE fails fast on unsupported constructs") {
    import graft.plans.GraftSqlParser
    val parser = new GraftSqlParser(spark.sessionState.sqlParser, spark)
    def bad(stmt: String): Unit =
      assertThrows[IllegalArgumentException](parser.parsePlan(stmt))
    // stray token in PATTERN (top-level alternation `a | b` is
    // SUPPORTED since the recursive pattern parser — MatchRecognizeSpec)
    bad("""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x PATTERN (a !)
          | DEFINE a AS true, b AS true)""".stripMargin)
    // inverted {m,n} quantifier bounds
    bad("""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x PATTERN (a{3,2} b)
          | DEFINE a AS true, b AS true)""".stripMargin)
    // cross-variable DEFINE reference to a column not in the table
    // (var.col itself IS supported now — MatchRecognizeSpec)
    bad("""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x PATTERN (a b)
          | DEFINE a AS true, b AS value > a.zz_missing)""".stripMargin)
    // missing DEFINE for a pattern variable
    bad("""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x PATTERN (a b)
          | DEFINE a AS true)""".stripMargin)
    // a SKIP TO naming a variable not in the PATTERN is rejected even
    // split across lines (SKIP TO FIRST/LAST <var> itself is supported)
    bad("""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x
          | AFTER
          |   MATCH SKIP TO FIRST zz
          | PATTERN (a) DEFINE a AS true)""".stripMargin)
    // ALL ROWS PER MATCH is supported (see MatchRecognizeSpec); naming
    // BOTH row modes at once stays rejected
    bad("""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x
          | ONE ROW PER MATCH
          | ALL ROWS PER MATCH
          | PATTERN (a) DEFINE a AS true)""".stripMargin)
    // arbitrary nesting depth is supported now (recursive Rx element,
    // MatchRecognizeSpec), and composite PERMUTE up to 16 members
    // (round 17's members-seen bitmask automaton lifted the k!
    // expansion's 5-member cap); 17+ members stay rejected (the
    // bitmask explores up to C(k, k/2) interleaving classes per seed)
    bad(s"""SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
          | PARTITION BY user_id ORDER BY ts_us
          | MEASURES a.event_id AS x
          | PATTERN (PERMUTE(${Seq.fill(17)("(a b)").mkString(", ")}))
          | DEFINE a AS true, b AS true)""".stripMargin)
    // interval syntax in WITHIN gets the contextual error
    val err = intercept[IllegalArgumentException](parser.parsePlan(
      """SELECT * FROM mr_sql_ev MATCH_RECOGNIZE (
        | PARTITION BY user_id ORDER BY ts_us
        | MEASURES a.event_id AS x PATTERN (a)
        | WITHIN INTERVAL '10' MINUTE
        | DEFINE a AS true)""".stripMargin))
    assert(err.getMessage.contains("ORDER BY units"))
  }

  test("graft_minhash registered; rejects non-literal shape args") {
    GraftExtensions.registerAll(spark.sessionState.functionRegistry)
    val sig = spark.sql("SELECT graft_minhash('hello world', 5, 16)")
      .as[Seq[Long]].head()
    assert(sig == graft.functions.Hashing.minHashSignature(
      graft.functions.Hashing.shingleHashes("hello world", 5), 16).toSeq)
    val err = intercept[Exception](
      spark.sql("SELECT graft_minhash('x', 5, 8 + 8)").collect())
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
