package graft

import org.apache.spark.sql.functions._
import graft.operators.Validate
import graft.operators.Validate._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("check: exact violation counts per constraint kind") {
    val df = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "en", 10L),
      (2L, "de", 600L),   // out of range
      (3L, null, 20L),    // null lang: not_null + matches violations
      (3L, "fr", null),   // dup id + null n_chars (range violation)
      (5L, "EN", 30L))    // pattern violation (uppercase)
      .toDF("id", "lang", "n")
    val got = Validate.check(df, Seq(
        NotNull("lang"),
        InRange("n", 1L, 500L),
        Matches("lang", "^[a-z]{2}$"),
        Satisfies("n_under_1k", "n < 1000"),
        Unique("id")))
      .as[(String, String, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("not_null", "lang")) ==
      (("not_null", "lang", 5L, 1L, 0)))
    assert(got(("in_range[1,500]", "n")) ==
      (("in_range[1,500]", "n", 5L, 2L, 0))) // 600 + null
    assert(got(("matches[^[a-z]{2}$]", "lang")) ==
      (("matches[^[a-z]{2}$]", "lang", 5L, 2L, 0))) // null + "EN"
    // null predicate result (n IS NULL) counts as a violation
    assert(got(("satisfies[n_under_1k]", "*")) ==
      (("satisfies[n_under_1k]", "*", 5L, 1L, 0)))
    assert(got(("unique", "id")) ==
      (("unique", "id", 5L, 2L, 0))) // both rows of the dup group
  }

  test("check: referential integrity counts unmatched non-null keys") {
    val fact = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (9L, "c"), (9L, "d"), (null, "e"))
      .toDF("fk", "v")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val got = Validate.check(fact, Seq(RefIntegrity("fk", dim, "pk")))
      .as[(String, String, Long, Long, Int)].head()
    // both fk=9 rows violate; the null fk does not (NotNull's job)
    assert(got == (("ref_integrity[pk]", "fk", 5L, 2L, 0)))
    val ok = Validate.check(fact.filter(col("fk") < 3),
        Seq(RefIntegrity("fk", dim, "pk")))
      .as[(String, String, Long, Long, Int)].head()
    assert(ok == (("ref_integrity[pk]", "fk", 2L, 0L, 1)))
  }

  test("check: dataset-level metric expectations pass and fail") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "n")
    val got = Validate.check(df, Seq(
        AggSatisfies("avg_band", "avg(n)", "_metric BETWEEN 15 AND 25"),
        AggSatisfies("max_cap", "max(n)", "_metric <= 25"),
        AggSatisfies("null_metric", "max(CASE WHEN n > 99 THEN n END)",
          "_metric > 0")))
      .as[(String, String, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("agg[avg_band]") == (("agg[avg_band]", "*", 3L, 0L, 1)))
    assert(got("agg[max_cap]") == (("agg[max_cap]", "*", 3L, 1L, 0)))
    // a NULL metric can never satisfy its predicate
    assert(got("agg[null_metric]") ==
      (("agg[null_metric]", "*", 3L, 1L, 0)))
  }

  test("profile rejects non-integral columns instead of truncating") {
    val df = Seq((1L, 1.5)).toDF("k", "d")
    val e = intercept[IllegalArgumentException] {
      Validate.profile(df, Seq("k", "d"))
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("profile: exact per-column stats including null-only columns") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (2L, null), (2L, null))
      .toDF("a", "b")
    val got = Validate.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(got("a") ==
      (("a", 3L, 0L, 2L, Some(1L), Some(2L), Some(5L))))
    assert(got("b") == (("b", 3L, 3L, 0L, None, None, None)))
  }

  test("profile approxDistinct: same shape, HLL-approximate counts") {
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("k", "v")
    val exact = Validate.profile(df, Seq("k", "v"))
      .orderBy("column").collect()
    val approx = Validate.profile(df, Seq("k", "v"),
      approxDistinct = true).orderBy("column").collect()
    assert(approx.map(_.getString(0)).toSeq == Seq("k", "v"))
    // identical schema and non-distinct stats; distinct within HLL error
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      assert(e.getLong(4) == a.getLong(4) && e.getLong(5) == a.getLong(5))
      val (ed, ad) = (e.getLong(3), a.getLong(3))
      assert(math.abs(ed - ad) <= math.max(2L, (ed * 0.05).toLong),
        s"approx distinct $ad too far from exact $ed")
    }
  }

  test("suggest: profile-derived constraints pass on the profiled data") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 5L), (2L, 5L), (3L, null))
      .toDF("k", "v")
    val sug = Validate.suggest(Validate.profile(df, Seq("k", "v")))
    // k: no nulls + all distinct + range; v: has nulls, dup values
    assert(sug.contains(NotNull("k")) && sug.contains(Unique("k")))
    assert(sug.contains(InRange("k", 1L, 3L)))
    assert(!sug.contains(NotNull("v")) && !sug.contains(Unique("v")))
    // nullable columns get NO range suggestion — InRange counts nulls
    // as violations and would fail on the very data that suggested it
    assert(!sug.exists { case InRange("v", _, _) => true; case _ => false })
    // the suggested suite is all-green on the data that produced it
    val verdicts = Validate.check(df, sug)
      .select(col("pass")).as[Int].collect()
    assert(verdicts.nonEmpty && verdicts.forall(_ == 1))
    // and catches a drifted future batch
    val drifted = Seq[(java.lang.Long, java.lang.Long)]((9L, 99L))
      .toDF("k", "v")
    val bad = Validate.check(drifted, sug)
      .filter(col("pass") === 0).count()
    assert(bad >= 1) // k=9 is outside its suggested [1,3] range
  }

  test("check: all-green suite and null-excluded uniqueness") {
    val df = Seq((1L, "aa"), (2L, "bb")).toDF("id", "lang")
    val got = Validate.check(df, Seq(NotNull("id"), Unique("id")))
      .as[(String, String, Long, Long, Int)].collect().toSet
    assert(got == Set(
      ("not_null", "id", 2L, 0L, 1),
      ("unique", "id", 2L, 0L, 1)))
    // null values don't participate in uniqueness (NotNull's job)
    val withNulls = Seq[(java.lang.Long, String)]((null, "x"), (null, "y"))
      .toDF("id", "lang")
    val u = Validate.check(withNulls, Seq(Unique("id")))
      .as[(String, String, Long, Long, Int)].head()
    assert(u == (("unique", "id", 2L, 0L, 1)))
  }
}
