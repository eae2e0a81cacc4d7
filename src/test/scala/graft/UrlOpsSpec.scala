package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.operators.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def host1(u: String): String =
    Seq(u).toDF("u").select(UrlOps.hostOf(col("u"))).as[String].head()

  private def dom1(u: String): String =
    Seq(u).toDF("u").select(UrlOps.domainOf(col("u"))).as[String].head()

  private def canon1(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalUrl(col("u"))).as[String].head()

  test("canonicalUrl: case, www, default port, fragment, trailing slash") {
    assert(canon1("HTTPS://WWW.Example.COM:443/Path/To/?x=1#frag") ==
      "https://example.com/Path/To?x=1")
    assert(canon1("http://www.site.org:80/") == "http://site.org")
    assert(canon1("http://site.org:8080/a") == "http://site.org:8080/a")
    // scheme-less input canonicalizes as http; path case is preserved
    assert(canon1("Site.net/A/b/") == "http://site.net/A/b")
  }

  test("canonicalUrl filters tracking params, keeps the rest in order") {
    assert(canon1("https://a.com/p?utm_source=x&id=3&fbclid=z&b=2") ==
      "https://a.com/p?id=3&b=2")
    assert(canon1("https://a.com/p?utm_campaign=only") ==
      "https://a.com/p")
    assert(canon1("https://a.com/p?ref=hp&gclid=1&mc_cid=2&mc_eid=3") ==
      "https://a.com/p")
    // 'referrer=x' is NOT a tracking key ('ref' must match whole key)
    assert(canon1("https://a.com/p?referrer=x") ==
      "https://a.com/p?referrer=x")
  }

  test("canonicalUrl: null in, null out; scheme distinguishes") {
    val got = Seq(Option("http://a.com/x"), Option("https://a.com/x"),
        None).toDF("u")
      .select(UrlOps.canonicalUrl(col("u"))).as[Option[String]]
      .collect().toSeq
    assert(got == Seq(Some("http://a.com/x"), Some("https://a.com/x"),
      None))
  }

  test("urlDedup elects the smallest id per canonical form") {
    val df = Seq(
      (5L, "https://WWW.a.com:443/p/?utm_source=x"),
      (2L, "https://a.com/p"),
      (9L, "https://a.com/p#sec"),
      (7L, "https://b.com/q")
    ).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(df, "url", "doc_id")
      .as[(Long, String, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, "https://a.com/p", 1, 3L)))
    assert(got(5L) == ((5L, "https://a.com/p", 0, 3L)))
    assert(got(9L) == ((9L, "https://a.com/p", 0, 3L)))
    assert(got(7L) == ((7L, "https://b.com/q", 1, 1L)))
  }

  test("urlDedup keeps null-URL rows as their own election group") {
    // null URLs fingerprint to null — the null-safe join must elect
    // among them instead of silently dropping the rows
    val df = Seq((3L, null: String), (1L, "https://a.com/p"),
      (8L, null: String)).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(df, "url", "doc_id")
      .as[(Long, String, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 3, s"null-URL rows must survive: $got")
    assert(got(3L) == ((3L, null, 1, 2L)))
    assert(got(8L) == ((8L, null, 0, 2L)))
    assert(got(1L)._3 == 1)
  }

  test("domainQuality aggregates the doc gate into domain keep rates") {
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "then it runs to the old barn in a field of green grass " +
      "where the sun is warm and the day is long and the air is sweet")
    val spam = "buy cheap pills win big"
    val df = Seq(
      ("https://a.com/1", good), ("https://www.a.com/2", good),
      ("https://a.com/3", spam),
      ("https://b.com/1", spam), ("https://b.com/2", spam)
    ).toDF("url", "text")
    val got = UrlOps.domainQuality(df, "url", "text")
      .as[(String, Long, Long, Long, Int)].collect().map(r => r._1 -> r)
      .toMap
    assert(got("a.com") == (("a.com", 3L, 2L, 666L, 0)))
    assert(got("b.com") == (("b.com", 2L, 0L, 0L, 1)))
  }

  test("hostOf strips scheme, userinfo, port, path, case, trailing dot") {
    assert(host1("https://www.Example.com/p/1") == "www.example.com")
    assert(host1("HTTP://user:pw@M.SITE.ORG:8080/x?q=1") == "m.site.org")
    assert(host1("example.net/plain#frag") == "example.net")
    assert(host1("ftp://files.example.co.uk.") == "files.example.co.uk")
    assert(host1("example.com") == "example.com")
    assert(host1("") == "")
  }

  test("registrable domain: last-2 labels, multi-label suffixes, short hosts") {
    assert(dom1("https://a.b.example.com/x") == "example.com")
    assert(dom1("https://a.b.example.co.uk/x") == "example.co.uk")
    assert(dom1("https://example.org") == "example.org")
    assert(dom1("http://localhost:8080/") == "localhost")
    assert(dom1("https://co.uk/odd") == "co.uk") // 2 labels pass through
  }

  test("domainStats counts docs, unique contents and words per domain") {
    val df = Seq(
      ("https://a.one.com/1", "x y z"),
      ("http://b.one.com/2", "x y z"),   // exact dup content, same domain
      ("one.com/3", "p q"),
      ("https://two.org/4", "hello")
    ).toDF("url", "text")
    val got = UrlOps.domainStats(df, "url", "text")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("one.com", 3L, 2L, 333L, 8L),
      ("two.org", 1L, 1L, 0L, 1L)))
  }

  test("domainStats: null-text docs count as one distinct content class") {
    val df = Seq(
      ("https://a.nul.com/1", null.asInstanceOf[String]),
      ("https://b.nul.com/2", null.asInstanceOf[String]),
      ("https://c.nul.com/3", "real words here")
    ).toDF("url", "text")
    val got = UrlOps.domainStats(df, "url", "text")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // two null-text docs are dups of EACH OTHER (one content class),
    // not vanished: n_unique = 2 (null-class + the real doc), not 1
    assert(got == Set(("nul.com", 3L, 2L, 333L, 3L)))
  }

  test("blocklistFilter drops blocked registrable domains via broadcast anti join") {
    val df = Seq(
      ("https://spam.bad.com/x", 1L),
      ("https://sub.good.org/y", 2L),
      ("bad.com/z", 3L)
    ).toDF("url", "id")
    val blocked = Seq("bad.com").toDF("domain")
    val kept = UrlOps.blocklistFilter(df, "url", blocked)
    assert(kept.select("id").as[Long].collect().toSeq == Seq(2L))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bhj = UrlOps.blocklistFilter(df, "url", blocked)
        .queryExecution.executedPlan.collect {
          case b: BroadcastHashJoinExec => b
        }
      assert(bhj.nonEmpty, "blocklist side must broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("domainMixture ranks top-k with permille shares of the full input") {
    val df = (1 to 6).map(i => s"https://a$i.big.com/p").map(("%s", _))
      .map(_._2).map(u => Tuple1(u)).toDF("url")
      .union(Seq("https://x.mid.org/p", "https://y.mid.org/p",
        "https://z.small.net/p").map(Tuple1(_)).toDF("url"))
    val got = UrlOps.domainMixture(df, "url", topK = 2)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("big.com", 6L, 666L, 1L),
      ("mid.org", 2L, 222L, 2L)))
  }
}
