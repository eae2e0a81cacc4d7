package graft

import org.apache.spark.sql.functions._
import graft.operators.HtmlOps

class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(pages: Seq[(Long, String)]) =
    HtmlOps.extractMainText(pages.toDF("doc_id", "html"), "html", "doc_id")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)

  test("article survives, nav/footer/sidebar boilerplate dropped") {
    val html =
      """<html><head><title>My Page</title>
        |<style>body { margin: 0; }</style>
        |<script>var tracking = "evil";</script></head><body>
        |<nav><a href="/">Home</a> <a href="/shop">Shop</a> <a href="/faq">FAQ</a></nav>
        |<article><p>The quick brown fox jumps over the lazy dog today.</p>
        |<p>A second paragraph with plenty of genuine running text here.</p></article>
        |<div class="side"><a href="/a">win a prize</a> <a href="/b">click here now</a></div>
        |<footer><a href="/tos">Terms of Service</a> <a href="/priv">Privacy Policy</a></footer>
        |</body></html>""".stripMargin
    val Array((id, main, nBlocks, nKept, nWords)) = extract(Seq((7L, html)))
    assert(id == 7L)
    assert(main ==
      "The quick brown fox jumps over the lazy dog today.\n" +
      "A second paragraph with plenty of genuine running text here.")
    assert(nKept == 2L && nWords == 20L)
    assert(nBlocks >= 4L) // title, nav, 2 paras, sidebar, footer
  }

  test("script/style/comment contents never leak into text") {
    val html = "<p>keep these words here</p><script>drop this</script>" +
      "<style>p{x}</style><!-- secret comment words --><p>and keep these too please</p>"
    val Array((_, main, _, kept, _)) = extract(Seq((1L, html)))
    assert(main == "keep these words here\nand keep these too please")
    assert(kept == 2L)
    assert(!main.contains("drop") && !main.contains("secret"))
  }

  test("entity decode: &amp; last, &lt;/&gt;/&nbsp;/&quot; first") {
    val html = "<p>salt &amp; pepper &lt;tag&gt; &quot;quoted&quot;&nbsp;end</p>"
    val Array((_, main, _, _, _)) = extract(Seq((1L, html)))
    assert(main == "salt & pepper <tag> \"quoted\" end")
    // double-escaped &amp;lt; decodes to the literal string "&lt;"
    val Array((_, m2, _, _, _)) =
      extract(Seq((2L, "<p>literal &amp;lt; stays escaped</p>")))
    assert(m2 == "literal &lt; stays escaped")
  }

  test("link-density gate: mixed block above threshold drops, below keeps") {
    // 4 anchor words of 8 => 500 permille, kept at the default <= 500
    val ok = "<p>alpha beta gamma delta <a href='/x'>one two three four</a></p>"
    // 5 anchor words of 8 => 625 permille, dropped
    val bad = "<p>alpha beta gamma <a href='/x'>one two three four five</a></p>"
    val got = extract(Seq((1L, ok), (2L, bad)))
    assert(got(0)._4 == 1L && got(1)._4 == 0L)
  }

  test("short blocks drop; order preserved across br-separated blocks") {
    val html = "<div>first real block of words<br/>no<br>" +
      "second real block of words</div>"
    val Array((_, main, blocks, kept, _)) = extract(Seq((1L, html)))
    assert(main == "first real block of words\nsecond real block of words")
    assert(blocks == 3L && kept == 2L)
  }

  test("page with nothing kept still yields a row with empty main_text") {
    val got = extract(Seq((1L, "<nav><a href='/'>a b c d</a></nav>"),
      (2L, "")))
    assert(got(0) == ((1L, "", 1L, 0L, 0L)))
    assert(got(1) == ((2L, "", 0L, 0L, 0L)))
  }

  test("extractLinks: quote styles, unquoted hrefs, document order") {
    val html = "<a href=\"/a\">1</a><A HREF='https://x.com/b'>2</A>" +
      "<a class=\"z\" href=/bare>3</a><a>no href</a>"
    val links = Seq((1L, html)).toDF("id", "html")
      .select(HtmlOps.extractLinks(col("html"))).as[Seq[String]].head()
    assert(links == Seq("/a", "https://x.com/b", "/bare"))
  }

  test("outlinkDomains: absolute links only, registrable grouping") {
    val pages = Seq(
      (1L, "<a href=\"https://www.a.shop.com/x\">s</a>" +
        "<a href='http://b.shop.com/y'>t</a><a href=\"/rel\">r</a>"),
      (2L, "<a href=\"https://news.co.uk/z\">u</a>" +
        "<a href=\"https://deep.sub.shop.com/w\">v</a>"))
      .toDF("doc_id", "html")
    val got = HtmlOps.outlinkDomains(pages, "html", "doc_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("shop.com", 3L, 2L), ("news.co.uk", 1L, 1L)))
  }

  test("uppercase tags and attributes segment the same") {
    val html = "<DIV>Upper case tags work fine here</DIV>" +
      "<NAV><A HREF='/'>x y z</A></NAV>"
    val Array((_, main, _, kept, _)) = extract(Seq((1L, html)))
    assert(main == "Upper case tags work fine here")
    assert(kept == 1L)
  }
}
