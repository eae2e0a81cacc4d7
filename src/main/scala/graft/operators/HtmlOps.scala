package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction — the "step 0" of every web-crawl
  * curation pipeline (jusText / trafilatura class, public heuristics):
  * strip `script`/`style` containers, segment the page into blocks at
  * block-level tag boundaries, gate each block on word count and link
  * density, and rebuild the surviving blocks in document order as the
  * page's main text.
  *
  * Everything is a chain of `regexp_replace` / `regexp_extract_all` /
  * array column expressions — codegen'd scan-side string kernels with
  * no UDF, replayable as the same string functions in any ANSI engine
  * (the patterns stay inside the RE2/Java-common regex subset: no
  * backreferences, no lookaround).
  *
  * Scale shape: block segmentation and both gates run in the scan
  * projection; only KEPT block texts shuffle once into the per-doc
  * reassembly (collect_list/array_sort, the
  * [[TextOps.c4LineFilter]] pattern). Dropped boilerplate — nav bars,
  * footers, link farms, that is MOST of a crawl's bytes — costs a
  * counter, never bandwidth. At 100 TB this is exactly the operator
  * you want first in the DAG: it shrinks every downstream shuffle.
  *
  * Reference scope note: the reference engine (flink-siddhi) has no
  * HTML operator — this is part of the LLM-training-data extension
  * surface, same tier as the dedup/quality families.
  */
object HtmlOps {

  /** Tags whose CLOSING tag ends a text block (plus `<br>`/`<hr>`,
    * handled separately as self-closing separators).
    */
  val blockTags: Seq[String] = Seq(
    "p", "div", "nav", "footer", "header", "aside", "article", "section",
    "li", "ul", "ol", "table", "tr", "title", "h1", "h2", "h3", "h4",
    "h5", "h6", "blockquote", "pre", "figure", "form")

  private val blockClose = s"(?i)</(?:${blockTags.mkString("|")})>"
  private val selfSep = "(?i)<(?:br|hr)\\s*/?>"

  /** Drop `<script>…</script>` / `<style>…</style>` / HTML comments
    * with their contents (non-greedy dot-all — RE2 and Java agree),
    * then mark block boundaries with `\n`.
    */
  def blockSeparated(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    regexp_replace(regexp_replace(noComment, blockClose, "\n"),
      selfSep, "\n")
  }

  /** Strip every remaining tag and decode the five common entities
    * (`&lt; &gt; &nbsp; &quot;` first, `&amp;` LAST — the standard
    * order so `&amp;lt;` decodes to the literal `&lt;`).
    */
  def stripTags(block: Column): Column = {
    val noTag = regexp_replace(block, "<[^>]*>", " ")
    val e1 = regexp_replace(noTag, "&lt;", "<")
    val e2 = regexp_replace(e1, "&gt;", ">")
    val e3 = regexp_replace(e2, "&nbsp;", " ")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    regexp_replace(e4, "&amp;", "&")
  }

  /** Single-spaced trimmed form of a stripped block. */
  def normSpace(plain: Column): Column =
    regexp_replace(trim(plain), "\\s+", " ")

  /** Word count of a normalized string (0 for empty). */
  def wordCount(norm: Column): Column =
    when(length(norm) === 0, lit(0L))
      .otherwise(size(split(norm, " ")).cast("long"))

  /** Anchor text of a block: the concatenation of every `<a …>…</a>`
    * inner text (tags inside the anchor stripped, entities decoded).
    */
  def anchorText(block: Column): Column =
    normSpace(stripTags(array_join(
      regexp_extract_all(block, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " ")))

  /** Every `href` target on the page, in document order (attribute
    * quoting optional — the crawler-grade loose form; RE2/Java-common
    * pattern, externally replayable).
    */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a[^>]*href\\s*=\\s*[\"']?([^\"'\\s>]+)"), lit(1))

  /** Outlink-domain audit — the crawl-frontier side of the link graph
    * ([[Graphs.pageRank]] ranks it, this measures it): absolute links
    * (scheme present) per page, grouped by registrable target domain:
    * `(domain, n_links, n_pages)`. Relative links stay on-site and are
    * excluded. One scan-side extraction + one keyed aggregation; text
    * never shuffles, links do.
    */
  def outlinkDomains(df: DataFrame, htmlCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(extractLinks(col(htmlCol))).as("_l"))
      .filter(col("_l").contains("://"))
      .select(col("id"), UrlOps.domainOf(col("_l")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("id")).as("n_pages"))

  /** Main-text extraction: `(id, main_text, n_blocks, n_kept,
    * n_words)`. A block survives when it has at least `minWords` words
    * AND its link density (anchor words per 1000 block words) is at
    * most `maxLinkPermille` — the jusText-lite good-block rule. Nav
    * bars and footers are nearly all anchor text (density → 1000);
    * short shouting blocks fail the length gate; body paragraphs pass
    * both. `main_text` joins surviving blocks with `\n` in original
    * page order; docs with no surviving block keep a row with
    * `main_text = ''`.
    */
  def extractMainText(df: DataFrame, htmlCol: String, idCol: String,
      minWords: Int = 3, maxLinkPermille: Int = 500): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"maxLinkPermille must be in [0,1000], got $maxLinkPermille")
    // per-block regex chains run EXACTLY once: the inner transform does
    // the string work per block, the outer one only reads its struct
    // fields to derive counts — no projection-collapse recompute.
    // Blocks are already in page order inside the array, so gating and
    // reassembly are array HOFs on the SAME row: the whole operator is
    // one ZERO-SHUFFLE scan projection (stream-capable like the frozen
    // scorers) — dropped boilerplate never leaves the row it was born
    // in. split keeps a trailing '' piece, so null/empty pages still
    // produce a row.
    val a1 = transform(
      split(blockSeparated(coalesce(col(htmlCol), lit(""))), "\n"),
      raw => struct(
        normSpace(stripTags(raw)).as("txt"),
        anchorText(raw).as("atxt")))
    val a2 = transform(a1, s => struct(
      s.getField("txt").as("txt"),
      wordCount(s.getField("txt")).as("nw"),
      wordCount(s.getField("atxt")).as("naw")))
    def gate(s: Column): Column = s.getField("nw") >= minWords &&
      s.getField("naw") * 1000 <= s.getField("nw") * maxLinkPermille
    df.select(col(idCol).cast("long").as("id"), a2.as("_bs"))
      .select(col("id"), filter(col("_bs"), s => gate(s)).as("_kept"),
        size(filter(col("_bs"), s => s.getField("nw") > 0))
          .cast("long").as("n_blocks"))
      .select(col("id"),
        array_join(transform(col("_kept"), s => s.getField("txt")), "\n")
          .as("main_text"),
        col("n_blocks"),
        size(col("_kept")).cast("long").as("n_kept"),
        aggregate(col("_kept"), lit(0L),
          (acc, s) => acc + s.getField("nw")).as("n_words"))
  }
}
