package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** URL/domain operators — the C4/RefinedWeb-class front gate: extract
  * the registrable domain from each document's source URL, gate on a
  * domain blocklist, and audit per-domain duplication/mixture. All
  * scalar pieces are plain `regexp`/`split` column expressions
  * (codegen'd, replayable as string functions in any engine); the
  * aggregates are ordinary hash aggregations keyed by domain.
  *
  * Scale shape: a 100 TB crawl has ~1e7-1e8 distinct registrable
  * domains — domain relations shuffle fine but must never be
  * driver-collected or globally ranked unbounded; [[domainMixture]]
  * bounds its rank window behind a `TakeOrderedAndProject` top-k, and
  * [[blocklistFilter]] broadcasts the blocklist side (blocklists are
  * ≤ 1e6 rows in practice — tiny next to the corpus).
  */
object UrlOps {

  /** The URL's host: scheme and `userinfo@` stripped, port and
    * path/query/fragment dropped, lowercased, trailing dot removed.
    * Pure regexp — no UDF, identical under RE2/Java regex (the pattern
    * avoids backtracking-only constructs). Unmatchable inputs (empty
    * string) yield `''`; null yields null.
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url,
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)", 1)),
      "\\.$", "")

  /** Multi-label public suffixes the registrable-domain heuristic
    * recognizes (the high-traffic subset; a full public-suffix-list
    * integration would swap this constant for the published table —
    * the surrounding logic is unchanged).
    */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.in", "co.nz", "com.br", "com.cn",
    "com.mx", "com.ar", "co.za", "com.tr", "com.sg", "com.hk")

  /** eTLD+1 of a host: the last two labels, or three when the last two
    * form a recognized multi-label suffix (`a.b.co.uk` → `b.co.uk`).
    * Hosts with ≤ 2 labels pass through unchanged.
    */
  def registrableDomainOfHost(host: Column): Column = {
    val parts = split(host, "\\.")
    val last2 = array_join(slice(parts, -2, 2), ".")
    val last3 = array_join(slice(parts, -3, 3), ".")
    when(size(parts) <= 2, host)
      .otherwise(when(last2.isin(multiLabelSuffixes: _*), last3)
        .otherwise(last2))
  }

  /** Registrable domain straight from a URL column. */
  def domainOf(url: Column): Column = registrableDomainOfHost(hostOf(url))

  /** Per-domain corpus audit: `(domain, n_docs, n_unique, dup_permille,
    * n_words)` — exact-duplicate rate inside each domain (by
    * normalized-content fingerprint, the q19 key) and token mass. The
    * standard "which mirrors/boilerplate farms are polluting the
    * crawl" report.
    *
    * Scale shape: one hash aggregation keyed by domain; the inputs to
    * the shuffle are (domain, fp, n_words) projections — text never
    * shuffles. `count(distinct fp)` plans as the two-level expand
    * Spark uses for distinct aggregates; both levels stay keyed by
    * domain (no global step).
    */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame = {
    val nw = when(coalesce(length(trim(col(textCol))), lit(0)) === 0, lit(0L))
      .otherwise(size(TextOps.words(col(textCol))).cast("long"))
    // null-text docs fingerprint to a sentinel rather than NULL:
    // countDistinct skips NULLs, so an all-null-text domain would
    // otherwise report n_unique=0 / dup_permille=1000 despite holding
    // no duplicates (null text is its own one content class)
    df.select(domainOf(col(urlCol)).as("domain"),
        coalesce(Text.fingerprint(col(textCol)),
          lit(Long.MinValue)).as("_fp"), nw.as("_nw"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_fp")).as("n_unique"),
        sum(col("_nw")).as("n_words"))
      .select(col("domain"), col("n_docs"), col("n_unique"),
        expr("((n_docs - n_unique) * 1000) div n_docs").as("dup_permille"),
        col("n_words"))
  }

  /** Drop documents whose registrable domain appears in the blocklist
    * relation (`blockedCol` holds registrable domains — subdomains are
    * covered by construction since matching happens at eTLD+1). The
    * blocklist side broadcasts: a left-anti broadcast hash join, zero
    * shuffle of the corpus.
    */
  def blocklistFilter(df: DataFrame, urlCol: String, blocked: DataFrame,
      blockedCol: String = "domain"): DataFrame =
    df.join(
      broadcast(blocked.select(col(blockedCol).as("_blocked")).distinct()),
      domainOf(col(urlCol)) === col("_blocked"), "left_anti")

  /** Per-domain quality prior — the UT1/RefinedWeb "domain reputation"
    * gate: a per-doc quality pass (length + stopword-mass, the two
    * [[TextOps.qualityGate]] signals that transfer across docs)
    * aggregates into each registrable domain's keep rate, and domains
    * whose rate falls under `minKeptPerMille` get `blocked = 1` — the
    * production move of gating cheap-signal QUALITY at the DOMAIN
    * level (one bad page is noise; a domain that is 80% bad is a farm,
    * and its remaining 20% is what leaks through doc-level gates).
    * Output: `(domain, n_docs, n_kept, kept_permille, blocked)`;
    * the blocked rows feed [[blocklistFilter]] directly.
    *
    * Scale shape: the doc gate is scan-side (array HOF over the
    * in-row token array); one hash aggregation keyed by domain —
    * text never shuffles.
    */
  def domainQuality(df: DataFrame, urlCol: String, textCol: String,
      minKeptPerMille: Int = 500, minTokens: Int = 30,
      minStopPerMille: Int = 20): DataFrame = {
    require(minKeptPerMille >= 0 && minKeptPerMille <= 1000,
      s"minKeptPerMille must be in [0, 1000], got $minKeptPerMille")
    val t = col(textCol)
    // tokens materialize once; the stopword count is the codegen'd
    // set-membership kernel, not an interpreted per-element isin HOF
    val base = df.select(col(urlCol).as("_url"),
      when(coalesce(length(trim(t)), lit(0)) === 0,
        array().cast("array<string>"))
        .otherwise(TextOps.words(t)).as("_ws"))
    val nt = size(col("_ws")).cast("long")
    val nStop = graft.functions.TextKernelExprs
      .tokenSetCount(col("_ws"), TextOps.stopwords)
    val kept = (nt >= minTokens &&
      nStop * 1000 >= nt * minStopPerMille).cast("long")
    base.select(domainOf(col("_url")).as("domain"), kept.as("_k"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_k")).as("n_kept"))
      .select(col("domain"), col("n_docs"), col("n_kept"),
        expr("(n_kept * 1000) div n_docs").as("kept_permille"))
      .withColumn("blocked",
        (col("kept_permille") < minKeptPerMille).cast("int"))
  }

  /** Canonical form of a URL — the crawl-frontier dedup key (the
    * RFC 3986 §6 normalizations plus the tracking-parameter strip every
    * production crawler applies): scheme and host lowercased, `www.`
    * and trailing host dot dropped, default ports (`:80` http, `:443`
    * https) removed, fragment removed, tracking query parameters
    * (`utm_*`, `gclid`, `fbclid`, `ref`, `mc_cid`, `mc_eid`) filtered
    * out with the remaining parameters kept in order, trailing path
    * slashes stripped. Scheme-less inputs canonicalize as `http`.
    * Pure regexp + array HOFs — codegen'd, zero shuffle, identical
    * under RE2/Java regex; null in, null out.
    */
  def canonicalUrl(url: Column): Column = {
    val schemeRaw = lower(regexp_extract(url,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val scheme = when(schemeRaw === "", lit("http")).otherwise(schemeRaw)
    val hostport = regexp_extract(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#]+)", 1)
    val host = regexp_replace(regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")),
      "\\.$", ""), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    // path+query = everything after authority, fragment dropped
    val pathq = regexp_extract(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?[^/?#]*([^#]*)", 1)
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1),
      "/+$", "")
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val keptParams = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike(
        "^(utm_[a-zA-Z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid)(=|$)"))
    val queryPart = when(query === "" || size(keptParams) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(keptParams, "&")))
    when(url.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        queryPart))
  }

  /** Canonical-URL dedup: `(id, canon_url, kept, n_aliases)` — every
    * row tagged with its canonical URL, `kept = 1` on the smallest id
    * per canonical form (the crawl-frontier "have we fetched this
    * already" election), `n_aliases` = rows sharing the canonical form.
    *
    * Scale shape: canonicalization is scan-side; the election groups by
    * the canonical form's 64-bit fingerprint, so the aggregation and
    * the join back to rows shuffle `(fp, id)` pairs, never URL strings
    * (rows re-derive their canonical string scan-side on the probe
    * side of a plain equi-join).
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast("long").as("id"),
        canonicalUrl(col(urlCol)).as("canon_url"))
      .withColumn("_fp", Text.fingerprintOfNormalized(col("canon_url")))
    val groups = rows.groupBy(col("_fp"))
      .agg(min(col("id")).as("_keep_id"), count(lit(1)).as("n_aliases"))
      .withColumnRenamed("_fp", "_gfp")
    // null-safe join (the Dedup.exact convention): null URLs
    // canonicalize to a null fingerprint, and a plain equi-join would
    // silently drop those rows instead of electing among them
    rows.join(groups, rows("_fp") <=> groups("_gfp"))
      .select(col("id"), col("canon_url"),
        (col("id") === col("_keep_id")).cast("int").as("kept"),
        col("n_aliases"))
  }

  /** Top-`topK` domain mixture of the input: `(domain, n_docs,
    * share_permille, rank)` with shares against the full input count.
    * The rank window runs AFTER a `TakeOrderedAndProject` top-k cut,
    * so it orders ≤ topK rows — never a global unpartitioned sort of
    * the domain relation.
    */
  def domainMixture(df: DataFrame, urlCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // the domain-count relation feeds BOTH the total and the top-k cut
    // — materialize once (the semDedup lesson) so the corpus scan and
    // aggregation run a single time
    val doms = df.select(domainOf(col(urlCol)).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val tot = doms.agg(sum(col("n_docs")).as("_tot"))
    doms.orderBy(col("n_docs").desc, col("domain").asc).limit(topK)
      .crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"),
        expr("(n_docs * 1000) div _tot").as("share_permille"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_docs").desc, col("domain").asc)).cast("long"))
  }
}
