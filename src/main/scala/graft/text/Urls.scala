package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Canonical URL normalization for web-corpus curation — the
  * highest-frequency cheap transforms a crawl pipeline applies before
  * per-host capping, blocklisting, and URL-level dedup:
  *  - scheme and host lowercase (path/query case is SIGNIFICANT per
  *    RFC 3986 and stays),
  *  - default ports stripped (`:80` for http, `:443` for https;
  *    non-default ports are identity),
  *  - tracking query parameters removed (`utm_*` prefix plus an
  *    explicit list — the parameters that make one page crawl as
  *    thousands of "distinct" URLs), remaining parameters kept in
  *    original order (sorting would merge `?a=1&b=2` pages with
  *    order-sensitive endpoints),
  *  - fragment dropped (never sent to the server),
  *  - empty path canonicalized to `/`.
  *
  * Everything is a composition of codegen'd built-ins (regexp_extract /
  * lambda filter / concat) with an exact DuckDB mirror — per-row, zero
  * shuffles, and URL-less rows yield NULL (no scheme ⇒ not a URL, the
  * caller dead-letters). Per-host capping composes
  * [[graft.ops.Sampling.capPerKeyIds]] on [[host]]; blocklisting is a
  * broadcast anti-join on the same column.
  */
object Urls {

  /** Parameters stripped by default, beyond the `utm_` prefix rule. */
  val trackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "ref", "igshid")

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val queryRe = "\\?([^#]*)"

  /** Lowercased host without the port — the per-host cap / blocklist /
    * URL-dedup key. NULL when `url` has no scheme. */
  def host(url: Column): Column = {
    val hp = lower(regexp_extract(url, hostRe, 1))
    when(regexp_extract(url, schemeRe, 1) =!= "",
      regexp_replace(hp, ":[0-9]+$", ""))
  }

  /** The canonical form described above; NULL when `url` has no scheme. */
  def canonical(url: Column,
      strip: Seq[String] = trackingParams): Column = {
    val sch = lower(regexp_extract(url, schemeRe, 1))
    val hp = lower(regexp_extract(url, hostRe, 1))
    val hp2 = when(sch === "http", regexp_replace(hp, ":80$", ""))
      .when(sch === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val path = regexp_extract(url, pathRe, 1)
    val q = regexp_extract(url, queryRe, 1)
    val keptParams = filter(split(q, "&"), p => {
      val name = substring_index(p, "=", 1)
      !name.isin(strip: _*) && !name.startsWith("utm_") && p =!= ""
    })
    val q2 = array_join(keptParams, "&")
    when(sch =!= "",
      concat(sch, lit("://"), hp2,
        when(path === "", lit("/")).otherwise(path),
        when(q2 =!= "", concat(lit("?"), q2)).otherwise(lit(""))))
  }

  /** Outlink extraction — the first step of link-graph construction
    * (host-level PageRank, link-farm isolation, crawl frontier): all
    * `href="…"` targets of a markup document, in document order. The
    * quote-bounded form is the portable-regex-subset one; unquoted or
    * single-quoted attributes are out of scope (as in [[Scrub]], the
    * PLUMBING is the contract — a production extractor swaps the
    * pattern, not the plan). Compose with [[host]]/[[canonical]] per
    * element, then explode into (src, dst) edges. */
  def extractLinks(c: Column): Column =
    regexp_extract_all(c, lit("href=\"([^\"]+)\""), lit(1))

  /** DuckDB mirror of [[extractLinks]]. */
  def extractLinksSql(inner: String): String =
    s"""regexp_extract_all($inner, 'href="([^"]+)"', 1)"""

  private val anchorPat = "<a href=\"([^\"]+)\"[^>]*>([^<]*)</a>"

  /** (href, anchor-text) pairs of a markup document, in document order —
    * the link CONTEXT [[extractLinks]] drops. Anchor text is the
    * classic relevance signal: what OTHER pages call a target is often a
    * better description than the target's own text (the original
    * web-search ranking insight), and per-host anchor profiles feed
    * both retrieval and crawl prioritization. Same portable-regex-subset
    * contract as [[extractLinks]]: double-quoted hrefs, non-nested
    * anchor bodies; a production extractor swaps the pattern, not the
    * plan. Two group extractions zip positionally — both engines index
    * capture groups identically. */
  def extractAnchors(c: Column): Column =
    zip_with(
      regexp_extract_all(c, lit(anchorPat), lit(1)),
      regexp_extract_all(c, lit(anchorPat), lit(2)),
      (h, a) => struct(h.as("href"), a.as("anchor")))

  /** DuckDB mirror of [[extractAnchors]] — two fragments to unnest in
    * parallel (DuckDB zips same-length unnests row-wise). */
  def extractAnchorsSql(inner: String): (String, String) =
    (s"regexp_extract_all($inner, '$anchorPat', 1)",
      s"regexp_extract_all($inner, '$anchorPat', 2)")

  /** Per-target-host anchor-text profile: the `k` most frequent anchor
    * tokens pointing AT each host. Top-k by two-phase bounded rank
    * (salted partial top-k, then top-k of ≤64·k survivors per host —
    * the [[Spans.ngramDiversity]] shape: never a corpus-wide sort
    * within one host partition; a popular host accumulates anchors from
    * the whole crawl). Ties break (count desc, token asc) — total and
    * engine-portable.
    *
    * @param pairs (hostCol, anchorCol) rows — compose from
    *              [[extractAnchors]] + [[host]]
    * @return (hostCol, token, c, rank) with rank 1..k */
  def anchorProfile(pairs: DataFrame, hostCol: String, anchorCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    val counts = pairs
      .select(col(hostCol).as("__h"),
        explode(TextAnalysis.tokens(col(anchorCol))).as("token"))
      .groupBy(col("__h"), col("token")).agg(count(lit(1)).as("c"))
    counts
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col("__h"), pmod(Hash64.hash60(col("token")), lit(64)))
        .orderBy(col("c").desc, col("token"))))
      .filter(col("__rn") <= k)
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("__h")).orderBy(col("c").desc, col("token")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("__h").as(hostCol), col("token"), col("c"), col("rank"))
  }

  /** URL path-hierarchy rollup: per (host, path-prefix) at depths
    * 1..`maxDepth`, how many URLs live under that prefix — the crawl
    * frontier / section-weight view ([[host]] alone collapses a whole
    * site to one row; this shows WHERE in the site the corpus sits).
    * Segments compare lowercased (site sections are case-insensitive
    * in practice; the raw path stays whatever [[canonical]] kept).
    *
    * One generator explode (≤ maxDepth rows per URL) + one hash
    * aggregation. URLs without a scheme yield NULL host upstream and
    * are excluded.
    *
    * @return (host, depth, prefix, n_urls)
    */
  def pathRollup(df: DataFrame, urlCol: String, maxDepth: Int = 3)
      : DataFrame = {
    require(maxDepth >= 1)
    val segs = filter(split(
      lower(regexp_extract(col(urlCol), pathRe, 1)), "/"),
      s => s =!= "")
    df.select(host(col(urlCol)).as("host"), segs.as("__segs"))
      .filter(col("host").isNotNull && size(col("__segs")) >= 1)
      .withColumn("depth", explode(sequence(lit(1L),
        least(lit(maxDepth.toLong), size(col("__segs")).cast("long")))))
      .select(col("host"), col("depth"),
        concat(lit("/"), array_join(
          slice(col("__segs"), lit(1), col("depth").cast("int")), "/"))
          .as("prefix"))
      .groupBy(col("host"), col("depth"), col("prefix"))
      .agg(count(lit(1)).as("n_urls"))
  }

  /** DuckDB oracle for [[pathRollup]]: `urlExpr` over `table`. */
  def pathRollupOracleSql(table: String, urlExpr: String,
      maxDepth: Int = 3): String =
    s"""WITH u AS (
       |  SELECT ${hostSql(urlExpr)} AS host,
       |         list_filter(string_split(
       |           lower(regexp_extract($urlExpr, '$pathRe', 1)), '/'),
       |           s -> s <> '') AS segs
       |  FROM $table
       |), e AS (
       |  SELECT host, segs,
       |         unnest(range(1, least($maxDepth, len(segs)) + 1)) AS depth
       |  FROM u WHERE host IS NOT NULL AND len(segs) >= 1
       |)
       |SELECT host, CAST(depth AS BIGINT) AS depth,
       |       '/' || array_to_string(
       |         list_slice(segs, 1, CAST(depth AS INTEGER)), '/')
       |         AS prefix,
       |       CAST(count(*) AS BIGINT) AS n_urls
       |FROM e GROUP BY 1, 2, 3""".stripMargin

  /** DuckDB mirror of [[host]]. */
  def hostSql(urlExpr: String): String =
    s"""CASE WHEN regexp_extract($urlExpr, '$schemeRe', 1) <> ''
       |  THEN regexp_replace(lower(regexp_extract($urlExpr, '$hostRe', 1)),
       |                      ':[0-9]+$$', '')
       |END""".stripMargin

  /** DuckDB mirror of [[canonical]]. */
  def canonicalSql(urlExpr: String,
      strip: Seq[String] = trackingParams): String = {
    val stripList = strip.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""CASE WHEN lower(regexp_extract($urlExpr, '$schemeRe', 1)) <> '' THEN
       |  lower(regexp_extract($urlExpr, '$schemeRe', 1)) || '://' ||
       |  CASE lower(regexp_extract($urlExpr, '$schemeRe', 1))
       |    WHEN 'http' THEN regexp_replace(
       |      lower(regexp_extract($urlExpr, '$hostRe', 1)), ':80$$', '')
       |    WHEN 'https' THEN regexp_replace(
       |      lower(regexp_extract($urlExpr, '$hostRe', 1)), ':443$$', '')
       |    ELSE lower(regexp_extract($urlExpr, '$hostRe', 1)) END ||
       |  CASE WHEN regexp_extract($urlExpr, '$pathRe', 1) = '' THEN '/'
       |       ELSE regexp_extract($urlExpr, '$pathRe', 1) END ||
       |  CASE WHEN array_to_string(list_filter(
       |         string_split(regexp_extract($urlExpr, '$queryRe', 1), '&'),
       |         p -> split_part(p, '=', 1) NOT IN $stripList
       |              AND NOT starts_with(split_part(p, '=', 1), 'utm_')
       |              AND p <> ''), '&') <> ''
       |       THEN '?' || array_to_string(list_filter(
       |         string_split(regexp_extract($urlExpr, '$queryRe', 1), '&'),
       |         p -> split_part(p, '=', 1) NOT IN $stripList
       |              AND NOT starts_with(split_part(p, '=', 1), 'utm_')
       |              AND p <> ''), '&')
       |       ELSE '' END
       |END""".stripMargin
  }
}
