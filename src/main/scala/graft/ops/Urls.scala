package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** URL/domain-level curation — the standard C4/RefinedWeb-style
  * stages between HTML extraction and text dedup (VERDICT r13 next
  * #2): canonicalize URLs, dedup exactly by canonical URL, and cap
  * any one registered domain's share of the corpus.
  *
  * The reference pipeline carries no URLs (its engagement events are
  * id-keyed — `EngagementProcessor.scala:86-116`), so like the PII
  * and media lanes this one plants a DETERMINISTIC id-derived URL
  * fixture (Zipf-ish hot domain, tracking-param/fragment/case/port
  * noise) and the oracle restates the same concatenation — a
  * canonicalizer that leaves a residue hash-mismatches.
  *
  * SCALE SHAPE: canonicalization and domain extraction are pure
  * column chains (codegen'd regex ops, zero shuffle); URL dedup is
  * one keyed aggregate on the canonical string; the domain cap runs
  * through the bounded-state `topk_by_score` aggregate, whose
  * MAP-SIDE PARTIAL bound (≤ cap rows of state per domain per task)
  * means a hot domain holding 40% of a 100 TB corpus ships
  * ≤ cap·n_tasks pre-reduced rows to one reducer — never its raw
  * row share. No salting needed: partial aggregation IS the skew
  * mitigation for a bounded-k aggregate. */
object Urls {

  // ---------------------------------------------------------------
  // Canonicalization (pure Column chain + DuckDB twin)
  // ---------------------------------------------------------------

  /** Tracking query params dropped by [[urlCanonicalize]]: the
    * utm_* family plus the big click-id params. Anchored prefix
    * match on `name=`; RE2 ∩ Java syntax (no lookaround). */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val authRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val restRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  /** Canonical URL: lowercase scheme + authority (host case is
    * insignificant, path/query case is significant — RFC 3986
    * §6.2.2.1), strip the scheme's default port (:443 https / :80
    * http), strip the fragment, drop [[TrackingParamRe]] query
    * params (preserving the relative order of the survivors), empty
    * path → "/". Inputs that are not scheme://… URLs come back as
    * "://" + residue — callers feeding raw crawl data should
    * pre-filter on '^https?://'. */
  def urlCanonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val auth0 = lower(regexp_extract(url, authRe, 1))
    val auth = when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .otherwise(auth0)
    val rest = regexp_extract(url, restRe, 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    concat(scheme, lit("://"), auth, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Registered domain of a CANONICAL url: host minus port, last two
    * dot-labels (a public-suffix-list-free simplification, stated —
    * co.uk-style suffixes group at the suffix; a production deploy
    * swaps in a PSL table as a broadcast join, the shape is
    * unchanged). */
  def registeredDomain(urlCanon: Column): Column =
    regexp_extract(
      regexp_replace(regexp_extract(urlCanon, authRe, 1), ":[0-9]+$", ""),
      "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)

  private def registeredDomainSql(urlCanon: String): String =
    s"regexp_extract(regexp_replace(regexp_extract(($urlCanon), '$authRe', 1), " +
      s"':[0-9]+$$', ''), '([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$$', 1)"

  // ---------------------------------------------------------------
  // Deterministic URL fixture (id-derived, Zipf hot domain)
  // ---------------------------------------------------------------

  /** Id-derived URL: 3 consecutive doc_ids share one logical page
    * (group g = doc_id div 3) with per-variant noise —
    *   v0: plain https (non-default :8080 KEPT when g % 7 = 0),
    *   v1: upper-case scheme+host, explicit :443, two utm params,
    *   v2: utm_campaign BEFORE the real id param, plus a fragment —
    * so v0/v1/v2 canonicalize to ONE url except the :8080 groups,
    * where v0 stays distinct (ports are content-bearing). The hot
    * domain (g % 5 < 2 → news.hub-portal.com) owns ~40% of docs —
    * the Zipf head a per-domain cap must catch. */
  def urlFixture(docId: Column): Column = {
    // exact for doc_id < 2^52 (the double-division band of every
    // id-derived fixture; oracle compare runs at sf0.01)
    val g = ((docId - pmod(docId, lit(3))) / lit(3)).cast("long")
    val gs = g.cast("string")
    val host = when(pmod(g, lit(5)) < 2, lit("news.hub-portal.com"))
      .otherwise(concat(lit("www.site"), pmod(g, lit(211)).cast("string"),
        lit(".org")))
    val port0 = when(pmod(g, lit(7)) === 0, lit(":8080")).otherwise(lit(""))
    val path = concat(lit("/a/"), pmod(g, lit(1000)).cast("string"),
      lit("/p"), gs)
    val v = pmod(docId, lit(3))
    when(v === 0,
        concat(lit("https://"), host, port0, path, lit("?id="), gs))
      .when(v === 1,
        concat(lit("HTTPS://"), upper(host), lit(":443"), path,
          lit("?id="), gs, lit("&utm_source=feed&utm_medium=rss")))
      .otherwise(
        concat(lit("https://"), host, path, lit("?utm_campaign=z&id="), gs,
          lit("#frag-"), docId.cast("string")))
  }

  /** SQL twin of [[urlFixture]]. */
  private def urlFixtureSql(docId: String): String = {
    val g = s"(($docId) // 3)"
    val gs = s"CAST($g AS VARCHAR)"
    val host = s"CASE WHEN $g % 5 < 2 THEN 'news.hub-portal.com' " +
      s"ELSE 'www.site' || CAST($g % 211 AS VARCHAR) || '.org' END"
    val port0 = s"CASE WHEN $g % 7 = 0 THEN ':8080' ELSE '' END"
    val path = s"'/a/' || CAST($g % 1000 AS VARCHAR) || '/p' || $gs"
    // NOTE: embedded in stripMargin-processed CTE strings — no line
    // may start with '|' after this template's own strip, so the ||
    // concatenations sit at line ENDS
    s"""CASE WHEN ($docId) % 3 = 0 THEN
       |   'https://' || $host || $port0 || $path || '?id=' || $gs
       | WHEN ($docId) % 3 = 1 THEN
       |   'HTTPS://' || upper($host) || ':443' || $path || '?id=' || $gs ||
       |     '&utm_source=feed&utm_medium=rss'
       | ELSE
       |   'https://' || $host || $path || '?utm_campaign=z&id=' || $gs ||
       |     '#frag-' || CAST($docId AS VARCHAR) END""".stripMargin
  }

  /** The fixture + canonicalization replay as flat CTEs ending in
    * `canon(doc_id, url_canon)` — the [[urlCanonicalize]] walk
    * restated step-for-step (scheme/auth/rest → default-port strip,
    * fragment already excluded by restRe, tracking-param filter,
    * empty path → '/'). */
  private def canonCteSql: String =
    s"""c0 AS (SELECT doc_id, ${urlFixtureSql("doc_id")} AS url
       |  FROM documents),
       |c1 AS (SELECT doc_id,
       |    lower(regexp_extract(url, '$schemeRe', 1)) AS scheme,
       |    lower(regexp_extract(url, '$authRe', 1)) AS auth0,
       |    regexp_extract(url, '$restRe', 1) AS rest
       |  FROM c0),
       |c2 AS (SELECT doc_id, scheme,
       |    CASE WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$$', '')
       |         WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$$', '')
       |         ELSE auth0 END AS auth,
       |    CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
       |         ELSE regexp_extract(rest, '^([^?]*)', 1) END AS path,
       |    list_filter(string_split(
       |        regexp_extract(rest, '^[^?]*\\?(.*)$$', 1), '&'),
       |      p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRe'))
       |      AS kept
       |  FROM c1),
       |canon AS (SELECT doc_id,
       |    scheme || '://' || auth || path ||
       |    CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
       |         ELSE '' END AS url_canon
       |  FROM c2)""".stripMargin

  // ---------------------------------------------------------------
  // Operators
  // ---------------------------------------------------------------

  /** Exact URL dedup over a (doc_id, url) frame: one row per
    * CANONICAL url — keeper is the min doc_id, n_variants counts the
    * collapsed spellings. One keyed aggregate (partial map-side
    * combine), no window, no text movement. */
  def urlDedup(withUrl: DataFrame): DataFrame =
    withUrl.select(col("doc_id"), urlCanonicalize(col("url")).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("url_canon"), col("n_variants"))
      .orderBy("doc_id")

  /** Per-registered-domain share cap over a (doc_id, url,
    * quality_score) frame: each domain keeps its top-`cap` documents
    * by (quality_score DESC, doc_id ASC) — deterministic, exact, via
    * the bounded-state topk aggregate (k rows of state per group,
    * partial-merged map-side, so the hot domain's raw rows never
    * converge on one task). */
  def domainCap(scored: DataFrame, cap: Int): DataFrame =
    scored
      .select(
        registeredDomain(urlCanonicalize(col("url"))).as("domain"),
        col("quality_score"),
        Util.lpadKey(col("doc_id")).as("key"))
      .groupBy(col("domain"))
      .agg(graft.functions.topk_by_score(
        col("quality_score"), col("key"), cap).as("topk"))
      .select(col("domain"), posexplode(col("topk")))
      .select(col("col.key").cast("long").as("doc_id"), col("domain"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("quality_score"))
      .orderBy("domain", "rank")

  /** Cap for q_domain_cap — interpolated into the oracle (the
    * MinhashK can't-desynchronize pattern). At sf0.01 the hot domain
    * offers ~200 of the 500 docs and keeps exactly this many. */
  val DomainCap = 50

  /** Domain-level QUALITY ROLLUP over a (doc_id, url, quality_score)
    * frame — the dashboard a curation run publishes per registered
    * domain: doc count, corpus share in basis points, mean quality
    * (decimal-summed, order-free), and how many docs survive the
    * [[DomainCap]]. One keyed aggregate + a 1-row total broadcast;
    * presentation order (n_docs DESC, domain) ranks the Zipf head
    * first. */
  def domainStats(scored: DataFrame, cap: Int): DataFrame = {
    val g = scored
      .select(registeredDomain(urlCanonicalize(col("url"))).as("domain"),
        col("quality_score"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        Util.roundTo(
          sum(col("quality_score").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 4).as("avg_quality"))
    val t = g.agg(sum(col("n_docs")).as("total"))
    g.crossJoin(broadcast(t))
      .select(col("domain"), col("n_docs"),
        floor(lit(10000.0) * col("n_docs") / col("total")).cast("int")
          .as("share_bp"),
        col("avg_quality"),
        least(col("n_docs"), lit(cap.toLong)).as("kept_after_cap"))
      .orderBy(col("n_docs").desc, col("domain"))
  }

  // ---------------------------------------------------------------
  // Declared queries + oracles
  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact URL dedup after canonicalization: utm/fragment/case/
    // default-port twins collapse, content-bearing ports do not.
    "q_url_dedup" -> ((s, dir) =>
      urlDedup(Tables.documents(s, dir)
        .select(col("doc_id"), urlFixture(col("doc_id")).as("url")))),

    // Per-registered-domain share cap: top-DomainCap by quality.
    "q_domain_cap" -> ((s, dir) =>
      domainCap(
        TextOps.scoredDocs(Tables.documents(s, dir), withDigest = false)
          .select(col("doc_id"), col("quality_score"),
            urlFixture(col("doc_id")).as("url")),
        DomainCap)),

    // Domain-level quality rollup: the per-domain curation dashboard.
    "q_domain_stats" -> ((s, dir) =>
      domainStats(
        TextOps.scoredDocs(Tables.documents(s, dir), withDigest = false)
          .select(col("doc_id"), col("quality_score"),
            urlFixture(col("doc_id")).as("url")),
        DomainCap)))

  val oracle: Map[String, String] = Map(
    "q_url_dedup" ->
      s"""WITH $canonCteSql
         |SELECT min(doc_id) AS doc_id, url_canon, count(*) AS n_variants
         |FROM canon GROUP BY url_canon ORDER BY doc_id""".stripMargin,

    "q_domain_cap" ->
      s"""WITH ${TextOps.qualityCtesSql(withDigest = false)},
         |$canonCteSql,
         |dom AS (SELECT doc_id,
         |    ${registeredDomainSql("url_canon")} AS domain
         |  FROM canon),
         |j AS (SELECT u.doc_id, dom.domain, u.quality_score
         |  FROM u JOIN dom USING (doc_id)),
         |r AS (SELECT doc_id, domain, quality_score,
         |    CAST(row_number() OVER (PARTITION BY domain
         |      ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS rank
         |  FROM j)
         |SELECT doc_id, domain, rank, quality_score FROM r
         |WHERE rank <= $DomainCap ORDER BY domain, rank""".stripMargin,

    "q_domain_stats" ->
      s"""WITH ${TextOps.qualityCtesSql(withDigest = false)},
         |$canonCteSql,
         |dom AS (SELECT doc_id,
         |    ${registeredDomainSql("url_canon")} AS domain
         |  FROM canon),
         |j AS (SELECT dom.domain, u.quality_score
         |  FROM u JOIN dom USING (doc_id)),
         |g AS (SELECT domain, count(*) AS n_docs,
         |    ${Util.roundToSql(
            "CAST(SUM(CAST(quality_score AS DECIMAL(28,6))) AS DOUBLE)" +
              " / count(*)", 4)} AS avg_quality
         |  FROM j GROUP BY 1),
         |gt AS (SELECT sum(n_docs) AS total FROM g)
         |SELECT domain, n_docs,
         |  CAST(floor(10000.0 * n_docs / total) AS INTEGER) AS share_bp,
         |  avg_quality,
         |  LEAST(n_docs, $DomainCap) AS kept_after_cap
         |FROM g CROSS JOIN gt
         |ORDER BY n_docs DESC, domain""".stripMargin)
}
