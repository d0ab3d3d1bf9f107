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

  /** Compact PUBLIC SUFFIX LIST snapshot (VERDICT r14 #2 — the
    * last-two-labels simplification made every `*.co.uk` site one
    * "registered domain", so a per-domain cap throttled all UK sites
    * as one). PUBLIC DATA: the multi-label ICANN-section entries of
    * the Mozilla-maintained list at publicsuffix.org — the ccTLD
    * second/third-level suffixes a web crawl most commonly hits.
    * Single-label TLDs (.com/.org/…) need no entry: the default `*`
    * rule already yields last-two-labels for them. Deliberately a
    * SNAPSHOT, not the full ~9k-entry list (which includes the
    * private section and wildcard/exception rules): a production
    * deploy swaps this one constant for the full parsed list — the
    * lookup below is by-value and does not care about size. */
  val PslSuffixes: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "sch.uk", "nhs.uk",
    "police.uk", "me.uk", "ltd.uk", "plc.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "go.jp", "ed.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    // China / Taiwan / Hong Kong / Singapore
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // India / Pakistan / Bangladesh
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "res.in",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    // South Africa / Kenya / Nigeria
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    // Korea / Thailand / Indonesia / Malaysia / Vietnam / Philippines
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "my.id", "biz.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    // Turkey / Israel / Ukraine / Poland
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    // Latin America
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "co.ve", "net.ve", "org.ve", "edu.ve", "gob.ve",
    "com.ec", "com.uy", "com.py", "com.bo", "com.gt", "com.sv",
    "com.hn", "com.ni", "com.pa", "com.do", "com.pr",
    "co.cr", "ac.cr", "go.cr",
    // Middle East / North Africa
    "com.eg", "com.sa", "com.ae", "com.qa", "com.kw", "com.lb", "com.jo",
    // three-label entries (US k12/cc/lib pattern — exercises the
    // depth-3 arm of the lookup)
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.il.us", "k12.ma.us",
    "cc.ca.us", "lib.ca.us")

  /** Literal suffix → true lookup map — a codegen'd hash probe per
    * row, strictly cheaper than the broadcast join the r14 comment
    * promised (no build side, no join node, composes into streaming
    * plans). ~200 entries ≈ a few KB per task. */
  private val pslLookup: Column =
    typedlit(PslSuffixes.map(_ -> true).toMap)

  /** Registered domain of a CANONICAL url, PSL-backed: host minus
    * port, longest public suffix (3-, then 2-label snapshot entries,
    * else the default 1-label `*` rule) plus ONE label. A host that
    * IS a bare public suffix — or empty — has no registered domain:
    * "". `a.co.uk` and `b.co.uk` are DIFFERENT registered domains;
    * `x.com` still yields `x.com` (VERDICT r14 #2). */
  def registeredDomain(urlCanon: Column): Column = {
    // authority = [userinfo@]host[:port] — strip userinfo (greedy
    // `.*@`: RFC 3986 puts the LAST '@' before the host) and the
    // port before splitting into labels. The pre-r15 regex's
    // [A-Za-z0-9-] char class excluded '@' implicitly; the split
    // spelling must exclude it explicitly (ADVICE r15:
    // 'https://user@b.co.uk/x' must yield 'b.co.uk', not
    // 'user@b.co.uk').
    val host = regexp_replace(
      regexp_replace(regexp_extract(urlCanon, authRe, 1), "^.*@", ""),
      ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    // last k labels; slice(-k) on a shorter array yields [] →
    // array_join "" → never a PSL hit, so the n-guards are belt-and-
    // braces for readability, not correctness
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    def inPsl(k: Int): Column =
      try_element_at(pslLookup, lastK(k)).isNotNull
    val sufLen = when(n >= lit(3) && inPsl(3), lit(3))
      .when(n >= lit(2) && inPsl(2), lit(2))
      .otherwise(lit(1))
    when(host === "", lit(""))
      .when(n > sufLen,
        array_join(slice(labels, -(sufLen + lit(1)), sufLen + lit(1)), "."))
      .otherwise(lit(""))
  }

  /** DuckDB literal of [[PslSuffixes]] for the oracle twin. */
  private def pslListSql: String =
    PslSuffixes.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Oracle twin of [[registeredDomain]] as a CTE chain from
    * `$from(doc_id, url_canon)` ending in `dom(doc_id, domain)` —
    * the same longest-suffix walk over the same snapshot list. */
  private def domainCteSql(from: String): String =
    s"""psl AS (SELECT unnest($pslListSql) AS s),
       |dh AS (SELECT doc_id,
       |    regexp_replace(
       |      regexp_replace(regexp_extract(url_canon, '$authRe', 1),
       |        '^.*@', ''),
       |      ':[0-9]+$$', '') AS host
       |  FROM $from),
       |dl AS (SELECT doc_id, host, string_split(host, '.') AS ls,
       |    len(string_split(host, '.')) AS n
       |  FROM dh),
       |dsuf AS (SELECT doc_id, host, ls, n,
       |    CASE WHEN n >= 3 AND array_to_string(ls[n-2:n], '.')
       |           IN (SELECT s FROM psl) THEN 3
       |         WHEN n >= 2 AND array_to_string(ls[n-1:n], '.')
       |           IN (SELECT s FROM psl) THEN 2
       |         ELSE 1 END AS sl
       |  FROM dl),
       |dom AS (SELECT doc_id,
       |    CASE WHEN host = '' THEN ''
       |         WHEN n > sl THEN array_to_string(ls[n-sl:n], '.')
       |         ELSE '' END AS domain
       |  FROM dsuf)""".stripMargin

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
    * the Zipf head a per-domain cap must catch. The g % 5 = 2 arm
    * (site<N>.co.uk) is the PSL exercise: ~20% of docs across ~211
    * DISTINCT registered domains that the r14 last-two-labels rule
    * fused into one "co.uk" mega-domain (and hence mis-capped as
    * one). */
  def urlFixture(docId: Column): Column = {
    // exact for doc_id < 2^52 (the double-division band of every
    // id-derived fixture; oracle compare runs at sf0.01)
    val g = ((docId - pmod(docId, lit(3))) / lit(3)).cast("long")
    val gs = g.cast("string")
    val host = when(pmod(g, lit(5)) < 2, lit("news.hub-portal.com"))
      .when(pmod(g, lit(5)) === 2,
        concat(lit("site"), pmod(g, lit(211)).cast("string"), lit(".co.uk")))
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
      s"WHEN $g % 5 = 2 THEN 'site' || CAST($g % 211 AS VARCHAR) || '.co.uk' " +
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
         |${domainCteSql("canon")},
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
         |${domainCteSql("canon")},
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
