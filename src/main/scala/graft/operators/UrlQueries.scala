package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing queries for the URL/domain curation layer ([[UrlOps]]).
  *
  * The documents table has no URL column, so each query PLANTS one
  * deterministically (the q_d9/q_v16 in-query planting discipline): page
  * id `g = doc_id div 3` and variant `v = doc_id % 3` construct three
  * messy spellings of the same page URL — scheme/host case, `www.`,
  * default `:443` port, userinfo, a `#fragment`, `%2f` vs `%2F`, a
  * trailing slash, shuffled param order, and `utm_`/`gclid` tracking
  * params. Every messiness axis the canonicalizer claims to fold is
  * exercised by construction.
  *
  * The oracles do NOT replay the canonicalizer: because the planting is
  * synthetic, the canonical form is known ANALYTICALLY
  * (`https://<host>/a/x%2Fy/item-g?a=1&b=2&id=g&u=https://...`), so DuckDB derives
  * ground truth directly from `g` — a bug shared by the Spark
  * canonicalizer and a replayed oracle copy cannot slip through, the
  * Spark side must actually fold all three variants to byte-identical
  * keys to match.
  */
object UrlQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  private val tokensSql = "filter(split(text, ' '), x -> x != '')"
  private val duckTokens = "list_filter(string_split(text, ' '), x -> x != '')"
  private val mixSeed = "graft-url-mix-11"
  private val mixTarget = 300L

  /** The five planted hosts (indexed by `g % 5`) and, aligned by index,
    * their registered domains — `shop.example.com` collapses into
    * `example.com`, and `news.example.co.uk` keeps three labels via the
    * multi-level-suffix list.
    */
  private[graft] val hosts = Seq("example.com", "news.example.co.uk",
    "blog.example.org", "shop.example.com", "docs.example.io")
  private[graft] val hostDomains = Seq("example.com", "example.co.uk",
    "example.org", "example.com", "example.io")

  /** Messy planted URL per doc (see object doc). All variants share the
    * canonical form; none is spelled canonically.
    *
    * Every variant also carries a KEPT redirect-style param whose value is
    * an embedded absolute URL (`u=https://embedded.example.net/zz`) — the
    * blocklist-evasion shape from real crawls. It survives
    * canonicalization (kept params are never %-encoded), so any host
    * extraction that keys on the LAST `://` would attribute every doc to
    * `example.net` and fail the q_u2/q_u3/q_u4/q_sp13 analytic oracles.
    */
  private[graft] val embeddedParam = "u=https://embedded.example.net/zz"

  private[graft] def withMessyUrl(d: DataFrame): DataFrame = {
    val g = expr("doc_id div 3")
    val v = expr("doc_id % 3")
    val domain = element_at(array(hosts.map(lit): _*), (pmod(g, lit(5)) + 1).cast("int"))
    val gs = g.cast("string")
    val path = concat(lit("/a/x%2"), when(v === 1, lit("F")).otherwise(lit("f")),
      lit("y/item-"), gs)
    val url = when(v === 0,
        concat(lit("https://"), domain, path, lit("?id="), gs,
          lit(s"&utm_source=feed&b=2&$embeddedParam&a=1")))
      .when(v === 1,
        concat(lit("HTTPS://WWW."), upper(domain), lit(":443"), path,
          lit("?a=1&b=2&id="), gs, lit(s"&$embeddedParam#frag")))
      .otherwise(
        concat(lit("https://user:pw@"), domain, path, lit("/?b=2&a=1&id="), gs,
          lit(s"&gclid=abc123&$embeddedParam")))
    d.withColumn("url", url)
  }

  /** DuckDB twin of [[withMessyUrl]]'s page-id/domain derivation. */
  private def duckPages(domains: Seq[String]) = {
    val arr = domains.map(h => s"'$h'").mkString("[", ", ", "]")
    s"""SELECT doc_id, text, n_chars, doc_id // 3 AS g,
       |       ($arr)[CAST((doc_id // 3) % 5 AS INTEGER) + 1] AS domain
       |FROM documents""".stripMargin
  }

  private val duckCanonical =
    "'https://' || domain || '/a/x%2Fy/item-' || g || " +
      s"'?a=1&b=2&id=' || g || '&$embeddedParam'"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // URL canonicalization + URL-exact dedup: the three messy spellings of
    // each page must fold to ONE canonical key (count 3), keeper = min id.
    "q_u1_url_canonical_dedup" -> ((s, dir) =>
      UrlOps.urlDedup(withMessyUrl(docs(s, dir)), "url", "doc_id")
        .orderBy("canonical_url")),

    // Registered-domain mass profile: canonical host -> pay-level domain
    // (multi-level suffixes respected), per-domain doc count, token mass,
    // and exact integer ppm doc share.
    "q_u2_domain_stats" -> ((s, dir) =>
      UrlOps.domainStats(
          withMessyUrl(docs(s, dir))
            .withColumn("n_tokens", expr(s"CAST(size($tokensSql) AS BIGINT)")),
          "url", "n_tokens")
        .orderBy("domain")),

    // Domain capping: at most 100 docs per registered domain, longest
    // first (the "no single site dominates" guard) — capPerGroup's
    // one-shuffle window rank, grouped here on the derived domain.
    "q_u3_domain_cap" -> ((s, dir) =>
      Pipeline.capPerGroup(
          UrlOps.withRegisteredDomain(withMessyUrl(docs(s, dir)), "url"),
          "domain", Seq(col("n_chars").desc, col("doc_id")), 100)
        .select("domain", "doc_id", "n_chars")
        .orderBy("domain", "doc_id")),

    // Domain blocklist filtering (the UT1-blocklist stage): a planted
    // 2-domain blocklist broadcast-anti-joins on the REGISTERED domain,
    // so subdomains of a blocked domain drop with it and the corpus never
    // shuffles. Survivors keep their derived domain for inspection.
    "q_u4_domain_blocklist" -> ((s, dir) => {
      import s.implicits._
      UrlOps.withRegisteredDomain(
          UrlOps.domainListFilter(withMessyUrl(docs(s, dir)), "url",
            Seq("example.org", "example.io").toDF("domain")),
          "url")
        .select("doc_id", "domain")
        .orderBy("doc_id")
    }),

    // IDN-aware domain blocklisting (r11 VERDICT #4): hosts planted by
    // doc_id % 7 — an `xn--` spelling blocked by its UNICODE list entry
    // (1: xn--bcher-kva.com vs listed bücher.com), a unicode-listed
    // domain blocked from a PUNYCODED list entry through a subdomain
    // (2: shop.xn--caf-dma.org vs listed xn--caf-dma.org), an ASCII
    // lookalike that must NOT over-block (3: bucher.com), and a
    // MALFORMED xn-- label that stays opaque yet still matches its own
    // raw spelling (4: xn--zzz-.com). Both sides normalize through ONE
    // RFC 3492 decode (url_idn_host); the oracle is pure doc_id
    // arithmetic — the expected keep-set is known by construction, so a
    // decoder bug in either direction fails the hash.
    "q_u6_idn_blocklist" -> ((s, dir) => {
      import s.implicits._
      val planted = docs(s, dir).withColumn("url",
        concat(lit("https://"),
          when(col("doc_id") % 7 === 1, lit("xn--bcher-kva.com"))
            .when(col("doc_id") % 7 === 2, lit("shop.xn--caf-dma.org"))
            .when(col("doc_id") % 7 === 3, lit("bucher.com"))
            .when(col("doc_id") % 7 === 4, lit("xn--zzz-.com"))
            .otherwise(lit("kept.example.net")),
          lit("/p/"), col("doc_id")))
      UrlOps.withRegisteredDomain(
          UrlOps.domainListFilter(planted, "url",
            Seq("bücher.com", "xn--caf-dma.org", "xn--zzz-.com")
              .toDF("domain")),
          "url")
        .select("doc_id", "domain")
        .orderBy("doc_id")
    }),

    // ROBOTS.TXT governance (round 13): one hostile-formatted robots body
    // per host — comments, mixed-case directives, \r line ends, unknown
    // directives, and a second agent group after rules — parsed by the
    // RFC 9309 grammar, then longest-prefix-match verdicts for agent
    // GraftBot. The PARSER is load-bearing: the oracle derives rules
    // from the construction arithmetic, never parsing — a trim/case/
    // comment/group-reset bug diverges. Planted path classes exercise
    // Allow-beats-shorter-Disallow, the tie rule, group exclusivity
    // (graftbot hosts ignore the * /private rule), and the no-match
    // default-allow.
    "q_u7_robots_filter" -> ((s, dir) => {
      val bodyExpr =
        "concat('# robots for graft\n', 'User-AGENT: *'," +
          " CASE WHEN k % 3 = 0 THEN '\r\n' ELSE '\n' END," +
          " CASE WHEN k % 2 = 0 AND k < 4 THEN 'Disallow: /page/1  # hot\n'" +
          " ELSE '' END," +
          " 'disallow: /private\n', 'Allow: /private/ok\n'," +
          " 'Crawl-delay: 5\n'," +
          " CASE WHEN k >= 4 THEN" +
          " 'User-agent: GraftBot\nDisallow: /page/2\nAllow: /page/2/\n'" +
          " ELSE '' END)"
      val robots = s.range(7).toDF("k")
        .selectExpr("concat('h.ex', k, '.net') AS host", s"$bodyExpr AS body")
      val urls = docs(s, dir).selectExpr("doc_id",
        "concat('h.ex', doc_id % 7, '.net') AS host",
        """CASE CAST(doc_id % 5 AS INT)
          |  WHEN 0 THEN '/page/1'
          |  WHEN 1 THEN '/page/2'
          |  WHEN 2 THEN '/page/2/sub'
          |  WHEN 3 THEN concat('/private/doc', doc_id)
          |  ELSE '/private/ok/x' END AS path""".stripMargin)
      UrlOps.robotsVerdicts(urls,
          UrlOps.parseRobots(robots, "host", "body"),
          agent = "GraftBot", idCol = "doc_id", hostCol = "host",
          pathCol = "path")
        .select(col("doc_id"), col("host"), col("path"),
          col("allowed").cast("int").as("allowed"), col("match_len"))
        .orderBy("doc_id")
    }),

    // ROBOTS.TXT wildcards (round 14, r13 ADVICE): RFC 9309 §2.2.3
    // special characters — `*` (any sequence) and trailing `$` (end
    // anchor) — plus §2.2.1 product-token agent matching: the group line
    // says `GraftBot/2.1`, the crawler is configured as plain `graftbot`.
    // Every host also carries a `User-agent: *` Disallow-all group, so
    // group exclusivity failing (or wildcard rules matching literally,
    // the pre-fix behavior) flips verdicts corpus-wide. Path classes:
    // mid-`*` with a query (`/*?sessionid=`), end-anchored suffix match
    // (`/tmp/*.html$`), a longer Allow beating it, an anchor REJECT
    // (`.htmlx` must not match `.html$`), and the no-match default.
    "q_u8_robots_wildcards" -> ((s, dir) => {
      val bodyExpr =
        "concat('User-agent: GraftBot/2.1\n'," +
          " 'Disallow: /*?sessionid=\n'," +
          " 'Disallow: /tmp/*.html$\n'," +
          " 'Allow: /tmp/keep*.html$\n'," +
          " 'User-agent: *\nDisallow: /\n')"
      val robots = s.range(4).toDF("k")
        .selectExpr("concat('w.ex', k, '.net') AS host", s"$bodyExpr AS body")
      val urls = docs(s, dir).selectExpr("doc_id",
        "concat('w.ex', doc_id % 4, '.net') AS host",
        """CASE CAST(doc_id % 5 AS INT)
          |  WHEN 0 THEN '/page?sessionid=abc'
          |  WHEN 1 THEN '/tmp/a.html'
          |  WHEN 2 THEN '/tmp/keep1.html'
          |  WHEN 3 THEN '/tmp/a.htmlx'
          |  ELSE '/page?other=1' END AS path""".stripMargin)
      UrlOps.robotsVerdicts(urls,
          UrlOps.parseRobots(robots, "host", "body"),
          agent = "graftbot", idCol = "doc_id", hostCol = "host",
          pathCol = "path")
        .select(col("doc_id"), col("host"), col("path"),
          col("allowed").cast("int").as("allowed"), col("match_len"))
        .orderBy("doc_id")
    }),

    // ROBOTS POLITENESS surface (round 14): crawl-delay with the group-
    // exclusivity rule and sitemap extraction — the fetch scheduler's
    // inputs beside q_u7's allow/deny verdicts. Host classes: k%5=0
    // declares a GraftBot group WITHOUT a delay (the `*` delay must NOT
    // leak through the explicit group → null), k even adds a GraftBot
    // delay, everything else falls back to `*`; k%3=0 hosts declare two
    // sitemaps. Pure k arithmetic oracle — no parsing oracle-side.
    "q_u9_crawl_delay" -> ((s, dir) => {
      val bodyExpr =
        "concat('User-agent: *\nCrawl-delay: ', CAST(k % 7 + 1 AS STRING)," +
          " '\nDisallow: /private\n'," +
          " CASE WHEN k % 5 = 0 THEN 'User-agent: GraftBot\nDisallow: /x\n'" +
          " WHEN k % 2 = 0 THEN concat('User-agent: GraftBot/3.1\n'," +
          "   'Crawl-delay: ', CAST(k % 3 + 10 AS STRING), '\nDisallow: /y\n')" +
          " ELSE '' END," +
          " CASE WHEN k % 3 = 0 THEN" +
          " concat('Sitemap: https://d.ex', CAST(k AS STRING), '.net/a.xml\n'," +
          "        'Sitemap: https://d.ex', CAST(k AS STRING), '.net/b.xml\n')" +
          " ELSE '' END)"
      val robots = s.range(40).toDF("k")
        .selectExpr("concat('d.ex', k, '.net') AS host", s"$bodyExpr AS body")
      val rules = UrlOps.parseRobots(robots, "host", "body")
      UrlOps.crawlDelays(rules, "graftbot")
        .join(UrlOps.sitemaps(rules).groupBy("host")
            .agg(count(lit(1)).as("n_sitemaps")),
          Seq("host"), "left")
        .select(col("host"), col("crawl_delay_s"),
          coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"))
        .orderBy("host")
    }),

    // Recrawl keep-latest dedup (the CDX-archive freshness rule): each
    // page's three messy variants carry a planted capture day
    // (doc_id % 97 — consecutive ids give distinct days, so the winner is
    // unique and the min-id tie rule is still exercised at the 97
    // wrap-around where two of a page's ids can collide). Keeper = max
    // day, min id on ties; ONE canonical-key shuffle via max_by.
    "q_u5_url_dedup_latest" -> ((s, dir) =>
      UrlOps.urlDedupLatest(
          withMessyUrl(docs(s, dir))
            .withColumn("fetch_day", expr("CAST(doc_id % 97 AS BIGINT)")),
          "url", "fetch_day", "doc_id")
        .orderBy("canonical_url")),

    // Domain-aware mixing (DoReMi-lite / CCNet shape): temperature-mix at
    // alpha = 0.5 over the REGISTERED DOMAIN — caps derived from per-domain
    // counts (∝ sqrt(c): upsamples rare domains vs proportional), exact
    // scaled-long cap arithmetic, seeded-md5 selection order. The
    // composition receipt for UrlOps ∘ temperatureMix.
    "q_sp13_domain_mix" -> ((s, dir) =>
      Pipeline.temperatureMix(
          UrlOps.withRegisteredDomain(withMessyUrl(docs(s, dir)), "url"),
          "domain", "doc_id", totalTarget = mixTarget, alpha = 0.5, seed = mixSeed)
        .select("domain", "sample_rank", "doc_id")
        .orderBy("domain", "sample_rank"))
  )

  val oracles: Map[String, String] = Map(
    "q_u1_url_canonical_dedup" ->
      s"""WITH pages AS (${duckPages(hosts)})
         |SELECT $duckCanonical AS canonical_url,
         |       count(*) AS n_variants,
         |       min(doc_id) AS keeper_doc_id
         |FROM pages GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_u2_domain_stats" ->
      s"""WITH pages AS (${duckPages(hostDomains)}),
         |per AS (
         |  SELECT domain, count(*) AS n_docs,
         |         CAST(sum(len($duckTokens)) AS BIGINT) AS n_tokens
         |  FROM pages GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM per)
         |SELECT domain, n_docs, n_tokens,
         |       (n_docs * 1000000) // total AS doc_share_ppm
         |FROM per, tot ORDER BY domain""".stripMargin,

    "q_u3_domain_cap" ->
      s"""WITH pages AS (${duckPages(hostDomains)})
         |SELECT domain, doc_id, n_chars FROM (
         |  SELECT domain, doc_id, n_chars,
         |         row_number() OVER (PARTITION BY domain
         |                            ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM pages)
         |WHERE rk <= 100 ORDER BY domain, doc_id""".stripMargin,

    "q_u4_domain_blocklist" ->
      s"""WITH pages AS (${duckPages(hostDomains)})
         |SELECT doc_id, domain FROM pages
         |WHERE domain NOT IN ('example.org', 'example.io')
         |ORDER BY doc_id""".stripMargin,

    // pure doc_id arithmetic: k = host index, v = path class; the
    // expected verdict and matched-prefix length per (k-regime, v) cell
    // are known by construction — no robots parsing runs oracle-side
    "q_u7_robots_filter" ->
      """WITH u AS (
        |  SELECT doc_id, doc_id % 7 AS k, CAST(doc_id % 5 AS INT) AS v,
        |         'h.ex' || CAST(doc_id % 7 AS VARCHAR) || '.net' AS host,
        |         CASE CAST(doc_id % 5 AS INT)
        |           WHEN 0 THEN '/page/1'
        |           WHEN 1 THEN '/page/2'
        |           WHEN 2 THEN '/page/2/sub'
        |           WHEN 3 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
        |           ELSE '/private/ok/x' END AS path
        |  FROM documents)
        |SELECT doc_id, host, path,
        |       CAST(CASE WHEN k < 4 THEN
        |              CASE v WHEN 0 THEN CASE WHEN k % 2 = 0 THEN 0 ELSE 1 END
        |                     WHEN 3 THEN 0 ELSE 1 END
        |            ELSE CASE v WHEN 1 THEN 0 ELSE 1 END END AS INTEGER)
        |         AS allowed,
        |       CAST(CASE WHEN k < 4 THEN
        |              CASE v WHEN 0 THEN CASE WHEN k % 2 = 0 THEN 7 ELSE 0 END
        |                     WHEN 3 THEN 8 WHEN 4 THEN 11 ELSE 0 END
        |            ELSE CASE v WHEN 1 THEN 7 WHEN 2 THEN 8 ELSE 0 END END
        |            AS INTEGER) AS match_len
        |FROM u ORDER BY doc_id""".stripMargin,

    // pure doc_id arithmetic: every (path-class) cell's verdict and
    // matched-rule length are known by construction — no robots parsing
    // or wildcard matching runs oracle-side, so a regex-compile or
    // token-match bug cannot be shared
    "q_u8_robots_wildcards" ->
      """WITH u AS (
        |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS v,
        |         'w.ex' || CAST(doc_id % 4 AS VARCHAR) || '.net' AS host,
        |         CASE CAST(doc_id % 5 AS INT)
        |           WHEN 0 THEN '/page?sessionid=abc'
        |           WHEN 1 THEN '/tmp/a.html'
        |           WHEN 2 THEN '/tmp/keep1.html'
        |           WHEN 3 THEN '/tmp/a.htmlx'
        |           ELSE '/page?other=1' END AS path
        |  FROM documents)
        |SELECT doc_id, host, path,
        |       CAST(CASE v WHEN 0 THEN 0 WHEN 1 THEN 0 ELSE 1 END
        |            AS INTEGER) AS allowed,
        |       CAST(CASE v WHEN 0 THEN 13 WHEN 1 THEN 12 WHEN 2 THEN 16
        |                   ELSE 0 END AS INTEGER) AS match_len
        |FROM u ORDER BY doc_id""".stripMargin,

    // pure k arithmetic: the exclusivity rule (k%5=0 → NULL despite the
    // declared `*` delay), the agent delay, the star fallback, and the
    // sitemap counts all replay without parsing
    "q_u9_crawl_delay" ->
      """SELECT 'd.ex' || CAST(k AS VARCHAR) || '.net' AS host,
        |       CASE WHEN k % 5 = 0 THEN NULL
        |            WHEN k % 2 = 0 THEN CAST(k % 3 + 10 AS DOUBLE)
        |            ELSE CAST(k % 7 + 1 AS DOUBLE) END AS crawl_delay_s,
        |       CAST(CASE WHEN k % 3 = 0 THEN 2 ELSE 0 END AS BIGINT)
        |         AS n_sitemaps
        |FROM generate_series(0, 39) t(k) ORDER BY host""".stripMargin,

    // pure doc_id arithmetic: the keep-set and each survivor's registered
    // domain are known by construction — no decoder runs oracle-side
    "q_u6_idn_blocklist" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 3 THEN 'bucher.com'
        |            ELSE 'example.net' END AS domain
        |FROM documents WHERE doc_id % 7 NOT IN (1, 2, 4)
        |ORDER BY doc_id""".stripMargin,

    // analytic canonical key per page; the winner replayed relationally
    // over the trivially-planted capture-day arithmetic
    "q_u5_url_dedup_latest" ->
      s"""WITH pages AS (${duckPages(hosts)}),
         |r AS (
         |  SELECT $duckCanonical AS canonical_url,
         |         doc_id % 97 AS fetch_day, doc_id,
         |         count(*) OVER (PARTITION BY g) AS n_captures,
         |         row_number() OVER (PARTITION BY g
         |           ORDER BY doc_id % 97 DESC, doc_id) AS rk
         |  FROM pages)
         |SELECT canonical_url, n_captures, fetch_day AS kept_ts,
         |       doc_id AS kept_doc_id
         |FROM r WHERE rk = 1 ORDER BY canonical_url""".stripMargin,

    "q_sp13_domain_mix" ->
      s"""WITH pages AS (${duckPages(hostDomains)}),
         |c AS (SELECT domain, count(*) AS c FROM pages GROUP BY 1),
         |w AS (SELECT domain, CAST(round(sqrt(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS w6 FROM c),
         |tot AS (SELECT sum(w6) AS tw6 FROM w),
         |caps AS (SELECT domain, ($mixTarget * w6) // tw6 AS cap FROM w, tot),
         |ranked AS (
         |  SELECT p.domain, p.doc_id, caps.cap,
         |         CAST(row_number() OVER (
         |           PARTITION BY p.domain
         |           ORDER BY md5('$mixSeed:' || CAST(p.doc_id AS VARCHAR)),
         |                    p.doc_id) AS INTEGER) AS sample_rank
         |  FROM pages p JOIN caps ON p.domain = caps.domain)
         |SELECT domain, sample_rank, doc_id
         |FROM ranked WHERE sample_rank <= cap
         |ORDER BY domain, sample_rank""".stripMargin
  )
}
