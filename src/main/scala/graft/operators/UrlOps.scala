package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-layer curation: canonicalization, URL-exact dedup keys, and
  * registered-domain extraction — the stage every web-scale corpus
  * pipeline (CCNet / C4 / RefinedWeb shape) leads with, because raw crawl
  * URLs for ONE page arrive in dozens of spellings (scheme/host case,
  * default ports, userinfo, fragments, tracking params, param order,
  * %-escape hex case) and domain-level stats/caps need a stable
  * "who published this" key.
  *
  * Everything here is a ROW-LOCAL string-expression pipeline over Spark's
  * built-in codegen'd functions (split / transform / filter / array_sort /
  * regexp) — no UDFs, no shuffle, no driver round-trips — so
  * canonicalization runs at scan speed on 100 TB and every step is
  * replayable as plain SQL by any engine (the DuckDB oracles replay it
  * verbatim). Normalizations applied, in order:
  *
  *   1. trim; strip the `#fragment` (never sent to servers);
  *   2. lowercase the scheme; strip `user:pw@` userinfo;
  *   3. lowercase the host; strip the leading `(www.)+` run while >= 2
  *      labels remain (www.com keeps its dot); strip the port when it is
  *      the scheme default (http:80 / https:443);
  *   4. uppercase the hex of `%xx` escapes (RFC 3986 §6.2.2.1) in path and
  *      query — non-hex chunks after `%` are left untouched;
  *   5. collapse all trailing `/` from the path (`/a//` ≡ `/a/` ≡ `/a`;
  *      bare `/` → ``);
  *   6. drop tracking params (explicit list + `utm_*`), drop empty params,
  *      and SORT the survivors — param order never changes server routing,
  *      and sorting makes `?a=1&b=2` ≡ `?b=2&a=1`.
  *
  * The canonical form is a FIXED POINT: `canonicalizeUrl` is idempotent
  * (canon ∘ canon = canon, property-fuzzed in UrlProps over messy inputs
  * including repeated `www.`, stacked trailing slashes, embedded absolute
  * URLs in kept params, and malformed escapes) — so re-canonicalizing an
  * already-clean corpus is a safe no-op, which is what makes incremental
  * ingest joins against stored canonical keys sound.
  *
  * Deliberate non-goals, documented so the contract is explicit: no
  * punycode (an IDN host must arrive already `xn--`-encoded — it is then
  * lowercased and deduped correctly; real punycode needs a Unicode table,
  * not a string expression), no %-DEcoding (decoding changes which
  * characters are delimiters; hex-case folding alone is always safe), no
  * path `.`/`..` resolution (crawlers emit resolved paths), and
  * `http`/`https` stay distinct schemes (collapse them upstream if a
  * pipeline wants scheme-blind dedup).
  *
  * Reference surface: the candy pipeline has no URL layer (its sources are
  * JSON/CSV/JDBC, `reference/src/data_processor.py:1-120`) — this family
  * is part of the training-data extensions the engine adds on top.
  */
object UrlOps {

  /** Query parameters that never affect content: ad-click and social
    * tracking ids. `utm_*` is matched as a prefix family separately.
    * The bare `ref` is deliberately NOT listed: some real sites route
    * content on it (`?ref=docs` vs `?ref=blog` can be different pages),
    * so dropping it would collapse genuinely distinct pages into one
    * dedup key. `ref_src` (a pure share-tracking tag) stays.
    */
  val TrackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "yclid", "ref_src")

  /** Multi-label public suffixes under which the registered domain is the
    * LAST THREE host labels, not two. An explicit list (the curated-subset
    * approach C4/CCNet-style pipelines take), not the full Mozilla PSL —
    * the list is data, extend it per corpus.
    */
  val MultiLevelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.in", "co.nz",
      "co.kr", "com.au", "com.br", "com.cn", "com.mx", "github.io")

  /** Column-level let-binding (the [[Dedup.letBind]] idiom): evaluate
    * `bound` ONCE per row and reference it as a cheap lambda variable in
    * `body`. Without this, every Scala `val` holding a Column is INLINED
    * at each reference site — the canonicalizer's chained derivations
    * (u → rest → authority → host/port/path/query) would otherwise
    * duplicate multiplicatively into a megabyte expression tree that
    * downstream operators then re-duplicate per reference (measured:
    * 39.9 s for the 5000-doc q_sp13 before this structure; sub-second
    * after).
    */
  private def bind(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Uppercase the two hex chars of every `%xx` escape; chunks after `%`
    * that do not start with two hex chars (malformed escapes) pass through
    * unchanged. split keeps trailing empties in both Spark and DuckDB, so
    * join(split(s)) round-trips exactly.
    */
  private[operators] def pctHexUpper(c: Column): Column =
    array_join(
      transform(split(c, "%", -1), (x, i) =>
        when(i === 0, x)
          .when(x.rlike("^[0-9a-fA-F]{2}"),
            concat(upper(x.substr(lit(1), lit(2))),
              x.substr(lit(3), greatest(length(x) - 2, lit(0)))))
          .otherwise(x)),
      "%")

  /** Canonical form of an absolute `scheme://...` URL (see object doc for
    * the normalization list). Input without `://` is returned trimmed and
    * fragment-stripped only — a relative reference has no authority to
    * normalize, and guessing one would corrupt non-URL strings.
    */
  def canonicalizeUrl(url: Column): Column =
    // each derivation [[bind]]s before reuse: u → rest → authority →
    // (scheme, userinfo-stripped auth, pathq) → (host, port) → assembly —
    // every stage evaluates once per row regardless of fan-out below it
    bind(substring_index(trim(url), "#", 1)) { u =>
      bind(u.substr(instr(u, "://") + 3, lit(Int.MaxValue))) { rest =>
        bind(regexp_extract(rest, "^[^/?]*", 0)) { auth0 =>
          bind(struct(
              lower(substring_index(u, "://", 1)).as("scheme"),
              regexp_extract(auth0, "[^@]*$", 0).as("auth"), // strip userinfo
              rest.substr(length(auth0) + 1, lit(Int.MaxValue)).as("pathq"))) { s1 =>
            val scheme = s1.getField("scheme")
            val auth = s1.getField("auth")
            val pathq = s1.getField("pathq")
            // bracketed IPv6 hosts carry ':' INSIDE the brackets, so the
            // host/port split keys on the bracket ("[2001:db8::1]:8080")
            val bracketed = auth.startsWith("[")
            bind(struct(
                // `www.` strips only while >= 2 labels remain: the
                // registrable host www.com must NOT collapse to the bare
                // TLD "com". The FULL `(www.)+` run strips at once (so
                // www.www.example.com canonicalizes in one pass — the
                // canonical form must be a FIXED POINT of this function,
                // UrlProps pins canon∘canon = canon); when stripping the
                // whole run would leave a dotless label, exactly one
                // `www.` is kept back (www.www.com → www.com, itself a
                // fixed point). Guard + replace, no lookaheads: RE2-safe.
                bind(lower(when(bracketed, regexp_extract(auth, "^\\[[^\\]]*\\]", 0))
                    .otherwise(substring_index(auth, ":", 1)))) { h0 =>
                  bind(regexp_replace(h0, "^(www\\.)+", "")) { h1 =>
                    when(h1.contains("."), h1)
                      .when(h0.rlike("^www\\."), concat(lit("www."), h1))
                      .otherwise(h0)
                  }
                }.as("host"),
                when(bracketed, regexp_extract(auth, "\\]:([0-9]+)$", 1))
                  .otherwise(when(instr(auth, ":") > 0, substring_index(auth, ":", -1))
                    .otherwise(lit(""))).as("port"))) { s2 =>
              val port = s2.getField("port")
              val portPart = when(
                port === "" || (scheme === "http" && port === "80") ||
                  (scheme === "https" && port === "443"),
                lit("")).otherwise(concat(lit(":"), port))
              // ALL trailing slashes collapse (not just one): idempotence
              // again — /a// must canonicalize to /a in one pass, not /a/
              val path = regexp_replace(
                pctHexUpper(substring_index(pathq, "?", 1)), "/+$", "")
              val query = when(instr(pathq, "?") > 0,
                pctHexUpper(pathq.substr(instr(pathq, "?") + 1, lit(Int.MaxValue))))
                .otherwise(lit(""))
              val queryPart = bind(array_sort(filter(split(query, "&", -1), p =>
                  p =!= "" && !substring_index(p, "=", 1).rlike("^utm_") &&
                    !substring_index(p, "=", 1).isin(TrackingParams: _*)))) { kept =>
                when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
                  .otherwise(lit(""))
              }
              when(instr(u, "://") > 0,
                concat(scheme, lit("://"), s2.getField("host"), portPart,
                  path, queryPart))
                .otherwise(u)
            }
          }
        }
      }
    }

  /** Host of a CANONICAL URL (apply [[canonicalizeUrl]] first — this does
    * not re-strip userinfo/case). Handles path-less `?query` forms and
    * bracketed IPv6 authorities.
    *
    * Anchors on the FIRST `://`, exactly as [[canonicalizeUrl]] parses:
    * a canonical URL can still carry an embedded absolute URL in a kept
    * query value (redirect params like `?u=https://other.com/x` — the
    * canonicalizer never percent-encodes), and splitting on the LAST
    * `://` would attribute the doc to the EMBEDDED host — letting a
    * blocked domain evade [[domainListFilter]] by appending
    * `?x=https://allowed.com`. Scheme-less input (a relative reference
    * passed through canonicalization untouched) is read from position 1.
    */
  def hostOf(canonicalUrl: Column): Column =
    bind(canonicalUrl) { u =>
      bind(regexp_extract(
          u.substr(when(instr(u, "://") > 0, instr(u, "://") + 3).otherwise(lit(1)),
            lit(Int.MaxValue)),
          "^[^/?]*", 0)) { auth =>
        when(auth.startsWith("["), regexp_extract(auth, "^\\[[^\\]]*\\]", 0))
          .otherwise(substring_index(auth, ":", 1))
      }
    }

  /** Registered (pay-level) domain of a lowercase host: last two labels,
    * or last three when the two-label suffix is in [[MultiLevelSuffixes]]
    * (`news.bbc.co.uk` → `bbc.co.uk`, `a.b.example.com` → `example.com`).
    * Hosts with fewer labels than that (bare TLDs, `localhost`) pass
    * through whole. IP literals are returned whole as well — dots in an
    * IPv4 are not label separators semantically, and slicing them would
    * merge unrelated hosts (`10.0.0.1` and `20.0.0.1` both → `0.1`).
    */
  def registeredDomain(host: Column): Column =
    bind(host) { h =>
      bind(split(h, "\\.", -1)) { labels =>
        bind(concat_ws(".", slice(labels, -2, 2))) { suffix2 =>
          when(h.rlike("^[0-9.]+$") || h.startsWith("["), h) // IP literal (v4 / bracketed v6)
            .when(size(labels) >= 3 && suffix2.isin(MultiLevelSuffixes: _*),
              concat_ws(".", slice(labels, -3, 3)))
            .when(size(labels) >= 2, suffix2)
            .otherwise(h)
        }
      }
    }

  /** URL-exact dedup: group on the canonical key, keep the smallest id per
    * page (first-crawled under monotone ids — any deterministic best-first
    * rule slots in via a different agg). ONE shuffle on the canonical key;
    * at 100 TB this is the cheapest dedup stage a pipeline has, which is
    * why it runs first, before any content hashing.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_variants"), min(col(idCol)).as("keeper_" + idCol))

  /** Recrawl (CDX-shape) dedup: keep the LATEST capture of each canonical
    * page — max timestamp, smallest id on ties. Same single canonical-key
    * shuffle as [[urlDedup]]; the keeper pair travels as one max_by struct
    * so the agg needs no second pass or window. This is the freshness
    * rule a crawl-archive ingest runs where [[urlDedup]]'s min-id rule is
    * the stability rule.
    */
  def urlDedupLatest(df: DataFrame, urlCol: String, tsCol: String,
                     idCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_captures"),
        max_by(struct(col(tsCol).as("ts"), col(idCol).as("id")),
          // max_by on (ts, -id): latest capture, smallest id on ts ties —
          // negation keeps the tie rule inside ONE ordered struct key
          struct(col(tsCol), (-col(idCol)).as("_negid"))).as("_k"))
      .select(col("canonical_url"), col("n_captures"),
        col("_k.ts").as("kept_ts"), col("_k.id").as("kept_" + idCol))

  /** Domain blocklist / allowlist filtering (the UT1-blocklist stage of a
    * CCNet/RefinedWeb-shape pipeline): drop (or keep) docs whose
    * REGISTERED domain appears in the list. Matching at the registered
    * domain collapses subdomains for free — blocking `example.org` blocks
    * `cdn.example.org` because both resolve to the same pay-level key.
    *
    * The list rides as a DataFrame because real blocklists are
    * 10^5-10^6 domains — too large for an `isin` literal but far below
    * the broadcast threshold, so the anti/semi join broadcasts and the
    * corpus never shuffles. `allow = true` flips to allowlist (left-semi).
    */
  def domainListFilter(df: DataFrame, urlCol: String, domains: DataFrame,
                       allow: Boolean = false): DataFrame = {
    val listed = broadcast(domains.toDF("_blocked_domain").distinct())
    val keyed = df.withColumn("_rd",
      registeredDomain(hostOf(canonicalizeUrl(col(urlCol)))))
    keyed.join(listed, keyed("_rd") === listed("_blocked_domain"),
        if (allow) "left_semi" else "left_anti")
      .drop("_rd")
  }

  /** Per-registered-domain mass profile of a corpus: doc count, token
    * mass, and exact integer parts-per-million doc share. One group-key
    * shuffle plus a broadcast of the 1-row total — the table a pipeline
    * reads before deciding domain caps and mixing weights.
    */
  def domainStats(df: DataFrame, urlCol: String, tokensCol: String): DataFrame = {
    val perDomain = df
      .withColumn("domain", registeredDomain(hostOf(canonicalizeUrl(col(urlCol)))))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
    perDomain
      .crossJoin(broadcast(perDomain.select(sum("n_docs").as("_total"))))
      .withColumn("doc_share_ppm", expr("(n_docs * 1000000) div _total"))
      .drop("_total")
  }
}
