package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions._

/** Property fuzz of URL canonicalization: for ANY messy absolute URL the
  * generator can compose — mixed scheme/host case, repeated `www.`
  * prefixes, userinfo, default and non-default ports, stacked trailing
  * slashes, valid and malformed %-escapes, shuffled/tracking/empty query
  * params, embedded absolute URLs in kept param values, fragments —
  *
  *   1. canonicalization is IDEMPOTENT: canon(canon(u)) == canon(u)
  *      (the canonical form is a fixed point, so re-canonicalizing a
  *      stored corpus is a no-op and incremental joins on canonical keys
  *      are sound), and
  *   2. the host attribution is stable: hostOf(canon(u)) survives
  *      re-canonicalization and never picks an embedded URL's host.
  */
object UrlProps extends Properties("CanonicalizeUrl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private def spark = SparkTestBase.session

  private val genLabel: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val genHost: Gen[String] = for {
    www <- Gen.oneOf("", "www.", "WWW.", "www.www.")
    labels <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genLabel))
    tld <- Gen.oneOf("com", "org", "co.uk", "io")
    cased <- Gen.oneOf(identity[String] _, (s: String) => s.toUpperCase)
  } yield cased(www + (labels :+ tld).mkString("."))

  private val genSeg: Gen[String] = Gen.oneOf(
    genLabel,
    genLabel.map(_ + "%2f"),    // valid escape, lower hex
    genLabel.map(_ + "%2F"),
    genLabel.map(_ + "%zq"),    // malformed escape: must pass through
    genLabel.map(_ + "%"))      // trailing %: must round-trip

  private val genParam: Gen[String] = Gen.oneOf(
    genLabel.flatMap(k => genLabel.map(v => s"$k=$v")),
    genLabel.map(v => s"utm_source=$v"),             // dropped
    genLabel.map(v => s"gclid=$v"),                  // dropped
    Gen.const(""),                                   // empty: dropped
    genLabel.map(v => s"u=https://embedded.$v.net/zz"), // kept, embedded URL
    // HOSTILE kept values: raw '?', '=', '%'-escapes (valid + malformed),
    // a second '://' — param splitting must stay stable under all of them
    genLabel.map(v => s"q=$v?x=1"),
    genLabel.map(v => s"q=$v=w=z"),
    genLabel.map(v => s"q=$v%2f%ZQ%"),
    genLabel.map(v => s"q"))                         // no '=': key is whole param

  /** Bracketed-IPv6 authorities, including hostile shapes: a stray `]`
    * after the host (the spec-vs-kernel first-vs-last `]:digits`
    * divergence from the r11 ADVICE), non-digit ports, a dangling colon,
    * and an unclosed bracket. */
  private val genBracketAuth: Gen[String] = Gen.oneOf(
    "[::1]", "[2001:db8::1]", "[2001:DB8::1]:8080", "[::1]:80", "[::1]:443",
    "[::1]]:80", "[a]x]:8080", "[::1]:8z0", "[::1]:", "[nobracketend:80")

  /** WHATWG-strippable line-terminator injections (tab/CR/LF must vanish
    * in BOTH the kernel and the spec) — applied inside the scheme, the
    * classic blocklist-evasion spelling. */
  private val genSchemeMut: Gen[String => String] = Gen.frequency(
    5 -> Gen.const(identity[String] _),
    1 -> Gen.const((s: String) => s.take(2) + "\n" + s.drop(2)),
    1 -> Gen.const((s: String) => s.take(1) + "\t" + s.drop(1)),
    1 -> Gen.const((s: String) => s + "\r"))

  private val genUrl: Gen[String] = for {
    scheme0 <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    mut <- genSchemeMut
    user <- Gen.oneOf("", "alice:pw@")
    auth <- Gen.frequency(
      6 -> (for {
        h <- genHost
        p <- Gen.oneOf("", ":80", ":443", ":8080")
      } yield h + p),
      1 -> genBracketAuth)
    segs <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genSeg))
    slashes <- Gen.oneOf("", "/", "//", "///")
    // NON-strippable Unicode line terminators at the path tail: `$`-anchored
    // spec regexes matched before these while the kernel kept them — the
    // \A/\z anchors must hold the two paths byte-identical
    term <- Gen.frequency(8 -> Gen.const(""), 1 -> Gen.const("\u2028"),
      1 -> Gen.const("\u0085"))
    params <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, genParam))
    frag <- Gen.oneOf("", "#frag", "#a/b?c")
    pad <- Gen.oneOf("", " ", "  ")
  } yield {
    val scheme = mut(scheme0)
    val path = (if (segs.isEmpty) slashes else segs.mkString("/", "/", slashes)) + term
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$pad$scheme://$user$auth$path$query$frag$pad"
  }

  /** Scheme-less / junk inputs (the relative-reference passthrough branch),
    * including the embedded-absolute-URL blocklist-evasion spelling. */
  private val genRelative: Gen[String] = Gen.oneOf(
    genHost.map(h => s"$h/a/b?x=1"),
    genHost.flatMap(h => genLabel.map(v => s"$h/?u=https://embedded.$v.net/zz")),
    genLabel,
    Gen.const("://x/y"),
    genLabel.map(w => s"  $w words, not a url #frag "))

  private val genAny: Gen[String] = Gen.frequency(3 -> genUrl, 1 -> genRelative)

  property("native kernel ≡ expression spec (canon, host, domain)") =
    forAllNoShrink(Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, genAny))) { urls =>
      val s = spark
      import s.implicits._
      val specRows = urls.toDF("url")
        .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
        .select(col("c"), UrlOps.hostOf(col("c")).as("h"))
        .select(col("c"), col("h"), UrlOps.registeredDomain(col("h")).as("d"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val nativeRows = urls.map { u =>
        val c = graft.functions.UrlCanon.canonicalize(u)
        val h = graft.functions.UrlCanon.host(c)
        (c, h, graft.functions.UrlCanon.registeredDomain(h))
      }
      specRows.zip(nativeRows).zip(urls).forall { case ((sp, nt), u) =>
        if (sp != nt) println(s"KERNEL-DIVERGE url='$u'\n  spec  =$sp\n  native=$nt")
        sp == nt
      }
    }

  /** VERDICT r10 #6: param-split STABILITY under hostile kept values —
    * the kept-param multiset of the canonical output must equal the
    * multiset derived analytically from the raw input (filter + hex-fold
    * + sort applied to the input's own '&'-split), and re-parsing the
    * canonical output must read back exactly that multiset. A raw '?',
    * '=', '%' or '://' inside a kept value may not shift the boundary. */
  property("kept-param multiset: analytic expectation and reparse stability") =
    forAllNoShrink(Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genUrl))) { urls =>
      val s = spark
      import s.implicits._
      def hexFold(v: String): String = {
        val sb = new StringBuilder
        var i = 0
        def isHex(c: Char) = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
        while (i < v.length) {
          val c = v.charAt(i); sb.append(c)
          if (c == '%' && i + 2 < v.length && isHex(v.charAt(i + 1)) && isHex(v.charAt(i + 2))) {
            sb.append(Character.toUpperCase(v.charAt(i + 1)))
            sb.append(Character.toUpperCase(v.charAt(i + 2)))
            i += 2
          }
          i += 1
        }
        sb.toString
      }
      // analytic expectation from the INPUT (a third, test-local
      // implementation of the filter semantics)
      def expectedParams(u: String): Seq[String] = {
        val noFrag = u.trim.split("#", 2)(0)
        val qIdx = noFrag.indexOf('?')
        if (qIdx < 0) Seq.empty
        else noFrag.substring(qIdx + 1).split("&", -1).toSeq
          .filter(_.nonEmpty)
          .filterNot { p =>
            val k = p.split("=", 2)(0)
            k.startsWith("utm_") || UrlOps.TrackingParams.contains(k)
          }
          .map(hexFold).sorted
      }
      def parsedParams(c: String): Seq[String] = {
        val qIdx = c.indexOf('?')
        if (qIdx < 0) Seq.empty else c.substring(qIdx + 1).split("&", -1).toSeq
      }
      val canons = urls.toDF("url")
        .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
        .select(col("c"), UrlOps.canonicalizeUrl(col("c")).as("c2"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      canons.zip(urls).forall { case ((c, c2), u) =>
        // genUrl paths never contain a raw '?', so the input's first '?'
        // is the query boundary the analytic expectation assumes
        val exp = expectedParams(u)
        val got = parsedParams(c)
        val reparsed = parsedParams(c2)
        val ok = got == exp && reparsed == exp
        if (!ok) println(s"PARAM-FAIL url='$u'\n  c='$c'\n  expect=$exp\n  got=$got\n  reparse=$reparsed")
        ok
      }
    }

  /** r11 VERDICT #4: the hand-rolled RFC 3492 decoder against the JDK's
    * independent IDNA implementation — for any label the JDK can encode,
    * decoding the `xn--` form must reproduce exactly what
    * `java.net.IDN.toUnicode` reads back (which is the nameprepped
    * original). Labels the JDK rejects are skipped (they never reach the
    * decoder as valid punycode anyway). */
  private val genIdnLabel: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.alphaLowerChar,
      2 -> Gen.oneOf('ä', 'ö', 'ü', 'ß', 'é', 'ñ', 'ç', 'λ', 'щ', '中', '本'),
      1 -> Gen.numChar))
  } yield cs.mkString

  property("punycode decode ≡ java.net.IDN on every encodable label") =
    forAllNoShrink(Gen.listOfN(12, genIdnLabel)) { labels =>
      labels.forall { l =>
        val enc =
          try Some(java.net.IDN.toASCII(l))
          catch { case _: IllegalArgumentException => None }
        enc.forall { ascii =>
          val dec = graft.functions.UrlCanon.punycodeDecodeLabel(ascii.toLowerCase)
          val jdk = java.net.IDN.toUnicode(ascii.toLowerCase)
          if (dec != jdk)
            println(s"IDN-DIVERGE label='$l' ascii='$ascii'\n  ours=$dec\n  jdk =$jdk")
          dec == jdk
        }
      }
    }

  /** Hostile-input totality: ARBITRARY `xn--` garbage (not just
    * JDK-encodable labels) must never throw and must be a pure function —
    * the opaque-fallback contract the blocklist hot path relies on. */
  private val genHostileXn: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.oneOf(('a' to 'z') ++ ('0' to '9')),
      1 -> Gen.const('-'),
      1 -> Gen.oneOf('!', '.', 'ü', 'Z', ' ')))
  } yield "xn--" + cs.mkString

  property("punycode decode never throws and is pure on arbitrary xn-- garbage") =
    forAllNoShrink(Gen.listOfN(25, genHostileXn)) { labels =>
      labels.forall { l =>
        val once = graft.functions.UrlCanon.punycodeDecodeLabel(l)
        val twice = graft.functions.UrlCanon.punycodeDecodeLabel(l)
        once == twice && (once == l || once.nonEmpty)
      }
    }

  property("canon is idempotent and host attribution is stable") =
    forAllNoShrink(Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, genUrl))) { urls =>
      val s = spark
      import s.implicits._
      val rows = urls.toDF("url")
        .select(UrlOps.canonicalizeUrl(col("url")).as("c1"))
        .select(col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"),
          UrlOps.hostOf(col("c1")).as("h1"))
        .select(col("c1"), col("c2"), col("h1"), UrlOps.hostOf(col("c2")).as("h2"))
        .collect()
      rows.zip(urls).forall { case (r, u) =>
        val (c1, c2, h1, h2) = (r.getString(0), r.getString(1),
          r.getString(2), r.getString(3))
        val idem = c1 == c2
        val hostStable = h1 == h2
        val noEmbedded = !h1.startsWith("embedded.")
        if (!(idem && hostStable && noEmbedded))
          println(s"FAIL url='$u'\n  c1='$c1'\n  c2='$c2'\n  h1='$h1' h2='$h2'")
        idem && hostStable && noEmbedded
      }
    }
}
