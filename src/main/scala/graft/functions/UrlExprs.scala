package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the URL curation layer — the hot-path
  * twins of [[graft.operators.UrlOps]]'s expression-composed
  * `canonicalizeUrl` / `hostOf` / `registeredDomain`.
  *
  * Why native: the composed form needs ~12 let-bound derivation stages.
  * Bound as higher-order-function lambdas they run interpreted (~0.1 ms/
  * row warm plus a multi-second one-time plan cost); bound as `withColumn`
  * Project seams they survive a simple projection but EXPLODE when the
  * frame is referenced twice — measured round 11: pushing the 14-seam
  * chain through `temperatureMix`'s self-join + window inlined it into a
  * 793 KB physical plan and a 60 s/rep query (SCALING.md r11a). A single
  * codegen'd expression node is immune to both failure modes: optimizer
  * rules can duplicate it freely (it is one node), and evaluation is one
  * static Java call per row.
  *
  * EXACTNESS CONTRACT: each kernel is byte-for-byte equivalent to the
  * expression-composed spec in `UrlOps` — same substring_index /
  * regexp_extract corner semantics (documented inline at each step), the
  * host lowercased through `UTF8String.toLowerCase` (the exact code path
  * of Spark's `lower()`), and query params sorted in UTF-8 BYTE order
  * (the exact comparator of Spark's `array_sort` on strings, which
  * differs from Java's UTF-16 `String.compareTo` for supplementary code
  * points). UrlProps pins kernel ≡ spec over hostile fuzz input; the
  * q_u1–u5 and q_sp13 driver oracles are analytic (planted
  * construction), so a kernel bug cannot be masked by a replayed copy.
  */
object UrlCanon {

  import graft.operators.UrlOps.{MultiLevelSuffixes, TrackingParams}

  private val trackingSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TrackingParams.foreach(s.add)
    s
  }
  private val multiSuffixSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    MultiLevelSuffixes.foreach(s.add)
    s
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '+' || c == '.' || c == '-'

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** WHATWG URL pre-parse: remove ALL ASCII tab/CR/LF from the input —
    * what browsers do before parsing, so `http\n://blocked.com/x`
    * (fetched by every browser as `http://blocked.com/x`) canonicalizes
    * to the blocked spelling instead of taking the relative branch and
    * evading [[graft.operators.UrlOps.domainListFilter]]. Mirrored in
    * the expression spec's `steps.u` (`translate(url, "\t\r\n", "")`). */
  private def whatwgStrip(s: String): String = {
    var i = 0
    val n = s.length
    var clean = true
    while (clean && i < n) {
      val c = s.charAt(i)
      if (c == '\t' || c == '\r' || c == '\n') clean = false
      i += 1
    }
    if (clean) return s
    val sb = new java.lang.StringBuilder(n - 1)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '\t' && c != '\r' && c != '\n') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** trim(col) semantics: strip leading/trailing SPACE (0x20) only. */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  /** Parse as absolute only when the text before the FIRST `://` is a
    * valid RFC 3986 scheme token (`ALPHA (ALPHA/DIGIT/+/-/.)*`) — the
    * embedded-URL blocklist-evasion guard (see UrlOps object doc).
    * Returns the scheme end index (= indexOf("://")), or -1. */
  private def schemeEnd(u: String): Int = {
    val idx = u.indexOf("://")
    if (idx <= 0) return -1
    if (!isAlpha(u.charAt(0))) return -1
    var i = 1
    while (i < idx) {
      if (!isSchemeChar(u.charAt(i))) return -1
      i += 1
    }
    idx
  }

  /** lower() exactness: Spark's `lower(col)` evaluates through
    * `UTF8String.toLowerCase`, so the kernel routes through the same call
    * rather than Java's locale-sensitive `String.toLowerCase`. */
  private def sparkLower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** pctHexUpper: uppercase the two hex chars of every `%xx` escape;
    * chunks after `%` not starting with two hex chars pass through.
    * Char-wise equivalent of the split-on-% expression form. */
  private def pctHexUpper(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      sb.append(c)
      if (c == '%' && i + 2 < n && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        sb.append(Character.toUpperCase(s.charAt(i + 1)))
        sb.append(Character.toUpperCase(s.charAt(i + 2)))
        i += 2
      }
      i += 1
    }
    sb.toString
  }

  /** UTF-8 byte-order comparator — the exact ordering of Spark's
    * `array_sort` over strings (UTF8String.compareTo is unsigned
    * byte-wise; Java's String.compareTo would misorder supplementary
    * code points against high-BMP ones). */
  private val utf8ByteOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int =
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    }

  /** Canonical form — the native twin of `UrlOps.canonicalizeUrl`. See
    * the UrlOps object doc for the normalization list. */
  def canonicalize(url: String): String = {
    // 1. WHATWG tab/newline strip + trim + fragment strip (the only
    //    normalization a relative reference gets)
    val t = trimSpaces(whatwgStrip(url))
    val hash = t.indexOf('#')
    val u = if (hash < 0) t else t.substring(0, hash)

    val se = schemeEnd(u)
    if (se < 0) return u // relative-reference passthrough

    val scheme = sparkLower(u.substring(0, se))
    val rest = u.substring(se + 3)

    // auth0 = rest up to the first '/' or '?' (regexp ^[^/?]*)
    var cut = rest.length
    var i = 0
    while (i < cut) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') cut = i
      i += 1
    }
    val auth0 = rest.substring(0, cut)
    val pathq = rest.substring(cut)

    // userinfo strip: suffix after the LAST '@' (regexp [^@]*$)
    val at = auth0.lastIndexOf('@')
    val auth = if (at < 0) auth0 else auth0.substring(at + 1)

    // host/port split: bracketed IPv6 keys on the bracket; a bracket
    // authority with no closing ']' yields host "" (regexp no-match
    // semantics), exactly like the expression form
    var host0 = ""
    var port = ""
    if (auth.startsWith("[")) {
      val close = auth.indexOf(']')
      host0 = if (close < 0) "" else sparkLower(auth.substring(0, close + 1))
      // port = digits after "]:" at END of auth (regexp \]:([0-9]+)$)
      if (close >= 0 && close + 1 < auth.length && auth.charAt(close + 1) == ':') {
        val p = auth.substring(close + 2)
        if (p.nonEmpty && p.forall(c => c >= '0' && c <= '9')) port = p
      }
    } else {
      val colon = auth.indexOf(':')
      host0 = sparkLower(if (colon < 0) auth else auth.substring(0, colon))
      // substring_index(auth, ":", -1): after the LAST ':' (any chars)
      if (colon >= 0) port = auth.substring(auth.lastIndexOf(':') + 1)
    }

    // `www.` run strips only while >= 2 labels remain; one `www.` is kept
    // back when stripping the whole run would leave a dotless label
    var h1 = host0
    while (h1.startsWith("www.")) h1 = h1.substring(4)
    val host =
      if (h1.indexOf('.') >= 0) h1
      else if (host0.startsWith("www.")) "www." + h1
      else host0

    val portPart =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) ""
      else ":" + port

    // path: %-hex fold, then ALL trailing slashes collapse
    val q = pathq.indexOf('?')
    val rawPath = if (q < 0) pathq else pathq.substring(0, q)
    var path = pctHexUpper(rawPath)
    var pe = path.length
    while (pe > 0 && path.charAt(pe - 1) == '/') pe -= 1
    path = path.substring(0, pe)

    // query: %-hex fold, split on '&', drop empties + tracking params
    // (key = text before the first '='; keys with no '=' are the whole
    // param), sort survivors in UTF-8 byte order
    var queryPart = ""
    if (q >= 0) {
      val query = pctHexUpper(pathq.substring(q + 1))
      val params = query.split("&", -1)
      val kept = new java.util.ArrayList[String](params.length)
      var j = 0
      while (j < params.length) {
        val p = params(j)
        if (p.nonEmpty) {
          val eq = p.indexOf('=')
          val key = if (eq < 0) p else p.substring(0, eq)
          if (!key.startsWith("utm_") && !trackingSet.contains(key)) kept.add(p)
        }
        j += 1
      }
      if (!kept.isEmpty) {
        kept.sort(utf8ByteOrder)
        queryPart = "?" + String.join("&", kept)
      }
    }

    scheme + "://" + host + portPart + path + queryPart
  }

  /** Host of a CANONICAL url — the native twin of `UrlOps.hostOf`
    * (no trim / userinfo / case work: apply canonicalize first). */
  def host(canonicalUrl: String): String = {
    val se = schemeEnd(canonicalUrl)
    val rest = if (se < 0) canonicalUrl else canonicalUrl.substring(se + 3)
    var cut = rest.length
    var i = 0
    while (i < cut) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') cut = i
      i += 1
    }
    val auth = rest.substring(0, cut)
    if (auth.startsWith("[")) {
      val close = auth.indexOf(']')
      if (close < 0) "" else auth.substring(0, close + 1)
    } else {
      val colon = auth.indexOf(':')
      if (colon < 0) auth else auth.substring(0, colon)
    }
  }

  /** Registered (pay-level) domain of a lowercase host — the native twin
    * of `UrlOps.registeredDomain` (IP literals and short hosts pass
    * through whole; multi-level public suffixes keep three labels). */
  def registeredDomain(host: String): String = {
    // IP literal: ^[0-9.]+$ (nonempty, digits and dots only) or bracketed
    if (host.startsWith("[")) return host
    var allIp = host.nonEmpty
    var i = 0
    while (allIp && i < host.length) {
      val c = host.charAt(i)
      if (!((c >= '0' && c <= '9') || c == '.')) allIp = false
      i += 1
    }
    if (allIp) return host
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n < 2) return host
    val suffix2 = labels(n - 2) + "." + labels(n - 1)
    if (n >= 3 && multiSuffixSet.contains(suffix2))
      labels(n - 3) + "." + suffix2
    else suffix2
  }

  // ---- punycode / IDN (RFC 3492) ----

  private val PunyBase = 36
  private val PunyTMin = 1
  private val PunyTMax = 26
  private val PunySkew = 38
  private val PunyDamp = 700
  private val PunyInitialBias = 72
  private val PunyInitialN = 128

  private def punyAdapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / PunyDamp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((PunyBase - PunyTMin) * PunyTMax) / 2) {
      delta /= PunyBase - PunyTMin
      k += PunyBase
    }
    k + ((PunyBase - PunyTMin + 1) * delta) / (delta + PunySkew)
  }

  /** Decode ONE `xn--` label per RFC 3492 (IDNA parameters). Pure integer
    * arithmetic over ASCII — no Unicode tables, no network. Hosts reach
    * this ALREADY LOWERCASED (the canonicalizer's contract), so only
    * `a-z0-9` digits are accepted. Any malformed input — bad digit,
    * truncated trailer, integer overflow, surrogate/out-of-range code
    * point, or a decoded label that is pure ASCII (which IDNA forbids
    * encoding) — returns the label UNCHANGED: an opaque `xn--` label
    * still blocklist-matches its own raw spelling, exactly the pre-IDN
    * behavior, and a hostile label can never throw on the hot path. */
  def punycodeDecodeLabel(label: String): String = {
    if (!label.startsWith("xn--")) return label
    val enc = label.substring(4)
    if (enc.isEmpty) return label
    val lastDash = enc.lastIndexOf('-')
    val out = new java.util.ArrayList[Integer](enc.length)
    var pos = 0
    if (lastDash >= 0) {
      var i = 0
      while (i < lastDash) {
        val c = enc.charAt(i)
        // non-ASCII can't be punycode; uppercase means the input broke
        // the lowercased-host contract — stay opaque, like the digit
        // branch below
        if (c >= 0x80 || (c >= 'A' && c <= 'Z')) return label
        out.add(Integer.valueOf(c))
        i += 1
      }
      pos = lastDash + 1
    }
    if (pos >= enc.length) return label // nothing encoded: not valid IDNA
    var n = PunyInitialN
    var idx = 0
    var bias = PunyInitialBias
    while (pos < enc.length) {
      val oldIdx = idx
      var w = 1
      var k = PunyBase
      var done = false
      while (!done) {
        if (pos >= enc.length) return label
        val c = enc.charAt(pos)
        pos += 1
        val digit =
          if (c >= 'a' && c <= 'z') c - 'a'
          else if (c >= '0' && c <= '9') c - '0' + 26
          else return label
        if (digit > (Int.MaxValue - idx) / w) return label
        idx += digit * w
        val t = if (k <= bias) PunyTMin
                else if (k >= bias + PunyTMax) PunyTMax
                else k - bias
        if (digit < t) done = true
        else {
          if (w > Int.MaxValue / (PunyBase - t)) return label
          w *= PunyBase - t
          k += PunyBase
        }
      }
      val numPoints = out.size() + 1
      bias = punyAdapt(idx - oldIdx, numPoints, oldIdx == 0)
      if (idx / numPoints > Int.MaxValue - n) return label
      n += idx / numPoints
      idx %= numPoints
      if (n < 0x80 || n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF)) return label
      out.add(idx, Integer.valueOf(n))
      idx += 1
    }
    val sb = new java.lang.StringBuilder(out.size() + 4)
    var j = 0
    while (j < out.size()) {
      sb.appendCodePoint(out.get(j).intValue())
      j += 1
    }
    sb.toString
  }

  /** Decode every `xn--` label of an already-lowercased host (bracketed
    * IPv6 and xn---free hosts pass through untouched on a fast path).
    * One decode is the normal form both blocklist sides compare in —
    * decode is NOT idempotent in general (a hostile label can decode TO
    * an `xn--` spelling), so both sides must decode exactly once. */
  def idnHost(host: String): String = {
    if (host.startsWith("[") || !host.contains("xn--")) return host
    val labels = host.split("\\.", -1)
    var changed = false
    var i = 0
    while (i < labels.length) {
      val d = punycodeDecodeLabel(labels(i))
      if (d ne labels(i)) { labels(i) = d; changed = true }
      i += 1
    }
    if (changed) String.join(".", labels: _*) else host
  }

  // UTF8String entry points called from generated code
  def canonicalize(u: UTF8String): UTF8String =
    UTF8String.fromString(canonicalize(u.toString))
  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(host(u.toString))
  def registeredDomain(u: UTF8String): UTF8String =
    UTF8String.fromString(registeredDomain(u.toString))
  def idnHost(u: UTF8String): UTF8String =
    UTF8String.fromString(idnHost(u.toString))
}

abstract class UrlKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = child.dataType
}

/** `url_canonical(s)`: canonical URL form (see UrlOps object doc). */
case class CanonicalizeUrlExpr(child: Expression) extends UrlKernelExpr {
  override def prettyName: String = "url_canonical"
  override protected def nullSafeEval(s: Any): Any =
    UrlCanon.canonicalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.canonicalize($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `url_host(s)`: host of a canonical URL. */
case class UrlHostExpr(child: Expression) extends UrlKernelExpr {
  override def prettyName: String = "url_host"
  override protected def nullSafeEval(s: Any): Any =
    UrlCanon.host(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.host($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `url_idn_host(s)`: every `xn--` label punycode-decoded (RFC 3492);
  * malformed labels stay opaque. The normal form domain blocklists
  * compare in — see [[graft.operators.UrlOps.domainListFilter]]. */
case class IdnHostExpr(child: Expression) extends UrlKernelExpr {
  override def prettyName: String = "url_idn_host"
  override protected def nullSafeEval(s: Any): Any =
    UrlCanon.idnHost(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.idnHost($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `url_domain(s)`: registered (pay-level) domain of a lowercase host. */
case class RegisteredDomainExpr(child: Expression) extends UrlKernelExpr {
  override def prettyName: String = "url_domain"
  override protected def nullSafeEval(s: Any): Any =
    UrlCanon.registeredDomain(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.registeredDomain($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
