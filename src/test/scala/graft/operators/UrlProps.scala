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
    genLabel.map(v => s"u=https://embedded.$v.net/zz")) // kept, embedded URL

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    user <- Gen.oneOf("", "alice:pw@")
    host <- genHost
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genSeg))
    slashes <- Gen.oneOf("", "/", "//", "///")
    params <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, genParam))
    frag <- Gen.oneOf("", "#frag", "#a/b?c")
    pad <- Gen.oneOf("", " ", "  ")
  } yield {
    val path = if (segs.isEmpty) slashes else segs.mkString("/", "/", slashes)
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$pad$scheme://$user$host$port$path$query$frag$pad"
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
