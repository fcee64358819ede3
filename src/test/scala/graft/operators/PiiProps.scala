package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions._

/** Property fuzz of the typed PII redaction chain: inject a RANDOM mix of
  * known PII strings (emails, phones in both supported shapes, IPv4, full
  * and compressed IPv6, bare numbers) at random positions into clean
  * lowercase-word text, and the chain must (a) count exactly the injected
  * occurrences per type — no double counting across types, no misses —
  * and (b) leave ZERO residual matches of any pattern in the cleaned
  * text. The generator interleaves different PII types back-to-back
  * because ordering bugs (a number pass eating phone digits, an IPv4
  * octet read as a number) only fire when classes abut.
  */
object PiiProps extends Properties("RedactTyped") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private def spark = SparkTestBase.session

  private val genWord: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  // one generator per PII class, each emitting strings the matching
  // pattern matches WHOLLY (so injected occurrences count exactly once)
  private val genEmail: Gen[String] = for {
    u <- genWord; d <- genWord
  } yield s"$u@$d.com"
  private val genPhone: Gen[String] = Gen.oneOf(
    Gen.choose(100, 999).map(n => s"+1-555-$n-${n * 7 % 10000}"),
    Gen.choose(100, 999).map(n => s"($n) 555-${1000 + n % 9000}"))
  private val genIpv4: Gen[String] = for {
    a <- Gen.choose(1, 254); b <- Gen.choose(0, 255)
  } yield s"10.$a.$b.1"
  private val genIpv6: Gen[String] = Gen.oneOf(
    Gen.choose(1, 0xffff).map(h => f"2001:db8:$h%x:0:0:0:0:1"), // full 8-group
    Gen.choose(1, 0xffff).map(h => f"fe80::$h%x"))              // compressed
  private val genNum: Gen[String] = Gen.oneOf(
    Gen.choose(1, 99999).map(_.toString),
    Gen.choose(1, 999).map(n => s"$n.$n"))

  private val classes: Seq[(String, Gen[String])] = Seq(
    "email" -> genEmail, "phone" -> genPhone, "ipv4" -> genIpv4,
    "ipv6" -> genIpv6, "num" -> genNum)

  private case class Doc(text: String, counts: Map[String, Int])

  private val genDoc: Gen[Doc] = for {
    nWords <- Gen.choose(3, 15)
    words <- Gen.listOfN(nWords, genWord)
    nPii <- Gen.choose(0, 6)
    pii <- Gen.listOfN(nPii, Gen.oneOf(classes).flatMap { case (k, g) =>
      g.map(k -> _)
    })
  } yield {
    // interleave: words and PII tokens shuffled deterministically by index
    val tokens = (words.map(("w", _)) ++ pii).zipWithIndex
      .sortBy { case ((_, s), i) => (i * 2654435761L + s.length) % 1000003 }
      .map(_._1)
    val counts = pii.groupBy(_._1).map { case (k, v) => k -> v.size }
    Doc(tokens.map(_._2).mkString(" "), counts.withDefaultValue(0))
  }

  property("counts are exactly the injections; zero residual") =
    forAllNoShrink(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genDoc))) { docs =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d.text) }
        .toDF("id", "text")
        .select(col("id"), Pipeline.redactTyped(col("text")).as("p"))
        .select(col("id"), col("p.n_emails"), col("p.n_phones"),
          col("p.n_ipv4"), col("p.n_ipv6"), col("p.n_nums"), col("p.clean"))
      val got = df.collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getString(6)))).toMap
      docs.zipWithIndex.forall { case (d, i) =>
        val (e, ph, v4, v6, nn, clean) = got(i.toLong)
        val expected = (d.counts("email"), d.counts("phone"),
          d.counts("ipv4"), d.counts("ipv6"), d.counts("num"))
        val countsOk = (e, ph, v4, v6, nn) == expected
        val residual = Seq(Pipeline.EmailRe, Pipeline.PhoneRe, Pipeline.Ipv4Re,
          Pipeline.Ipv6Re, Pipeline.NumberRe)
          .map(p => java.util.regex.Pattern.compile(p).matcher(clean))
          .count(_.find())
        if (!countsOk || residual != 0)
          println(s"FAIL doc='${d.text}' got=(${(e, ph, v4, v6, nn)}) " +
            s"expected=$expected residual=$residual clean='$clean'")
        countsOk && residual == 0
      }
    }
}
