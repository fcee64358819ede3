package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Generative fuzz of the WARC record splitter — the classic weak point
  * of any framing parser is input it never saw. Over random record sets
  * (payloads including raw binary junk, record magic, CRLF runs, empty
  * bodies), random gzip layouts (plain / one member / per-record
  * members), and random corruption (truncation at ANY byte offset):
  *
  *   1. round-trip: parsing the constructed segment yields exactly the
  *      planted records — urls, payload bytes, offsets — in order;
  *   2. total robustness: a segment truncated at an arbitrary byte offset
  *      NEVER throws and never emits a row whose payload bytes disagree
  *      with the planted prefix (valid records before the cut survive
  *      byte-identically; at most quarantine rows follow them);
  *   3. member-offset soundness (gzip layouts): every member offset/
  *      length slice gunzips standalone.
  */
object WarcProps extends Properties("WarcIngest") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val genPayload: Gen[Array[Byte]] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s.take(64).getBytes(UTF_8)),
    Gen.const(Array.emptyByteArray),
    Gen.const("\r\n\r\nWARC/1.0\r\nContent-Length: 7\r\n\r\n".getBytes(UTF_8)),
    Gen.listOfN(32, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    Gen.const(("x" * 300).getBytes(UTF_8)))

  private final case class Planted(url: String, payload: Array[Byte]) {
    def bytes: Array[Byte] = {
      val header = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: 2024-01-01T00:00:09Z\r\nContent-Length: ${payload.length}\r\n\r\n"
      header.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
    }
  }

  private val genRecord: Gen[Planted] = for {
    n <- Gen.choose(0, 99999)
    p <- genPayload
  } yield Planted(s"https://fuzz.example/$n", p)

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close(); bos.toByteArray
  }

  /** (segment bytes, layout name) for a record set. */
  private def layouts(recs: List[Planted]): Seq[(Array[Byte], String)] = {
    val plain = recs.map(_.bytes).foldLeft(Array.emptyByteArray)(_ ++ _)
    Seq(
      (plain, "plain"),
      (gzip(plain), "one-member"),
      (recs.map(r => gzip(r.bytes)).foldLeft(Array.emptyByteArray)(_ ++ _),
        "per-record-members"))
  }

  property("round-trip: every layout yields exactly the planted records") =
    forAllNoShrink(Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genRecord))) { recs =>
      layouts(recs).forall { case (seg, layout) =>
        val out = WarcIngest.parseStream(new ByteArrayInputStream(seg), "f").toVector
        val ok = out.length == recs.length &&
          out.forall(_.malformed == 0) &&
          out.map(_.url) == recs.map(_.url).toVector &&
          out.zip(recs).forall { case (o, r) =>
            java.util.Arrays.equals(o.payload, r.payload) }
        if (!ok) println(s"ROUNDTRIP-FAIL layout=$layout " +
          s"got=${out.map(r => (r.url, r.malformed, r.error))}")
        ok
      }
    }

  property("truncation at any offset never throws; surviving records are byte-exact") =
    forAllNoShrink(for {
      recs <- Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genRecord))
      cutFrac <- Gen.choose(0.0, 1.0)
    } yield (recs, cutFrac)) { case (recs, cutFrac) =>
      val plain = recs.map(_.bytes).foldLeft(Array.emptyByteArray)(_ ++ _)
      val cut = (plain.length * cutFrac).toInt
      val out = WarcIngest.parseStream(
        new ByteArrayInputStream(java.util.Arrays.copyOf(plain, cut)), "f").toVector
      // prefix of fully-contained records must parse byte-identically
      var consumed = 0
      val whole = recs.takeWhile { r => consumed += r.bytes.length; consumed <= cut }
      val good = out.filter(_.malformed == 0)
      // good may exceed `whole` by ONE: a record whose payload fits but
      // whose 4-byte trailer was cut still parses clean
      val ok = good.length >= whole.length && good.length <= whole.length + 1 &&
        good.take(whole.length).zip(whole).forall { case (o, r) =>
          o.url == r.url && java.util.Arrays.equals(o.payload, r.payload) } &&
        out.drop(good.length).forall(_.malformed == 1) &&
        out.take(good.length).forall(_.malformed == 0) // quarantine only at the tail
      if (!ok) println(s"TRUNC-FAIL cut=$cut/${plain.length} " +
        s"whole=${whole.length} got=${out.map(r => (r.url, r.malformed, r.error))}")
      ok
    }

  property("gzip member offsets: every slice gunzips standalone") =
    forAllNoShrink(Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, genRecord))) { recs =>
      val seg = recs.map(r => gzip(r.bytes)).foldLeft(Array.emptyByteArray)(_ ++ _)
      val members = WarcIngest.gzipMembers(seg).toVector
      members.length == recs.length && members.zip(recs).forall { case (m, r) =>
        val slice = java.util.Arrays.copyOfRange(seg,
          m.offset.toInt, (m.offset + m.compressedLength).toInt)
        val in = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(slice))
        java.util.Arrays.equals(in.readAllBytes(), r.bytes)
      }
    }
}
