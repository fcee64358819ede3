package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkTestBase

/** Adversarial coverage of the WARC record splitter: framing (payloads
  * containing record magic), gzip single/multi-member segments, truncated
  * payloads/headers, header-level failures with resync, empty payloads,
  * and exact byte offsets. Plus the Spark-side frame round-trip.
  */
class WarcSpec extends SparkTestBase {

  private def rec(url: String, date: String, payload: String,
                  extraHeader: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
      s"WARC-Date: $date\r\n$extraHeader" +
      s"Content-Length: ${payload.getBytes(UTF_8).length}\r\n\r\n$payload\r\n\r\n"

  private val d1 = "2024-01-01T00:00:01Z"
  private val d2 = "2024-01-01T00:00:02Z"

  private def parse(bytes: Array[Byte]) =
    WarcIngest.parseStream(new ByteArrayInputStream(bytes), "t").toVector

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close(); bos.toByteArray
  }

  test("plain two-record split: urls, timestamps, payloads, exact offsets") {
    val r1 = rec("https://a.example/1", d1, "hello world")
    val r2 = rec("https://a.example/2", d2, "second doc")
    val out = parse((r1 + r2).getBytes(UTF_8))
    assert(out.length == 2)
    assert(out.map(_.malformed).forall(_ == 0))
    assert(out(0).url == "https://a.example/1" && out(1).url == "https://a.example/2")
    assert(out(0).fetch_ts == 1704067201L && out(1).fetch_ts == 1704067202L)
    assert(new String(out(0).payload, UTF_8) == "hello world")
    assert(out(0).offset == 0L)
    assert(out(1).offset == r1.getBytes(UTF_8).length.toLong)
    assert(out.map(_.record_index) == Vector(0, 1))
    assert(out(0).n_headers == 3 + 1) // Type, URI, Date, Content-Length
  }

  test("Content-Length framing: payload containing WARC magic never splits a record") {
    val evil = "binary\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nstill payload"
    val out = parse((rec("https://a.example/x", d1, evil) +
      rec("https://a.example/y", d2, "tail")).getBytes(UTF_8))
    assert(out.length == 2)
    assert(out.map(_.malformed).forall(_ == 0))
    assert(new String(out(0).payload, UTF_8) == evil)
    assert(out(1).url == "https://a.example/y")
  }

  test("gzip segment (magic-sniffed) and multi-member concatenation both split") {
    val r1 = rec("https://g.example/1", d1, "gz one")
    val r2 = rec("https://g.example/2", d2, "gz two")
    // one member holding both records
    val single = parse(gzip((r1 + r2).getBytes(UTF_8)))
    assert(single.map(_.url) == Vector("https://g.example/1", "https://g.example/2"))
    // one member PER record, concatenated (the crawler layout)
    val multi = parse(gzip(r1.getBytes(UTF_8)) ++ gzip(r2.getBytes(UTF_8)))
    assert(multi.map(_.url) == Vector("https://g.example/1", "https://g.example/2"))
    assert(multi.map(_.malformed).forall(_ == 0))
    // offsets are decompressed-stream offsets in both layouts
    assert(single.map(_.offset) == multi.map(_.offset))
  }

  test("truncated payload quarantines with declared/got accounting and parsed headers") {
    val full = rec("https://t.example/1", d1, "0123456789abcdef")
    val cut = full.getBytes(UTF_8).dropRight(10) // 4-byte trailer + 6 payload bytes
    val out = parse(cut)
    assert(out.length == 1)
    val q = out(0)
    assert(q.malformed == 1 && q.error == "truncated-payload")
    assert(q.url == "https://t.example/1" && q.fetch_ts == 1704067201L)
    assert(q.declared_len == 16L && q.got_len == 10L)
  }

  test("missing Content-Length quarantines ONE row and resyncs to the next record") {
    val broken = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://b.example/broken\r\n\r\n" +
      "unframed payload line one\r\nline two\r\n\r\n"
    val good = rec("https://b.example/good", d2, "fine")
    val out = parse((broken + good).getBytes(UTF_8))
    assert(out.length == 2)
    assert(out(0).malformed == 1 && out(0).error == "missing-content-length")
    assert(out(0).url == "https://b.example/broken")
    assert(out(1).malformed == 0 && out(1).url == "https://b.example/good")
  }

  test("garbage between records: one bad-version row, then resync") {
    val good1 = rec("https://v.example/1", d1, "a")
    val good2 = rec("https://v.example/2", d2, "b")
    val out = parse((good1 + "not a warc line\r\nmore garbage\r\n\r\n" + good2)
      .getBytes(UTF_8))
    assert(out.length == 3)
    assert(out(0).malformed == 0)
    assert(out(1).malformed == 1 && out(1).error == "bad-version")
    assert(out(2).malformed == 0 && out(2).url == "https://v.example/2")
  }

  test("empty payload (Content-Length: 0) and truncated header block") {
    val out = parse(rec("https://e.example/0", d1, "").getBytes(UTF_8))
    assert(out.length == 1 && out(0).malformed == 0 && out(0).payload.isEmpty)
    // header block cut mid-headers: quarantined as truncated-header
    val cut = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Targ".getBytes(UTF_8)
    val q = parse(cut)
    assert(q.length == 1 && q(0).malformed == 1 && q(0).error == "truncated-header")
  }

  test("Spark frame round-trip: file-parallel split preserves per-file indexes") {
    import spark.implicits._
    val segA = (rec("https://s.example/a1", d1, "pa1") +
      rec("https://s.example/a2", d2, "pa2")).getBytes(UTF_8)
    val segB = rec("https://s.example/b1", d1, "pb1").getBytes(UTF_8)
    val out = WarcIngest.readWarc(
        Seq(("segA", gzip(segA)), ("segB", segB)).toDS().repartition(2))
      .collect().sortBy(r => (r.file, r.record_index))
    assert(out.map(r => (r.file, r.record_index, r.url)).toSeq == Seq(
      ("segA", 0, "https://s.example/a1"),
      ("segA", 1, "https://s.example/a2"),
      ("segB", 0, "https://s.example/b1")))
  }
}
