package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** [[Dedup.paragraphDedup]]: CCNet-shape cross-document paragraph dedup.
  * Keep-first is by (doc id, position); reassembly preserves original
  * paragraph order; every input doc survives as a row.
  */
class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)],
                  family: String = "md5"): Map[Long, (Int, Int, String)] =
    Dedup.paragraphDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        family = family)
      .collect()
      .map { r: Row => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)) }
      .toMap

  test("a corpus-repeated paragraph survives only in the lowest (id, pos) doc") {
    val out = run(Seq((2L, "body two\n\nshared footer"),
                      (1L, "body one\n\nshared footer")))
    assert(out(1L) === ((2, 2, "body one\n\nshared footer")))
    assert(out(2L) === ((2, 1, "body two")))
  }

  test("within-doc repetition keeps the first position") {
    val out = run(Seq((1L, "x\n\ny\n\nx")))
    assert(out(1L) === ((3, 2, "x\n\ny")))
  }

  test("reassembly preserves original paragraph order") {
    val out = run(Seq((1L, "c\n\na\n\nb")))
    assert(out(1L) === ((3, 3, "c\n\na\n\nb")))
  }

  test("null and empty docs stay countable as (0, 0, '')") {
    val out = run(Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "a")))
    assert(out(1L) === ((0, 0, "")))
    assert(out(2L) === ((0, 0, "")))
    assert(out(3L) === ((1, 1, "a")))
  }

  test("md5 and xx64 key families agree on the output") {
    val docs = Seq((3L, "p\n\nq\n\nshared"), (7L, "shared\n\nr"),
                   (5L, "q\n\nshared\n\np"))
    assert(run(docs, "md5") === run(docs, "xx64"))
  }

  test("regex-metachar separators split literally and round-trip") {
    // "||" and "." are regex metachars: an unquoted split pattern would
    // explode "a||b" into per-char fragments and break the round-trip
    for (sep <- Seq("||", ".", "|", "\\n", "*~*")) {
      val docs = Seq((1L, s"aa${sep}bb${sep}aa"), (2L, s"bb${sep}cc"))
        .toDF("doc_id", "text")
      val out = Dedup.paragraphDedup(docs, "doc_id", "text", sep = sep,
          family = "md5")
        .collect()
        .map { r: Row => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)) }
        .toMap
      assert(out(1L) === ((3, 2, s"aa${sep}bb")), s"sep='$sep'")
      assert(out(2L) === ((2, 1, "cc")), s"sep='$sep'")
    }
  }

  test("the deduped corpus is a fixed point: re-running keeps every paragraph") {
    // after keep-first, every surviving paragraph is globally unique, so a
    // second pass must be the identity (n_kept == n_paras, text unchanged)
    // — the property that makes re-running a partially-curated corpus safe
    val docs = Seq(
      (1L, "alpha\n\nshared\n\nbeta"), (2L, "shared\n\ngamma"),
      (3L, "gamma\n\ngamma\n\ndelta"), (4L, ""), (5L, "alpha"))
      .toDF("doc_id", "text")
    val once = Dedup.paragraphDedup(docs, "doc_id", "text", family = "md5")
      .select(col("id").as("doc_id"), col("clean_text").as("text"))
    val twice = Dedup.paragraphDedup(once, "doc_id", "text", family = "md5")
      .collect()
    twice.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"doc ${r.getLong(0)}: second pass dropped paragraphs ($r)")
    }
    val onceMap = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    twice.foreach { r =>
      assert(r.getString(3) == onceMap(r.getLong(0)),
        s"doc ${r.getLong(0)}: second pass rewrote text")
    }
  }

  test("result is invariant to input partitioning") {
    val docs = Seq((2L, "b\n\nz"), (9L, "z\n\nq\n\nz"), (4L, "z\n\nb"))
    val base = run(docs)
    val scrambled = Dedup.paragraphDedup(
        docs.toDF("doc_id", "text").repartition(7, $"text"),
        "doc_id", "text", family = "md5")
      .collect()
      .map { r: Row => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)) }
      .toMap
    assert(scrambled === base)
  }
}
