package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** [[TextAnalysis.gopherRepetitionCard]] against hand-computed documents:
  * every fraction below is derived on paper from the definitions in the
  * scaladoc (beyond-first occurrences for lines/paragraphs, cnt·chars of
  * the longest argmax gram for top-n, word-coverage for dup-n), so a
  * drift in the sort/run-length/coverage machinery fails an exact
  * assertion here before it fails the driver hash.
  */
class RepetitionCardSpec extends SparkTestBase {
  import spark.implicits._

  private def card(docs: Seq[(Long, String)]): Map[Long, Row] =
    TextAnalysis
      .gopherRepetitionCard(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def d(r: Row, col: String): Double =
    r.getDouble(r.fieldIndex(col))
  private def i(r: Row, col: String): Int =
    r.getInt(r.fieldIndex(col))

  test("line and paragraph duplicate fractions (aa/bb/aa + cc)") {
    val r = card(Seq((1L, "aa\nbb\naa\n\ncc")))(1L)
    // lines are ALL non-empty lines [aa, bb, aa, cc]: 1 of 4 beyond-first,
    // 2 of 8 chars
    assert(i(r, "n_lines") === 4)
    assert(d(r, "dup_line_frac") === 0.25)
    assert(d(r, "dup_line_char_frac") === 0.25)
    // paragraphs ["aa\nbb\naa", "cc"]: distinct
    assert(i(r, "n_paras") === 2)
    assert(d(r, "dup_para_frac") === 0.0)
    assert(d(r, "dup_para_char_frac") === 0.0)
    // words [aa, bb, aa, cc], wchars 8: every 2/3/4-gram unique, so the
    // top fraction is one occurrence's chars over wchars
    assert(d(r, "top2gram_char_frac") === 0.5)    // 4/8
    assert(d(r, "top3gram_char_frac") === 0.75)   // 6/8
    assert(d(r, "top4gram_char_frac") === 1.0)    // 8/8
    assert(d(r, "dup5gram_char_frac") === 0.0)    // only 4 words
    assert(d(r, "dup10gram_char_frac") === 0.0)
    assert(i(r, "r3_dup_paras") === 1 && i(r, "r4_dup_para_chars") === 1)
    assert(i(r, "r1_dup_lines") === 1)            // 1/4 <= 0.30
    assert(i(r, "r2_dup_line_chars") === 0)       // 1/4 > 0.20
    assert(i(r, "r5_top2gram") === 0 && i(r, "pass") === 0)
  }

  test("paragraph duplication (A/B/B)") {
    val r = card(Seq((1L, "pa ra one\n\nbee\n\nbee")))(1L)
    assert(i(r, "n_paras") === 3)
    assert(d(r, "dup_para_frac") === 0.333333)        // 1 of 3
    assert(d(r, "dup_para_char_frac") === 0.2)        // 3 of 15 chars
    assert(i(r, "r3_dup_paras") === 0)                // 1/3 > 0.30
    assert(i(r, "r4_dup_para_chars") === 1)           // 0.2 <= 0.20
  }

  test("top-gram run length counts occurrences, not distinct values") {
    // words [ab, c, ab, c, d]: "ab c" x2 beats three singletons;
    // num = 2 * (len("ab c") - 1) = 6, wchars = 7
    val r = card(Seq((1L, "ab c ab c d")))(1L)
    assert(d(r, "top2gram_char_frac") === 0.857143)
  }

  test("periodic text: full dup-5 and dup-10 gram coverage") {
    // "a b c d e" x3 = 15 single-char words; every 5-gram is a rotation
    // occurring 2-3 times, and 10-gram positions 0 and 5 coincide —
    // coverage is the whole document for both
    val r = card(Seq((1L, ("a b c d e " * 3).trim)))(1L)
    assert(d(r, "dup5gram_char_frac") === 1.0)
    assert(d(r, "dup10gram_char_frac") === 1.0)
    assert(d(r, "top2gram_char_frac") === 0.4)  // "a b" x3 -> 3*2/15
    assert(i(r, "r8_dup5gram") === 0 && i(r, "r9_dup10gram") === 0)
  }

  test("null and empty text: zero denominators pass every rule, stay countable") {
    val rows = card(Seq((1L, null.asInstanceOf[String]), (2L, "")))
    for (id <- Seq(1L, 2L)) {
      val r = rows(id)
      assert(i(r, "n_lines") === 0 && i(r, "n_paras") === 0)
      assert(d(r, "dup_line_frac") === 0.0 && d(r, "dup10gram_char_frac") === 0.0)
      assert(i(r, "pass") === 1)
    }
  }

  test("row-local: the card compiles to a zero-exchange plan") {
    val df = TextAnalysis.gopherRepetitionCard(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange (hash|range)partitioning".r.findAllIn(p).isEmpty, p)
  }
}
