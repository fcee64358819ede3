package graft.operators

import graft.SparkTestBase

/** Behavior checks for text-analysis expressions. */
class TextAnalysisSpec extends SparkTestBase {

  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("language ID picks the profile with most stopword hits") {
    val cases = Seq(
      "the cat is in the house and it is warm" -> "en",
      "der hund ist in dem haus und das ist gut" -> "de",
      "le chat est dans la maison et il est chaud" -> "fr",
      "el gato es en la casa y es bueno" -> "es",
      "zzz qqq xxx" -> "und")
    cases.foreach { case (text, want) =>
      val got = one(text).select(TextAnalysis.languageId("text")).head().getString(0)
      assert(got == want, s"'$text' -> $got, want $want")
    }
  }

  test("quality score is in [0,1], zero for empty, higher for natural text") {
    val natural = one("the cat is on the mat and the dog is in the house today")
      .select(TextAnalysis.qualityScore("text")).head().getDouble(0)
    val junk = one("zz zz zz zz zz zz zz zz zz zz")
      .select(TextAnalysis.qualityScore("text")).head().getDouble(0)
    val empty = one("").select(TextAnalysis.qualityScore("text")).head().getDouble(0)
    assert(natural > junk)
    assert(empty == 0.0)
    assert(natural <= 1.0 && junk >= 0.0)
  }

  test("fingerprint is whitespace-normalization invariant") {
    val a = one("hello   world").select(TextAnalysis.fingerprint60("text")).head().getLong(0)
    val b = one("  hello world ").select(TextAnalysis.fingerprint60("text")).head().getLong(0)
    val c = one("hello there").select(TextAnalysis.fingerprint60("text")).head().getLong(0)
    assert(a == b)
    assert(a != c)
  }

  test("token count and shingle sketch shapes") {
    val df = one("a b c d")
    assert(df.select(TextAnalysis.tokenCount("text")).head().getInt(0) == 4)
    val sketch = df.select(TextAnalysis.shingleSketch("text", k = 2, n = 2))
      .head().getSeq[Long](0)
    assert(sketch.length == 2)
    assert(sketch == sketch.sorted)
  }
}
