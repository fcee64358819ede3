package graft.operators

import graft.SparkTestBase

/** Hand-folded BPE training/encoding checks on the Sennrich-style toy
  * corpus, plus determinism on real docs.
  */
class TokenizerSpec extends SparkTestBase {

  import spark.implicits._

  // words: low x3, lower x2, newest x1
  private def corpus = Seq(
    (1L, "low low low"), (2L, "lower lower"), (3L, "newest")
  ).toDF("doc_id", "text")

  test("bpeTrain learns the hand-computed merges with deterministic tie-breaks") {
    val got = Tokenizer.bpeTrain(corpus, "text", numMerges = 5)
      .map(m => (m.step, m.lhs, m.rhs, m.pairFreq))
    // pair counts by hand: (l,o)=5 ties (o,w)=5 -> lhs order picks (l,o);
    // then (lo,w)=5; then (e,r)=2 ties (low,e)=2 -> "e" < "low";
    // then (low,er)=2; then the five count-1 pairs of 'newest' -> (e,s)
    assert(got == Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "e", "r", 2L),
      (4, "low", "er", 2L),
      (5, "e", "s", 1L)), got.toString)
  }

  test("bpeTrain stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = Tokenizer.bpeTrain(tiny, "text", numMerges = 10)
    // one merge exhausts the vocabulary: [a,b] -> [ab], no pairs left
    assert(got.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
  }

  test("bpeEncodeCounts applies the merge chain row-locally") {
    val merges = Tokenizer.bpeTrain(corpus, "text", numMerges = 5)
    val enc = Seq((1L, "low lower newest"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Tokenizer.bpeEncodeCounts(enc, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // low -> [low] (1), lower -> [lower] (1),
    // newest -> [n, e, w, es, t] (5): merges (e,r)/(low,er) don't apply,
    // (e,s) does — 7 tokens over 3 words
    assert(got == Seq((1L, 3L, 7L), (2L, 0L, 0L)), got.toString)
  }

  test("BPE-aware packing: bins are contiguous and bounded by budget + one doc (real counts)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sfDir("0.001") + "/documents.parquet")
    val budget = 512L
    val merges = Tokenizer.bpeTrain(docs, "text", numMerges = 6)
    val enc = Tokenizer.bpeEncodeCounts(docs, "doc_id", "text", merges)
    val packed = Pipeline.packSequences(
      docs.select(col("doc_id"), col("lang")).join(enc, "doc_id"),
      "lang", "doc_id", "n_tokens", budget)
    val perBin = packed.groupBy("lang", "bin")
      .agg(sum("n_tokens").as("packed"), max("n_tokens").as("biggest"))
      .collect()
    // greedy prefix packing invariant: a bin overflows by at most the doc
    // that crossed the boundary — sum <= budget + that doc's tokens
    perBin.foreach { r =>
      assert(r.getAs[Long]("packed") <= budget + r.getAs[Long]("biggest"),
        s"bin ${r.getAs[Long]("bin")} in ${r.getString(0)} overflows: $r")
    }
    // bins are contiguous from 0 within each language
    val byLang = perBin.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted.toSeq
      assert(bins == (0L until bins.length).toSeq, s"$lang bins not contiguous: $bins")
    }
    // and the real counts differ from whitespace counts (the composition
    // is not vacuous: BPE fragments words)
    val ws = docs.selectExpr("doc_id",
      "CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT) AS n_ws")
    val diff = enc.join(ws, "doc_id")
      .filter(col("n_tokens") =!= col("n_ws")).count()
    assert(diff > 0L, "BPE token counts should not equal whitespace counts")
  }

  test("training is partitioning-invariant on real docs") {
    val docs = spark.read.parquet(sfDir("0.001") + "/documents.parquet")
    val a = Tokenizer.bpeTrain(docs, "text", numMerges = 4)
    val b = Tokenizer.bpeTrain(docs.repartition(7), "text", numMerges = 4)
    assert(a == b)
    assert(a.length == 4)
    // merge frequencies are non-increasing: a later merge can never beat
    // an earlier one at the time it was chosen... but CAN exceed a prior
    // count after symbol fusion creates new mass — so only sanity-check
    // positivity, not monotonicity
    assert(a.forall(_.pairFreq > 0))
  }
}
