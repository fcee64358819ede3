package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING and ENCODING as engine operators — the
  * "train the tokenizer on the corpus you just curated" step of an LLM
  * data pipeline, usually done by a separate tool, expressed here as the
  * same kind of deterministic, oracle-checkable Spark job as the rest of
  * the engine.
  *
  * Scale design. Classic BPE trainers (Sennrich et al. 2016) operate on
  * the word-frequency table, not the raw corpus — merges depend only on
  * (distinct word, count). The corpus is touched EXACTLY ONCE to build
  * that table (one hash-agg shuffle, map-side combined); every merge
  * iteration then runs on the vocabulary-sized frame, and the only thing
  * that ever reaches the driver is the single argmax pair per iteration
  * (the k-means-centroid / PageRank-literal idiom). Encoding is purely
  * row-local: the learned merge list compiles into a chain of literal
  * `replace` calls executed inside codegen — the corpus never shuffles to
  * be tokenized.
  *
  * Exact replayability. Symbol sequences are represented as DOUBLE-SPACE
  * joined strings with leading/trailing double spaces ("  a  b  c  ").
  * Applying merge (a, b) is then the literal string replacement
  * " a  b " -> " ab ": the single outer spaces consume one space from
  * each two-space boundary, so consecutive overlapping occurrences
  * ("a b a b" -> "ab ab") merge exactly like the greedy left-to-right
  * fold, while multi-char symbols can never match spuriously (every true
  * boundary is two spaces; a pattern's single space never matches inside
  * a symbol). Both engines' `replace` scan left-to-right continuing
  * after each replacement, so Spark and an external SQL engine replay
  * the merge bit-for-bit — no UDF, no fold, no regex.
  */
object Tokenizer {

  /** One learned merge: `lhs`+`rhs` became a symbol at `step`, having been
    * the most frequent adjacent pair with weighted count `pair_freq`.
    */
  final case class Merge(step: Int, lhs: String, rhs: String, pairFreq: Long)

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")

  /** Symbol-string of a word column: each character a symbol, double-space
    * joined, double-space padded.
    */
  private[operators] def symExpr(wordCol: String): String =
    s"concat('  ', array_join(transform(sequence(1, length($wordCol)), i -> substring($wordCol, i, 1)), '  '), '  ')"

  /** Symbols of a symbol-string. */
  private def symsOf(symCol: String): String =
    s"filter(split($symCol, '  '), x -> x != '')"

  /** Adjacent-pair structs of a symbol array column. */
  private def pairsOf(symsCol: String): String =
    s"""CASE WHEN size($symsCol) >= 2
       |  THEN transform(sequence(0, size($symsCol) - 2),
       |                 j -> struct($symsCol[j] AS lhs, $symsCol[j + 1] AS rhs))
       |  ELSE array() END""".stripMargin

  /** The word-frequency table of a corpus — the ONE corpus-sized pass of
    * BPE training. (word, freq), freq = total occurrences.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(Dedup.tokensExpr(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` BPE merges from the corpus: repeatedly merge the
    * most frequent adjacent symbol pair (ties broken by (lhs, rhs) string
    * order — a total order, so training is deterministic on any engine and
    * any partitioning). Stops early if no pair remains. Returns the merge
    * list in learned order.
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // vocabulary-sized from here on; localCheckpoint cuts the corpus scan
    // out of every iteration's lineage
    var words = wordFreq(docs, textCol)
      .withColumn("sym", expr(symExpr("word")))
      .select("freq", "sym")
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val top = words
        .select(col("freq"), expr(symsOf("sym")).as("syms"))
        .select(col("freq"), explode(expr(pairsOf("syms"))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, c)
        words = words
          .withColumn("sym",
            expr(s"replace(sym, ' ${esc(l)}  ${esc(r)} ', ' ${esc(l + r)} ')"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.result()
  }

  /** The learned merges as a DataFrame (step, lhs, rhs, pair_freq) — the
    * tokenizer-training artifact a pipeline persists.
    */
  def bpeTrainFrame(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrain(docs, textCol, numMerges)
      .map(m => (m.step, m.lhs, m.rhs, m.pairFreq))
      .toDF("step", "lhs", "rhs", "pair_freq")
  }

  /** Token count of one word-symbol-string after applying `merges` in
    * order — the merge list compiles into a chain of literal replaces.
    */
  private def encodedSyms(symCol: String, merges: Seq[Merge]): String =
    merges.foldLeft(symCol) { (acc, m) =>
      s"replace($acc, ' ${esc(m.lhs)}  ${esc(m.rhs)} ', ' ${esc(m.lhs + m.rhs)} ')"
    }

  /** ENCODE: per-document token counts under the learned tokenizer —
    * (idCol, n_words, n_tokens). Entirely row-local (the merge chain rides
    * the scan as literal replaces inside codegen); the REAL subword count
    * that [[TextAnalysis.approxSubwordCount]] only approximates.
    */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
                      merges: Seq[Merge]): DataFrame = {
    val perWord = encodedSyms(symExpr("w"), merges)
    docs.select(
      col(idCol),
      expr(Dedup.letBind(Dedup.tokensExpr(textCol), "ws",
        s"""named_struct(
           |  'n_words', size(ws),
           |  'n_tokens', aggregate(ws, 0, (acc, w) ->
           |      acc + size(${symsOf(s"($perWord)")}))
           |)""".stripMargin)).as("r"))
      .select(col(idCol),
        col("r.n_words").cast("long").as("n_words"),
        col("r.n_tokens").cast("long").as("n_tokens"))
  }
}
