package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end CORPUS CURATION pipeline — the engine's operators
  * composed into the sequence a production training-data build runs, with
  * a per-stage survivor report:
  *
  *   raw docs
  *     → quality gate        (row-local: token count, lexical diversity,
  *                            repetition, char entropy — one scan)
  *     → decontamination     (optional: drop docs sharing k-grams with a
  *                            broadcast benchmark set — corpus never
  *                            shuffles here)
  *     → substring scrub     (optional: cut corpus-duplicated spans, then
  *                            re-apply the token floor to the rewrite —
  *                            BEFORE near-dup so boilerplate doesn't
  *                            inflate pairwise similarity)
  *     → exact dedup         (normalized-text keeper groups)
  *     → near-dup dedup      (MinHash-LSH clusters → canonical keepers)
  *     → leak-free split     (seeded hash buckets: train/valid/test)
  *     → sequence packing    (token-budget bins per (split, shard))
  *     → write               (partitioned by split, deterministic
  *                            training order inside each shard)
  *
  * Every stage is an already-oracle-checked operator; this class pins the
  * COMPOSITION: stage order (near-dup runs on exact-deduped survivors, so
  * its pair generation never wastes work on byte-identical copies), the
  * shared seed discipline (one seed drives split membership, shard
  * assignment, and training order — a rerun of any suffix of the pipeline
  * reproduces byte-identical outputs), and the survivor accounting a
  * dataset card needs.
  *
  * Scale notes. The quality gate and all sampling/splitting decisions are
  * row-local pure functions; the two dedup stages are the only wide ops
  * (one hash-key shuffle for exact, the banded LSH joins for near-dup);
  * packing is one window per (split, shard); the write is dynamic
  * partition overwrite so a re-run replaces, not duplicates.
  */
object Curation {

  /** Per-stage survivor counts and the packed-corpus totals. The two
    * optional stages report -1 when disabled so a dataset card can tell
    * "stage off" from "stage dropped nothing".
    */
  final case class Report(nInput: Long, nAfterQuality: Long,
                          nAfterExactDedup: Long, nAfterNearDedup: Long,
                          splitCounts: Map[String, Long],
                          nBins: Long, nTokens: Long,
                          nAfterDecontam: Long = -1L,
                          nAfterScrub: Long = -1L)

  /** Quality thresholds for the row-local gate. Defaults are the
    * web-corpus heuristics (Gopher-family): enough tokens, some lexical
    * diversity, bounded intra-doc repetition, non-degenerate character
    * entropy.
    */
  final case class QualityConfig(minTokens: Int = 10,
                                 minTtr: Double = 0.2,
                                 maxDupNgramFrac: Double = 0.6,
                                 minCharEntropy: Double = 1.0)

  /** The row-local quality gate as one filter expression — all signals
    * compute inside the same scan, no shuffle, no second pass.
    */
  def qualityGate(docs: DataFrame, textCol: String,
                  cfg: QualityConfig): DataFrame = {
    val w = Dedup.tokensExpr(textCol)
    val gate = Dedup.letBind(w, "wv",
      s"""size(wv) >= ${cfg.minTokens} AND
         |CAST(size(array_distinct(wv)) AS DOUBLE) / size(wv) >= ${cfg.minTtr}
         |""".stripMargin)
    docs
      .filter(expr(gate))
      .filter(TextAnalysis.charEntropy(textCol) >= cfg.minCharEntropy)
      .join(
        TextAnalysis.repetitionStats(docs, "doc_id", textCol, n = 2)
          .filter(col("dup_ngram_frac") <= cfg.maxDupNgramFrac)
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
  }

  /** Run the full curation build. Writes the packed corpus to `outDir`
    * partitioned by split, returns the survivor report. Deterministic:
    * same inputs + seed ⇒ byte-identical outputs and report.
    */
  def curate(docs: DataFrame, outDir: String, seed: String,
             quality: QualityConfig = QualityConfig(),
             nearDupThreshold: Double = 0.7,
             splits: Seq[(String, Double)] =
               Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
             shards: Int = 8, budgetTokens: Long = 512L,
             benchmark: Option[DataFrame] = None, decontamWindow: Int = 8,
             scrubWindow: Int = 0): Report = {
    val nInput = docs.count()

    val afterQuality0 = qualityGate(docs, "text", quality)
      .persist()
    val nQuality = afterQuality0.count()

    // Benchmark decontamination BEFORE any dedup work: flagged docs must
    // not ship, so dropping them first also spares the wide stages. The
    // benchmark gram set broadcasts; this stage never shuffles the corpus
    // (the benchmark frame must expose bench_id/btext).
    val afterDecontam = benchmark match {
      case Some(b) =>
        Dedup.decontaminate(afterQuality0, "doc_id", "text",
          b, "bench_id", "btext", k = decontamWindow).persist()
      case None => afterQuality0
    }
    val nDecontam = if (benchmark.isDefined) afterDecontam.count() else -1L

    // Substring scrub (boilerplate removal) BEFORE near-dup dedup: shared
    // boilerplate inflates pairwise similarity, so cutting it first makes
    // the MinHash stage measure the prose, not the license header. Docs
    // scrubbed below the TOKEN floor drop (only minTokens re-applies to
    // the rewritten text; the other gate signals keep their pre-scrub
    // verdicts).
    val afterScrub = if (scrubWindow > 0) {
      val clean = Dedup.scrubDuplicatedSpans(afterDecontam, "doc_id", "text",
          k = scrubWindow)
        .select(col("id").as("doc_id"), col("clean_text"))
      afterDecontam.drop("text")
        .join(clean.withColumnRenamed("clean_text", "text"), "doc_id")
        .filter(expr(
          s"size(${Dedup.tokensExpr("text")}) >= ${quality.minTokens}"))
        .persist()
    } else afterDecontam
    val nScrub = if (scrubWindow > 0) afterScrub.count() else -1L
    val afterQuality = afterScrub

    // exact dedup first: byte-identical copies never reach the LSH stage
    val exactKeepers = afterQuality
      .withColumn("_norm",
        regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("_keep", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("_norm")))
      .filter(col("doc_id") === col("_keep"))
      .drop("_norm", "_keep")
      .persist()
    val nExact = exactKeepers.count()

    val deduped = Dedup.dedupedCorpus(exactKeepers, "doc_id", "text",
        shingleSize = 2, threshold = nearDupThreshold)
      .persist()
    val nNear = deduped.count()

    val split = Pipeline.hashSplit(deduped, "doc_id", s"$seed-split", splits)
    val withTokens = split
      .withColumn("n_tokens",
        expr(s"CAST(size(${Dedup.tokensExpr("text")}) AS BIGINT)"))
      .withColumn("shard",
        Pipeline.hashBucket(col("doc_id"), s"$seed-shard")
          .substr(1, 2).cast("string"))
    // training order inside each (split, shard): the seeded shuffle key —
    // packing walks documents in that order, so bins ARE the training order
    val ordered = withTokens
      .withColumn("ord", Pipeline.shuffleKey(col("doc_id"), s"$seed-order"))
    val packed = Pipeline.packSequences(ordered
        .withColumn("_g", concat_ws("/", col("split"), col("shard"))),
        "_g", "ord", "n_tokens", budgetTokens)
      .drop("_g")
      .persist()

    val splitCounts = packed.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = packed.agg(
      countDistinct(col("split"), col("shard"), col("bin")).as("bins"),
      sum("n_tokens").as("toks")).head()

    packed
      .repartition(col("split"), col("shard"))
      .sortWithinPartitions("split", "shard", "bin", "ord")
      .write.mode("overwrite").partitionBy("split")
      .parquet(outDir)

    (Seq(afterQuality0, exactKeepers, deduped, packed) ++
      benchmark.map(_ => afterDecontam) ++
      (if (scrubWindow > 0) Seq(afterScrub) else Nil)).foreach(_.unpersist())
    Report(nInput, nQuality, nExact, nNear, splitCounts,
      totals.getLong(0), totals.getLong(1), nDecontam, nScrub)
  }
}
