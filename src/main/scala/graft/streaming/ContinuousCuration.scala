package graft.streaming

import graft.operators.{Curation, Dedup, Pipeline, UrlOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** EXACTLY-ONCE streaming curation: the batch [[Curation.curate]] stage
  * chain — URL dedup → domain blocklist → word blocklist → quality gate →
  * exact dedup → near-dup — composed over a file stream with PERSISTED
  * state, so each arriving wave of documents costs O(wave ⋈ index), never
  * a recompute over history (r11 VERDICT #5: the incremental pieces
  * existed — [[IncrementalIngest.warcAvailableNow]],
  * [[ContinuousUrlDedup]], [[ContinuousDedup]] — this is the one build
  * that composes them).
  *
  * == State & exactly-once ==
  *
  * Three persisted indexes under `workDir`, each written `batch_id=N`
  * hive-partitioned with dynamic partition overwrite (the
  * [[ContinuousDedup]] idempotence idiom):
  *
  *  - `url_index/`: every canonical URL seen (pre-gate input, matching
  *    the batch pipeline where URL dedup runs FIRST over raw input);
  *  - `norm_index/`: md5 of the normalized text of every doc that reached
  *    the exact-dedup stage (gate survivors — a dropped dup's norm equals
  *    its keeper's, so survivors suffice to block later copies);
  *  - `lsh_index/`: [[Dedup.lshIndex]] band keys of every exact-dedup
  *    survivor (near-stage INPUTS, kept or near-dropped: a later doc
  *    similar only to a near-DROPPED doc still belongs to that cluster).
  *
  * Crash-replay convergence: a replayed micro-batch N reads index
  * partitions `batch_id < N` only — its own half-written state is
  * invisible — and overwrites exactly its own `batch_id=N` partitions, so
  * replay is bit-identical, never doubled. Survivors append to `out/`
  * partitioned `(batch_id, split)` ("split-partitioned append"); per-batch
  * audited drop counts land in `audit/batch_id=N/`.
  *
  * == Semantics vs the batch build ==
  *
  * Every stateless stage (blocklists, quality gate, split assignment) is
  * the batch code called per wave — identical by construction. The three
  * STATEFUL dedups run FIRST-SEEN keep rules (a streaming build cannot
  * retract an emitted doc). When waves arrive in ascending-id order:
  *
  *  - URL + exact dedup equal the batch min-id-per-key rule exactly;
  *  - near-dup equals the batch rule ([[Dedup.dedupedCorpus]]'s
  *    connected-components cluster-min) exactly WHEN every non-minimal
  *    cluster member pairs DIRECTLY with some smaller member (true of
  *    real near-dup clusters, which are variants of one base text and
  *    pairwise similar). The divergence class is the chain-shaped
  *    component whose later members pair only with larger ids — batch
  *    CC-min retracts the middle of the chain, append-mode streaming
  *    cannot. ContinuousCurationSpec pins the divergence by J-exact
  *    construction AND asserts two waves ≡ one batch run on the real
  *    corpus — and [[reconcile]] CLOSES it: the batch CC-min rule is
  *    recomputed from the persisted index on a maintenance schedule and
  *    any retraction commits as one atomic snapshot.
  *
  * The packing stage is deliberately NOT streamed: bin boundaries are
  * running sums over the final ordered corpus, so packing is the batch
  * post-step over `out/` ([[Pipeline.packSequences]]) at release time.
  *
  * Front door: [[runAvailableNow]] reads a JSON document stream;
  * [[IncrementalIngest.warcAvailableNow]] upstream turns raw WARC
  * segments into exactly such a document table (url from
  * WARC-Target-URI, text from the payload), so crawl-to-corpus is two
  * checkpointed hops with no rescans.
  */
object ContinuousCuration {

  /** Per-wave audited drop counts (the -1 convention of
    * [[Curation.Report]]: stage disabled). */
  final case class WaveReport(batchId: Long, nInput: Long, nAfterUrl: Long,
                              nAfterBlocklist: Long, nAfterWordBlocklist: Long,
                              nAfterQuality: Long, nAfterExact: Long,
                              nAfterNearDedup: Long)

  private def readIndex(spark: SparkSession, dir: String, batchId: Long,
                        schemaOf: => DataFrame): DataFrame =
    // existence probe must not launch a job (r12 ADVICE: the old
    // Try(...isEmpty) ran schema inference PLUS a first-partition scan,
    // three times per wave): spark.read.parquet resolves its schema from
    // footers driver-side; a missing or empty directory throws
    // AnalysisException at read() time with zero tasks launched. The
    // catch covers ONLY the read — a directory that EXISTS but lacks the
    // batch_id column (corrupted/foreign parquet in the work dir) must
    // fail loudly at the filter below, never read as empty history
    {
      val loaded =
        try Some(spark.read.parquet(dir))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      loaded match {
        case Some(df) => df.filter(col("batch_id") < batchId).drop("batch_id")
        case None => schemaOf.limit(0)
      }
    }

  private def writePartitioned(df: DataFrame, dir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("batch_id").parquet(dir)

  /** Curate ONE wave against the persisted indexes (exposed for the spec's
    * crash-replay test; [[runAvailableNow]] calls this per micro-batch).
    * `docs` must carry `doc_id`, `urlCol`, and `text`. */
  def curateWave(docs: DataFrame, batchId: Long, workDir: String,
                 urlCol: String,
                 domainBlocklist: Option[DataFrame],
                 wordBlocklist: Option[DataFrame],
                 quality: Curation.QualityConfig,
                 nearDupThreshold: Double,
                 splits: Seq[(String, Double)],
                 seed: String,
                 snapshotOut: Boolean = false): WaveReport = {
    val s = docs.sparkSession
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val input = docs.localCheckpoint() // wave-sized; cuts source lineage
      val nInput = input.count()

      // 1. URL first-seen dedup (vs history + min-id within the wave)
      val keyed = UrlOps.withUrlParts(input, urlCol, canonicalCol = "_curl")
        .localCheckpoint()
      val urlIdx = readIndex(s, s"$workDir/url_index", batchId,
        keyed.select(col("_curl").as("canonical_url")))
      val waveKeep = keyed.withColumn("_keep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("_curl")))
        .filter(col("doc_id") === col("_keep")).drop("_keep")
      val afterUrl = waveKeep
        .join(urlIdx, waveKeep("_curl") === urlIdx("canonical_url"), "left_anti")
      // index EVERY canonical url this wave introduced (pre-gate input,
      // the batch pipeline's URL-first ordering)
      writePartitioned(
        keyed.select(col("_curl").as("canonical_url")).distinct()
          .join(urlIdx, Seq("canonical_url"), "left_anti"),
        s"$workDir/url_index", batchId)
      val afterUrlMat = afterUrl.drop("_curl").localCheckpoint()
      val nUrl = afterUrlMat.count()

      // 2. stateless gates — the batch operators called per wave
      val (afterBlock, nBlock) = domainBlocklist match {
        case Some(b) =>
          val kept = UrlOps.domainListFilter(afterUrlMat, urlCol, b).localCheckpoint()
          (kept, kept.count())
        case None => (afterUrlMat, -1L)
      }
      val (afterWord, nWord) = wordBlocklist match {
        case Some(w) =>
          val kept = Pipeline.wordBlocklistFilter(afterBlock, "doc_id", "text", w)
            .localCheckpoint()
          (kept, kept.count())
        case None => (afterBlock, -1L)
      }
      val gated = Curation.qualityGate(afterWord, "text", quality).localCheckpoint()
      val nQuality = gated.count()

      // 3. exact first-seen dedup on the normalized text hash
      val normed = gated.withColumn("_nh",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      val normIdx = readIndex(s, s"$workDir/norm_index", batchId,
        normed.select(col("_nh").as("norm_md5")))
      val exactWaveKeep = normed.withColumn("_keep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("_nh")))
        .filter(col("doc_id") === col("_keep")).drop("_keep")
      val afterExact = exactWaveKeep
        .join(normIdx, exactWaveKeep("_nh") === normIdx("norm_md5"), "left_anti")
        .drop("_nh").localCheckpoint()
      val nExact = afterExact.count()
      writePartitioned(
        exactWaveKeep.select(col("_nh").as("norm_md5")).distinct()
          .join(normIdx, Seq("norm_md5"), "left_anti"),
        s"$workDir/norm_index", batchId)

      // 4. near-dup first-seen vs the persisted LSH index + within-wave
      val lshIdx = readIndex(s, s"$workDir/lsh_index", batchId,
        Dedup.lshIndex(afterExact.limit(0), "doc_id", "text"))
      val pairs =
        Dedup.incrementalNearDuplicates(afterExact, lshIdx, "doc_id", "text",
          threshold = nearDupThreshold)
      val ids = afterExact.select("doc_id")
      // a doc drops if it pairs with ANY earlier doc: the larger side of
      // every pair, plus the wave side of any wave-vs-history pair
      val losers = pairs.select(col("id_b").as("doc_id"))
        .unionByName(pairs
          .join(ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
          .join(ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_anti")
          .select(col("id_a").as("doc_id")))
        .distinct()
      val survivors = afterExact.join(losers, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val nNear = survivors.count()
      // index ALL near-stage inputs (kept or dropped — see object doc)
      writePartitioned(Dedup.lshIndex(afterExact, "doc_id", "text"),
        s"$workDir/lsh_index", batchId)

      // 5. split assignment (pure function of id) + split-partitioned append.
      // snapshotOut = true routes survivors through a versioned
      // SnapshotTable txn commit instead (one atomic snapshot per wave,
      // idempotent on replay by the wave id, "the corpus as of wave N" a
      // version read) — the crawl→curation→versioned-corpus composition.
      val out = Pipeline.hashSplit(survivors, "doc_id", s"$seed-split", splits)
        .withColumn("n_tokens",
          expr(s"CAST(size(${Dedup.tokensExpr("text")}) AS BIGINT)"))
      if (snapshotOut)
        graft.sources.SnapshotTable.commitAppendTxn(out, s"$workDir/out",
          partitionCols = Seq("split"), txnId = s"curate-$batchId")
      else
        out.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("batch_id", "split")
          .parquet(s"$workDir/out")

      val report = WaveReport(batchId, nInput, nUrl, nBlock, nWord,
        nQuality, nExact, nNear)
      import s.implicits._
      writePartitioned(
        Seq((report.nInput, report.nAfterUrl, report.nAfterBlocklist,
          report.nAfterWordBlocklist, report.nAfterQuality,
          report.nAfterExact, report.nAfterNearDedup))
          .toDF("n_input", "n_after_url", "n_after_blocklist",
            "n_after_word_blocklist", "n_after_quality", "n_after_exact",
            "n_after_near_dedup"),
        s"$workDir/audit", batchId)
      report
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** The RECONCILIATION pass that closes the documented append-mode
    * divergence (see the object doc and the chain test in
    * ContinuousCurationSpec): recompute the FULL batch near-dup rule —
    * connected-components cluster-min — over the persisted LSH index
    * (no corpus re-read, no re-hashing:
    * [[Dedup.indexNearDuplicates]]), and if any streamed survivor turns
    * out to be a non-minimal cluster member (possible only via
    * chain-shaped components whose middle the stream could not retract),
    * commit the RETRACTED corpus as one new atomic snapshot (requires
    * `snapshotOut = true` waves). Readers switch atomically; the
    * pre-reconcile corpus stays time-travelable.
    *
    * This is the lambda-architecture split made explicit: waves give
    * O(wave ⋈ index) availability with first-seen semantics;
    * reconciliation pays the batch band self-join on ITS schedule (e.g.
    * daily) and restores exact batch semantics. Returns
    * (snapshotVersion, nRetracted) — no commit when nothing retracts.
    */
  def reconcile(spark: SparkSession, workDir: String,
                nearDupThreshold: Double = 0.7): (Long, Long) = {
    val table = s"$workDir/out"
    val idx = spark.read.parquet(s"$workDir/lsh_index").drop("batch_id")
    val pairs = Dedup.indexNearDuplicates(idx, "doc_id", nearDupThreshold)
    val cc = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    // the corpus is deliberately NOT cached: snapshot commits write to a
    // FRESH data/vN directory, so reading the current snapshot's files
    // while writing the reconciled one is conflict-free — two scans beat
    // materializing a 100 TB frame. cc is violation-sized (broadcast
    // side of both joins).
    val current = graft.sources.SnapshotTable.readSnapshot(spark, table)
    // keeper per cluster = the minimal member PRESENT IN THE SNAPSHOT,
    // not the global cluster min: with out-of-order doc_id arrival (the
    // documented divergence regime) the min-id member may have been
    // first-seen-dropped in its wave and never emitted — retracting every
    // non-global-min would then delete ALL of a cluster's emitted
    // representatives (r12 ADVICE). Batch semantics keep exactly one; so
    // does this rule, and it equals batch CC-min whenever the min was
    // emitted. The inner join is corpus ⋈ violation-sized cc (broadcast);
    // the window runs over the clustered-members frame only.
    val losers = current.select("doc_id")
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .withColumn("_min", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster")))
      .filter(col("doc_id") =!= col("_min"))
      .select("doc_id")
    val retractable = current.join(losers, Seq("doc_id"), "left_semi").count()
    if (retractable == 0L)
      return (graft.sources.SnapshotTable.currentVersion(table).get, 0L)
    val reconciled = current.join(losers, Seq("doc_id"), "left_anti")
    val v = graft.sources.SnapshotTable.commitOverwrite(reconciled, table,
      partitionCols = Seq("split"))
    (v, retractable)
  }

  /** Drain all currently-available new document files from `srcDir`
    * through the curation chain into `workDir` (out/ + indexes + audit),
    * exactly-once. Safe to call repeatedly and after crashes — the
    * checkpoint carries the source's seen-files log, and every batch
    * write is `batch_id`-partition idempotent. */
  def runAvailableNow(spark: SparkSession, srcDir: String, schema: StructType,
                      workDir: String, urlCol: String = "url",
                      domainBlocklist: Option[DataFrame] = None,
                      wordBlocklist: Option[DataFrame] = None,
                      quality: Curation.QualityConfig = Curation.QualityConfig(),
                      nearDupThreshold: Double = 0.7,
                      splits: Seq[(String, Double)] =
                        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
                      seed: String = "graft-cc",
                      maxFilesPerTrigger: Int = 1000,
                      snapshotOut: Boolean = false): Unit = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format("json").load(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        curateWave(batch.toDF(), batchId, workDir, urlCol, domainBlocklist,
          wordBlocklist, quality, nearDupThreshold, splits, seed, snapshotOut)
        ()
      }
      .option("checkpointLocation", s"$workDir/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
