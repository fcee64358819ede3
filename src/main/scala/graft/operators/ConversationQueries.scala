package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-facing queries for the SFT / conversation-prep layer
  * ([[Conversations]]).
  *
  * The documents table has no conversation column, so each query PLANTS a
  * serialized turn list in-query (the q_u1/q_t29 discipline): four text
  * substrings become turn contents, and `doc_id % 4` picks the record
  * shape — 2-turn valid, 4-turn valid, 3-turn role-repeat (protocol
  * violation), or empty-assistant (content violation). The JSON is built
  * by string concatenation, NOT `to_json`, so the engine's `from_json` is
  * exercised against independently-constructed input.
  *
  * PLANTED-CONSTRUCTION oracles: DuckDB never parses the JSON — every
  * expected column (turn counts, validity, role character masses, the
  * flattened-template md5) is computed analytically from the four
  * substrings and the variant, so a shared parse/flatten bug cannot
  * cancel out. Validity is data-dependent through the non-empty rule:
  * docs too short to fill a planted turn go invalid in BOTH derivations.
  */
object ConversationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents")

  // the four planted turn contents (text is lowercase words + spaces at
  // every sf, so splicing into JSON needs no escaping; substrings past the
  // end are '' in Spark and DuckDB alike)
  private val pieces = Seq(
    "substring(t, 1, 30)", "substring(t, 31, 40)",
    "substring(t, 71, 25)", "substring(t, 96, 30)")

  private def turnJson(role: String, contentExpr: String): String =
    s"""concat('{"role":"$role","content":"', $contentExpr, '"}')"""

  /** The serialized conversation per variant (SQL text over `t`). */
  private[graft] val convJsonExpr: String = {
    val Seq(t1, t2, t3, t4) = pieces
    s"""CASE CAST(doc_id % 4 AS INT)
       |  WHEN 0 THEN concat('[', ${turnJson("user", t1)}, ',',
       |                     ${turnJson("assistant", t2)}, ']')
       |  WHEN 1 THEN concat('[', ${turnJson("user", t1)}, ',',
       |                     ${turnJson("assistant", t2)}, ',',
       |                     ${turnJson("user", t3)}, ',',
       |                     ${turnJson("assistant", t4)}, ']')
       |  WHEN 2 THEN concat('[', ${turnJson("user", t1)}, ',',
       |                     ${turnJson("user", t3)}, ',',
       |                     ${turnJson("assistant", t2)}, ']')
       |  ELSE concat('[', ${turnJson("user", t1)}, ',',
       |              ${turnJson("assistant", "''")}, ']')
       |END""".stripMargin
  }

  /** Shared construction + parse + validate + flatten body (the ScaleBench
    * leg reuses it without the registry's output sort).
    */
  private[graft] def sftFlattenQuery(d: DataFrame): DataFrame = {
    val parsed = Conversations.parseTurns(col("conv_json"))
    d.selectExpr("doc_id", "coalesce(text, '') AS t")
      .selectExpr("doc_id", s"$convJsonExpr AS conv_json")
      .select(col("doc_id"), parsed.as("tv"))
      .select(col("doc_id"),
        coalesce(size(col("tv")), lit(0)).as("n_turns"),
        Conversations.validTurns(col("tv")).cast("int").as("valid"),
        Conversations.roleChars(col("tv"), "assistant").as("n_assistant_chars"),
        Conversations.roleChars(col("tv"), "user").as("n_user_chars"),
        md5(Conversations.flattenTurns(col("tv"))).as("flat_md5"))
  }

  // ---- preference pairs (DPO) ------------------------------------------
  // Planted construction, doc_id % 5 picks the record shape: valid pair /
  // chosen==rejected / empty prompt / branch-length-ratio violation /
  // malformed JSON. Orthogonally, doc_id % 7 == 0 records share ONE fixed
  // prompt so prompt-level dedup fires across records. Validity is
  // data-dependent through the non-empty and ratio rules (v0 records with
  // 71 <= len(text) <= 79 fail ratio 40 : <10, longer ones pass) — the
  // oracle derives all of it analytically from the substrings.

  private val fixedPrompt = "please summarize this document"

  private[graft] val prefJsonExpr: String = {
    val Seq(t1, t2, t3, _) = pieces
    val t5 = "substring(t, 71, 3)"
    val p = s"CASE WHEN doc_id % 7 = 0 THEN '$fixedPrompt' ELSE $t1 END"
    def rec(pe: String, c: String, r: String) =
      s"""concat('{"prompt":"', $pe, '","chosen":"', $c, '","rejected":"', $r, '"}')"""
    s"""CASE CAST(doc_id % 5 AS INT)
       |  WHEN 0 THEN ${rec(p, t2, t3)}
       |  WHEN 1 THEN ${rec(p, t2, t2)}
       |  WHEN 2 THEN ${rec("''", t2, t3)}
       |  WHEN 3 THEN ${rec(p, t2, t5)}
       |  ELSE concat('not-json ', $p)
       |END""".stripMargin
  }

  /** Shared construction + parse + validate + flatten + prompt-dedup body
    * for the preference-pair queries (ScaleBench reuses it without the
    * output sort). `family` pins the prompt-dedup hash ("md5" for the
    * registered oracle-checked queries; xx64 production default — the
    * spec asserts the families agree).
    */
  private[graft] def prefPairsQuery(d: DataFrame, family: String): DataFrame = {
    val rec = PreferencePairs.parsePair(col("pair_json"))
    val base = d.selectExpr("doc_id", "coalesce(text, '') AS t")
      .selectExpr("doc_id", s"$prefJsonExpr AS pair_json")
      .select(col("doc_id"), rec.as("rec"))
      .select(col("doc_id"),
        expr("CAST(doc_id % 5 AS INT)").as("variant"),
        PreferencePairs.validPair(col("rec")).cast("int").as("valid"),
        coalesce(col("rec.prompt"), lit("")).as("prompt"),
        coalesce(length(col("rec.prompt")), lit(0)).cast("long").as("prompt_chars"),
        coalesce(length(col("rec.chosen")), lit(0)).cast("long").as("chosen_chars"),
        coalesce(length(col("rec.rejected")), lit(0)).cast("long").as("rejected_chars"),
        md5(PreferencePairs.flattenBranch(col("rec"), "chosen")).as("chosen_md5"),
        md5(PreferencePairs.flattenBranch(col("rec"), "rejected")).as("rejected_md5"))
    PreferencePairs.withPromptDup(base, "doc_id", "valid", "prompt", family)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TOKEN-LEVEL LOSS MASKS for SFT (round 13): the per-sample artifact
    // an instruction-tuning run needs next to the flattened text — which
    // token positions train (assistant turns) and which are masked
    // (user turns), under the REAL 1k+-merge tokenizer. Valid
    // conversations only; per-turn counts ride the turn explode via the
    // BPE kernel (turn contents are substring CUTS, so fragment words
    // outside the corpus vocabulary must tokenize too — the kernel does,
    // and the oracle extends its encode replay to the fragment words
    // while deriving MERGES from the corpus alone, exactly like the
    // engine). One per-doc window computes the stream offsets; the mask
    // is the assistant spans in token space.
    "q_f9_sft_loss_mask" -> ((s, dir) => {
      val merges = TextQueries.constructed1kMerges(s, dir)
      val codec = Tokenizer.codecOf(merges)
      val parsed = Conversations.parseTurns(col("conv_json"))
      val turns = docs(s, dir)
        .selectExpr("doc_id", "coalesce(text, '') AS t")
        .selectExpr("doc_id", s"$convJsonExpr AS conv_json")
        .select(col("doc_id"), parsed.as("tv"))
        .filter(Conversations.validTurns(col("tv")))
        .select(col("doc_id"), posexplode(col("tv")).as(Seq("turn", "tr")))
        .select(col("doc_id"), col("turn"), col("tr.role").as("role"),
          graft.functions.BpeExprs.docTokenCount(
            filter(split(col("tr.content"), " "), x => x =!= ""), codec)
            .as("n"))
      val w = Window.partitionBy("doc_id").orderBy("turn")
      turns
        .withColumn("end_off", sum(col("n")).over(w))
        .withColumn("start_off", col("end_off") - col("n"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_turns"),
          sum("n").as("total_tokens"),
          sum(when(col("role") === "assistant", col("n")).otherwise(0L))
            .as("trained_tokens"),
          sort_array(collect_list(struct(col("turn"), col("role"),
            col("start_off"), col("end_off")))).as("ts"))
        .select(col("doc_id"), col("n_turns"), col("total_tokens"),
          col("trained_tokens"),
          expr("""array_join(transform(
                 |  filter(ts, x -> x.role = 'assistant'),
                 |  x -> concat(CAST(x.start_off AS STRING), '-',
                 |              CAST(x.end_off AS STRING))), ',')""".stripMargin)
            .as("mask_str"))
        .orderBy("doc_id")
    }),

    // INTEGER-EXACT Bradley–Terry ratings (round 13): matchups are
    // planted from doc_id arithmetic with a SKILL-BIASED deterministic
    // winner rule (higher model index wins more often), so the fitted
    // ordering is known; the MM iterations run in fixed-point integer
    // arithmetic (floor at every division, ascending-opponent summation,
    // Σ-normalized per iteration) so DuckDB replays all 12 iterations
    // bit-for-bit through a list-state recursive CTE — a floating-point
    // fit could not be hash-checked.
    "q_f10_bradley_terry" -> ((s, dir) => {
      val g = docs(s, dir)
        .selectExpr("doc_id", "doc_id % 8 AS m", "(doc_id div 8) % 8 AS o")
        .filter(col("m") =!= col("o"))
        .withColumn("m_wins",
          expr("(doc_id div 64) % (m + o + 2) < m + 1"))
        .selectExpr(
          "concat('model_', CASE WHEN m_wins THEN m ELSE o END) AS winner",
          "concat('model_', CASE WHEN m_wins THEN o ELSE m END) AS loser")
      PreferencePairs.bradleyTerryIntegerRatings(g, "winner", "loser",
          iterations = 12)
        .orderBy("model")
    }),

    "q_f3_sft_flatten" -> ((s, dir) =>
      sftFlattenQuery(docs(s, dir)).orderBy("doc_id")),

    // Per-record preference-pair card: validity, prompt-dup flag, kept
    // flag, branch masses, and both flattened-branch digests.
    "q_f5_pref_pairs" -> ((s, dir) =>
      prefPairsQuery(docs(s, dir), graft.functions.HashFamily.Md5)
        .select("doc_id", "variant", "valid", "prompt_dup", "kept",
          "chosen_chars", "rejected_chars", "chosen_md5", "rejected_md5")
        .orderBy("doc_id")),

    // The corpus-level DPO accounting a dataset card publishes: per
    // variant-shape — record/valid/dup/kept counts and the chosen /
    // rejected / prompt character masses over the SHIPPED (kept) records.
    // One row-local pass + the dedup exchange + one tiny group-by-5.
    "q_f6_pref_accounting" -> ((s, dir) =>
      prefPairsQuery(docs(s, dir), graft.functions.HashFamily.Md5)
        .groupBy("variant")
        .agg(count(lit(1)).as("n_records"),
          sum(col("valid")).cast("long").as("n_valid"),
          sum(col("prompt_dup")).cast("long").as("n_prompt_dups"),
          sum(col("kept")).cast("long").as("n_kept"),
          sum(when(col("kept") === 1, col("chosen_chars"))
            .otherwise(lit(0L))).as("chosen_branch_chars"),
          sum(when(col("kept") === 1, col("rejected_chars"))
            .otherwise(lit(0L))).as("rejected_branch_chars"),
          sum(when(col("kept") === 1, col("prompt_chars"))
            .otherwise(lit(0L))).as("prompt_chars"))
        .orderBy("variant")),

    // K-way RANKING records -> derived DPO pairs (the InstructGPT
    // labeling shape: pairs are DERIVED from one ranked list, never
    // labeled directly). Each doc plants a 3-response ranking JSON:
    // length-staggered text prefixes (response 1 EMPTIED on doc_id%6==0),
    // ranks (d+0)%3 / (d+1)%3 / (d+3)%3 — responses 0 and 2 always TIE
    // (their pair must derive nothing) while the 0-1 / 1-2 preference
    // directions flip with doc_id%3. Pair derivation is row-local
    // (pairsFromRanking — no join, no shuffle); pair-level validity
    // (non-empty, chosen != rejected — short docs make prefixes collide)
    // filters after the explode. margin = rank gap.
    "q_f7_ranking_pairs" -> ((s, dir) => {
      val t = coalesce(col("text"), lit(""))
      val json = to_json(struct(
        concat(lit("p-"), expr("doc_id div 7")).as("prompt"),
        array(
          struct(substring(t, 1, 20).as("text"),
            expr("CAST(doc_id % 3 AS INT)").as("rank")),
          struct(when(expr("doc_id % 6 = 0"), lit(""))
              .otherwise(substring(t, 1, 24)).as("text"),
            expr("CAST((doc_id + 1) % 3 AS INT)").as("rank")),
          struct(substring(t, 1, 28).as("text"),
            expr("CAST((doc_id + 3) % 3 AS INT)").as("rank"))
        ).as("responses")))
      docs(s, dir)
        .select(col("doc_id"), PreferencePairs.parseRanking(json).as("rec"))
        .select(col("doc_id"), col("rec.prompt").as("prompt"),
          explode(PreferencePairs.pairsFromRanking(col("rec.responses"))).as("p"))
        .select(col("doc_id"), col("prompt"), col("p.chosen").as("chosen"),
          col("p.rejected").as("rejected"), col("p.margin").as("margin"))
        .filter(col("chosen") =!= "" && col("rejected") =!= "" &&
          col("chosen") =!= col("rejected"))
        .orderBy("doc_id", "margin", "chosen", "rejected")
    }),

    // Inter-annotator agreement (Cohen's kappa) over double-labeled
    // preference records — labeler-noise QA before reward training.
    // Planted labels: annotator A = (doc_id%3==0); annotator B = A XOR
    // (doc_id%7==2) — ~14% controlled disagreement; variant 3 is the
    // DEGENERATE group (both annotators constant) that must take the
    // kappa=0 branch. Exact integer confusion counts, one fixed 6-dp
    // double formula, one group-key exchange.
    "q_f8_annotator_agreement" -> ((s, dir) =>
      PreferencePairs.annotatorAgreement(
          docs(s, dir).select(
            expr("CAST(doc_id % 4 AS INT)").as("variant"),
            expr("CASE WHEN doc_id % 4 = 3 THEN 1 " +
              "ELSE CAST(doc_id % 3 = 0 AS INT) END").as("label_a"),
            expr("CASE WHEN doc_id % 4 = 3 THEN 1 " +
              "ELSE CAST((doc_id % 3 = 0) != (doc_id % 7 = 2) AS INT) END")
              .as("label_b")),
          "variant", "label_a", "label_b")
        .orderBy("variant")),

    // The corpus-level SFT accounting a dataset card publishes: per
    // variant-shape — record count, valid count, total turns, and the
    // trained (assistant) vs masked (user) character mass over VALID
    // records only. One row-local pass + one tiny group-by-4 exchange.
    "q_f4_sft_accounting" -> ((s, dir) =>
      sftFlattenQuery(docs(s, dir))
        .withColumn("variant", expr("CAST(doc_id % 4 AS INT)"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n_records"),
          sum(col("valid")).cast("long").as("n_valid"),
          sum(col("n_turns").cast("long")).as("n_turns"),
          sum(when(col("valid") === 1, col("n_assistant_chars"))
            .otherwise(lit(0L))).as("trained_chars"),
          sum(when(col("valid") === 1, col("n_user_chars"))
            .otherwise(lit(0L))).as("masked_chars"))
        .orderBy("variant"))
  )

  // Analytic DuckDB twins: expected values derived from the four
  // substrings + variant, never from the JSON.
  private val duckBase =
    """SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS v,
      |       substr(t, 1, 30) AS t1, substr(t, 31, 40) AS t2,
      |       substr(t, 71, 25) AS t3, substr(t, 96, 30) AS t4
      |FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)""".stripMargin

  private val duckDerived =
    s"""WITH b AS ($duckBase),
       |c AS (
       |  SELECT doc_id, v, t1, t2, t3, t4,
       |         CASE v WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 3 ELSE 2 END
       |           AS n_turns,
       |         CASE WHEN v = 0 THEN CAST(len(t1) > 0 AND len(t2) > 0 AS INTEGER)
       |              WHEN v = 1 THEN CAST(len(t1) > 0 AND len(t2) > 0
       |                               AND len(t3) > 0 AND len(t4) > 0 AS INTEGER)
       |              ELSE 0 END AS valid,
       |         CAST(CASE v WHEN 0 THEN len(t2) WHEN 1 THEN len(t2) + len(t4)
       |                     WHEN 2 THEN len(t2) ELSE 0 END AS BIGINT)
       |           AS n_assistant_chars,
       |         CAST(CASE v WHEN 0 THEN len(t1) WHEN 1 THEN len(t1) + len(t3)
       |                     WHEN 2 THEN len(t1) + len(t3) ELSE len(t1) END
       |              AS BIGINT) AS n_user_chars,
       |         md5(CASE v
       |           WHEN 0 THEN '<|user|>' || t1 || '<|assistant|>' || t2
       |           WHEN 1 THEN '<|user|>' || t1 || '<|assistant|>' || t2 ||
       |                       '<|user|>' || t3 || '<|assistant|>' || t4
       |           WHEN 2 THEN '<|user|>' || t1 || '<|user|>' || t3 ||
       |                       '<|assistant|>' || t2
       |           ELSE '<|user|>' || t1 || '<|assistant|>' END) AS flat_md5
       |  FROM b)""".stripMargin

  /** 60-bit md5 hash, DuckDB side — mirror of [[TextAnalysis.md5Hash60]]. */
  private def duckHash60(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  // Analytic preference-pair twin: prompt/chosen/rejected and validity are
  // derived from the substrings + variant, never from the JSON; the
  // keep-first dedup is replayed relationally over the SAME md5-60 prompt
  // key the engine shuffles on.
  private val duckPrefDerived =
    s"""WITH b AS (
       |  SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS v,
       |         substr(t, 1, 30) AS t1, substr(t, 31, 40) AS t2,
       |         substr(t, 71, 25) AS t3, substr(t, 71, 3) AS t5
       |  FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)),
       |c AS (
       |  SELECT doc_id, v,
       |         CASE WHEN v = 4 THEN NULL WHEN v = 2 THEN ''
       |              WHEN doc_id % 7 = 0 THEN '$fixedPrompt'
       |              ELSE t1 END AS prompt,
       |         CASE WHEN v = 4 THEN NULL ELSE t2 END AS chosen,
       |         CASE v WHEN 0 THEN t3 WHEN 1 THEN t2 WHEN 2 THEN t3
       |                WHEN 3 THEN t5 ELSE NULL END AS rejected
       |  FROM b),
       |d AS (
       |  SELECT doc_id, v, prompt, chosen, rejected,
       |         CASE WHEN v = 4 THEN 0 ELSE CAST(
       |           len(prompt) > 0 AND len(chosen) > 0 AND len(rejected) > 0
       |           AND chosen <> rejected
       |           AND greatest(len(chosen), len(rejected)) <=
       |               4 * least(len(chosen), len(rejected))
       |         AS INTEGER) END AS valid
       |  FROM c),
       |e AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY ${duckHash60("coalesce(prompt, '')")}, valid
       |    ORDER BY doc_id) AS rn
       |  FROM d)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_f5_pref_pairs" ->
      s"""$duckPrefDerived
         |SELECT doc_id, v AS variant, valid,
         |       CAST(valid = 1 AND rn > 1 AS INTEGER) AS prompt_dup,
         |       CAST(valid = 1 AND rn = 1 AS INTEGER) AS kept,
         |       CAST(coalesce(len(chosen), 0) AS BIGINT) AS chosen_chars,
         |       CAST(coalesce(len(rejected), 0) AS BIGINT) AS rejected_chars,
         |       CASE WHEN prompt IS NULL OR chosen IS NULL THEN md5('')
         |            ELSE md5('<|user|>' || prompt || '<|assistant|>' || chosen)
         |       END AS chosen_md5,
         |       CASE WHEN prompt IS NULL OR rejected IS NULL THEN md5('')
         |            ELSE md5('<|user|>' || prompt || '<|assistant|>' || rejected)
         |       END AS rejected_md5
         |FROM e ORDER BY doc_id""".stripMargin,

    "q_f6_pref_accounting" ->
      s"""$duckPrefDerived
         |SELECT v AS variant, count(*) AS n_records,
         |       CAST(sum(valid) AS BIGINT) AS n_valid,
         |       CAST(sum(CASE WHEN valid = 1 AND rn > 1 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_prompt_dups,
         |       CAST(sum(CASE WHEN valid = 1 AND rn = 1 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN valid = 1 AND rn = 1 THEN len(chosen)
         |                     ELSE 0 END) AS BIGINT) AS chosen_branch_chars,
         |       CAST(sum(CASE WHEN valid = 1 AND rn = 1 THEN len(rejected)
         |                     ELSE 0 END) AS BIGINT) AS rejected_branch_chars,
         |       CAST(sum(CASE WHEN valid = 1 AND rn = 1 THEN len(prompt)
         |                     ELSE 0 END) AS BIGINT) AS prompt_chars
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // the pair set replayed analytically: enumerate the three (i, j)
    // response combos per doc from the same prefix/rank arithmetic —
    // never parsing JSON — direct by rank, drop ties/empties/collisions
    "q_f7_ranking_pairs" ->
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        |r AS (
        |  SELECT doc_id, 'p-' || (doc_id // 7) AS prompt,
        |         substr(t, 1, 20) AS t0,
        |         CASE WHEN doc_id % 6 = 0 THEN '' ELSE substr(t, 1, 24) END AS t1,
        |         substr(t, 1, 28) AS t2,
        |         CAST(doc_id % 3 AS INTEGER) AS r0,
        |         CAST((doc_id + 1) % 3 AS INTEGER) AS r1,
        |         CAST((doc_id + 3) % 3 AS INTEGER) AS r2
        |  FROM d),
        |combos AS (
        |  SELECT doc_id, prompt, t0 AS a, r0 AS ra, t1 AS b, r1 AS rb FROM r
        |  UNION ALL SELECT doc_id, prompt, t0, r0, t2, r2 FROM r
        |  UNION ALL SELECT doc_id, prompt, t1, r1, t2, r2 FROM r),
        |directed AS (
        |  SELECT doc_id, prompt,
        |         CASE WHEN ra < rb THEN a ELSE b END AS chosen,
        |         CASE WHEN ra < rb THEN b ELSE a END AS rejected,
        |         CAST(abs(ra - rb) AS INTEGER) AS margin
        |  FROM combos WHERE ra <> rb)
        |SELECT doc_id, prompt, chosen, rejected, margin
        |FROM directed
        |WHERE chosen <> '' AND rejected <> '' AND chosen <> rejected
        |ORDER BY doc_id, margin, chosen, rejected""".stripMargin,

    // exact confusion counts + the SAME fixed double formula (operand
    // order mirrored so the 6-dp rounding agrees bit-for-bit)
    "q_f8_annotator_agreement" ->
      """WITH l AS (
        |  SELECT CAST(doc_id % 4 AS INTEGER) AS variant,
        |         CASE WHEN doc_id % 4 = 3 THEN 1
        |              ELSE CAST(doc_id % 3 = 0 AS INTEGER) END AS a,
        |         CASE WHEN doc_id % 4 = 3 THEN 1
        |              ELSE CAST((doc_id % 3 = 0) <> (doc_id % 7 = 2) AS INTEGER) END AS b
        |  FROM documents),
        |c AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |         CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        |  FROM l GROUP BY 1)
        |SELECT variant, n, n00, n01, n10, n11,
        |       round((n00 + n11) / CAST(n AS DOUBLE), 6) AS p_o,
        |       round(CASE WHEN (n10 + n11) * (n01 + n11)
        |                      + (n00 + n01) * (n00 + n10) = n * n THEN 0.0
        |             ELSE ((n00 + n11) / CAST(n AS DOUBLE)
        |                   - (CAST(n10 + n11 AS DOUBLE) * (n01 + n11)
        |                      + CAST(n00 + n01 AS DOUBLE) * (n00 + n10))
        |                     / (CAST(n AS DOUBLE) * n))
        |                  / (1.0 - (CAST(n10 + n11 AS DOUBLE) * (n01 + n11)
        |                            + CAST(n00 + n01 AS DOUBLE) * (n00 + n10))
        |                           / (CAST(n AS DOUBLE) * n)) END, 6) AS kappa
        |FROM c ORDER BY variant""".stripMargin,

    "q_f3_sft_flatten" ->
      s"""$duckDerived
         |SELECT doc_id, n_turns, valid, n_assistant_chars, n_user_chars,
         |       flat_md5
         |FROM c ORDER BY doc_id""".stripMargin,

    // replays the planted matchups, the count matrix as nested lists,
    // and all 12 fixed-point MM iterations through a list-state
    // recursive CTE (the recursive member references bt once; the
    // matrix rides a single-row cross join)
    "q_f10_bradley_terry" ->
      """WITH RECURSIVE
        |g AS (
        |  SELECT doc_id % 8 AS m, (doc_id // 8) % 8 AS o, doc_id // 64 AS k
        |  FROM documents WHERE doc_id % 8 != (doc_id // 8) % 8),
        |gg AS (
        |  SELECT CASE WHEN k % (m + o + 2) < m + 1 THEN m ELSE o END AS w,
        |         CASE WHEN k % (m + o + 2) < m + 1 THEN o ELSE m END AS l
        |  FROM g),
        |cnt AS (SELECT w, l, CAST(count(*) AS BIGINT) AS n FROM gg GROUP BY 1, 2),
        |rows8 AS (SELECT CAST(i AS BIGINT) AS i FROM range(8) t(i)),
        |matc AS (
        |  SELECT a.i, b.i AS j, coalesce(c.n, 0) AS n
        |  FROM rows8 a CROSS JOIN rows8 b
        |  LEFT JOIN cnt c ON c.w = a.i AND c.l = b.i),
        |matr AS (
        |  SELECT i, list(n ORDER BY j) AS row, CAST(sum(n) AS BIGINT) AS wi
        |  FROM matc GROUP BY i),
        |lossr AS (SELECT j AS i, CAST(sum(n) AS BIGINT) AS li FROM matc GROUP BY j),
        |agg AS (
        |  SELECT list(m.row ORDER BY m.i) AS nm,
        |         list(m.wi ORDER BY m.i) AS wv,
        |         list(m.wi + l.li ORDER BY m.i) AS gv,
        |         CAST(count(*) FILTER (m.wi + l.li > 0) AS HUGEINT) AS np
        |  FROM matr m JOIN lossr l ON l.i = m.i),
        |bt AS (
        |  SELECT 0 AS it,
        |         list_transform(generate_series(0, 7), i ->
        |           CASE WHEN a.gv[i + 1] > 0 THEN CAST(1000000 AS HUGEINT)
        |                ELSE CAST(0 AS HUGEINT) END) AS r
        |  FROM agg a
        |  UNION ALL
        |  SELECT q.it,
        |         list_transform(generate_series(0, 7), i ->
        |           CASE WHEN q.gv[i + 1] = 0 OR q.tot = 0
        |                THEN CAST(0 AS HUGEINT)
        |                ELSE greatest(CAST(1 AS HUGEINT),
        |                              q.nx[i + 1] * 1000000 * q.np // q.tot)
        |           END) AS r
        |  FROM (
        |    SELECT p.it, p.gv, p.np, p.nx, list_sum(p.nx) AS tot
        |    FROM (
        |      SELECT b.it + 1 AS it, a.gv, a.np,
        |             list_transform(generate_series(0, 7), i ->
        |               CASE WHEN a.gv[i + 1] = 0 THEN CAST(0 AS HUGEINT)
        |                    WHEN list_sum(list_transform(generate_series(0, 7), j ->
        |                           CASE WHEN j = i OR b.r[i + 1] + b.r[j + 1] = 0
        |                                THEN CAST(0 AS HUGEINT)
        |                                ELSE CAST(a.nm[i + 1][j + 1] + a.nm[j + 1][i + 1]
        |                                          AS HUGEINT) * 1000000000000
        |                                     // (b.r[i + 1] + b.r[j + 1]) END)) = 0
        |                    THEN CAST(0 AS HUGEINT)
        |                    ELSE CAST(a.wv[i + 1] AS HUGEINT) * 1000000000000 //
        |                         list_sum(list_transform(generate_series(0, 7), j ->
        |                           CASE WHEN j = i OR b.r[i + 1] + b.r[j + 1] = 0
        |                                THEN CAST(0 AS HUGEINT)
        |                                ELSE CAST(a.nm[i + 1][j + 1] + a.nm[j + 1][i + 1]
        |                                          AS HUGEINT) * 1000000000000
        |                                     // (b.r[i + 1] + b.r[j + 1]) END))
        |               END) AS nx
        |      FROM bt b, agg a WHERE b.it < 12) p) q)
        |SELECT 'model_' || CAST(t.i AS VARCHAR) AS model,
        |       CAST(a.wv[t.i + 1] AS BIGINT) AS n_wins,
        |       CAST(a.gv[t.i + 1] AS BIGINT) AS n_games,
        |       CAST(f.r[t.i + 1] AS BIGINT) AS rating
        |FROM (SELECT r FROM bt WHERE it = 12) f, agg a, rows8 t
        |ORDER BY model""".stripMargin,

    // analytic twin: valid conversations' turn sequences from the
    // substrings + variant; the merge table derived from the CORPUS
    // vocabulary exactly like the engine, but the encode replay runs
    // over corpus words PLUS the turn-fragment words (substr cuts split
    // words — the kernel tokenizes any word, so the oracle must too);
    // offsets/masks are one window over turn order
    "q_f9_sft_loss_mask" ->
      s"""WITH RECURSIVE
         |b AS ($duckBase),
         |cv AS (
         |  SELECT doc_id, v, t1, t2, t3, t4 FROM b
         |  WHERE (v = 0 AND len(t1) > 0 AND len(t2) > 0)
         |     OR (v = 1 AND len(t1) > 0 AND len(t2) > 0
         |         AND len(t3) > 0 AND len(t4) > 0)),
         |turns AS (
         |  SELECT doc_id, 1 AS turn, 'user' AS role, t1 AS content FROM cv
         |  UNION ALL SELECT doc_id, 2, 'assistant', t2 FROM cv
         |  UNION ALL SELECT doc_id, 3, 'user', t3 FROM cv WHERE v = 1
         |  UNION ALL SELECT doc_id, 4, 'assistant', t4 FROM cv WHERE v = 1),
         |wf AS MATERIALIZED (
         |  SELECT word, count(*) AS freq FROM (
         |    SELECT unnest(list_filter(string_split(text, ' '), x -> x != ''))
         |             AS word
         |    FROM documents)
         |  GROUP BY 1),
         |pairs AS (
         |  SELECT substr(word, i, 1) AS lhs, substr(word, i + 1, 1) AS rhs,
         |         sum(freq) AS c
         |  FROM (SELECT word, freq,
         |               unnest(generate_series(1, length(word) - 1)) AS i
         |        FROM wf WHERE length(word) >= 2)
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT lhs, rhs, row_number() OVER (ORDER BY c DESC, lhs, rhs) AS step
         |  FROM pairs),
         |base AS MATERIALIZED (SELECT lhs, rhs, step FROM ranked WHERE step <= 256),
         |chain AS (
         |  SELECT a.lhs || a.rhs AS lhs, b.lhs || b.rhs AS rhs,
         |         (SELECT count(*) FROM base) + (a.step - 1) * 32 + b.step AS step
         |  FROM base a JOIN base b ON a.step <= 32 AND b.step <= 32),
         |merges AS MATERIALIZED (
         |  SELECT lhs, rhs, step FROM base
         |  UNION ALL SELECT lhs, rhs, step FROM chain),
         |allw AS MATERIALIZED (
         |  SELECT DISTINCT word FROM (
         |    SELECT word FROM wf
         |    UNION ALL
         |    SELECT unnest(list_filter(string_split(content, ' '), x -> x != ''))
         |             AS word
         |    FROM turns)),
         |syms AS (
         |  SELECT word,
         |         '  ' || array_to_string(list_transform(generate_series(1, length(word)),
         |                                 i -> word[i]), '  ') || '  ' AS sym
         |  FROM allw),
         |enc AS (
         |  SELECT word, sym, 0 AS step FROM syms
         |  UNION ALL
         |  SELECT e.word,
         |         CASE WHEN m.lhs IS NULL THEN e.sym
         |              ELSE replace(e.sym, ' ' || m.lhs || '  ' || m.rhs || ' ',
         |                           ' ' || m.lhs || m.rhs || ' ') END,
         |         e.step + 1
         |  FROM enc e LEFT JOIN merges m ON m.step = e.step + 1
         |  WHERE e.step < 1280),
         |wtf AS MATERIALIZED (
         |  SELECT word,
         |         CAST(len(list_filter(string_split(sym, '  '), x -> x != ''))
         |              AS BIGINT) AS t
         |  FROM enc WHERE step = 1280),
         |tw AS (
         |  SELECT doc_id, turn,
         |         unnest(list_filter(string_split(content, ' '), x -> x != ''))
         |           AS word
         |  FROM turns),
         |twc AS (
         |  SELECT tw.doc_id, tw.turn, CAST(sum(wtf.t) AS BIGINT) AS n
         |  FROM tw JOIN wtf ON wtf.word = tw.word GROUP BY 1, 2),
         |tc AS (
         |  SELECT t.doc_id, t.turn, t.role, coalesce(w.n, 0) AS n
         |  FROM turns t LEFT JOIN twc w
         |    ON w.doc_id = t.doc_id AND w.turn = t.turn),
         |offs AS (
         |  SELECT doc_id, turn, role, n,
         |         CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY turn)
         |              AS BIGINT) AS end_off
         |  FROM tc)
         |SELECT doc_id, count(*) AS n_turns,
         |       CAST(sum(n) AS BIGINT) AS total_tokens,
         |       CAST(sum(CASE WHEN role = 'assistant' THEN n ELSE 0 END)
         |            AS BIGINT) AS trained_tokens,
         |       string_agg(CASE WHEN role = 'assistant'
         |                       THEN CAST(end_off - n AS VARCHAR) || '-' ||
         |                            CAST(end_off AS VARCHAR) END,
         |                  ',' ORDER BY turn) AS mask_str
         |FROM offs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_f4_sft_accounting" ->
      s"""$duckDerived
         |SELECT v AS variant, count(*) AS n_records,
         |       CAST(sum(valid) AS BIGINT) AS n_valid,
         |       CAST(sum(n_turns) AS BIGINT) AS n_turns,
         |       CAST(sum(CASE WHEN valid = 1 THEN n_assistant_chars
         |                     ELSE 0 END) AS BIGINT) AS trained_chars,
         |       CAST(sum(CASE WHEN valid = 1 THEN n_user_chars
         |                     ELSE 0 END) AS BIGINT) AS masked_chars
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
