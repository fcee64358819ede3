package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    s.read.parquet(s"$dir/documents.parquet")

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_f3_sft_flatten" -> ((s, dir) =>
      sftFlattenQuery(docs(s, dir)).orderBy("doc_id")),

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

  val oracles: Map[String, String] = Map(
    "q_f3_sft_flatten" ->
      s"""$duckDerived
         |SELECT doc_id, n_turns, valid, n_assistant_chars, n_user_chars,
         |       flat_md5
         |FROM c ORDER BY doc_id""".stripMargin,

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
