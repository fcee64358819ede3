package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** SFT / conversation-data preparation — the stage an instruction-tuning
  * corpus build runs between raw conversation records and the trainer:
  * parse the turn list, validate the role protocol, flatten with a chat
  * template, and account the loss-masked vs trained (assistant) character
  * mass. Every function here is a row-local `from_json` + higher-order
  * array expression in one codegen span — at 100 TB this rides the scan
  * exactly like the other row-local cards (q_t26/q_t29 class).
  *
  * Protocol (the strict two-role form): a conversation is valid iff it
  * parses, has an even number of >= 2 turns, alternates user/assistant
  * starting with user (which forces it to END on assistant — the turn a
  * trainer computes loss on), and every content is non-empty. Optional
  * leading system turns are a template concern deliberately out of scope
  * here: normalize them into the first user turn upstream.
  */
object Conversations {

  /** Schema of a serialized turn list: `[{"role": ..., "content": ...}]`. */
  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parse a JSON turn-list column (null on malformed input — malformed
    * records flow through as invalid, they never kill the job).
    */
  def parseTurns(jsonCol: Column): Column = from_json(jsonCol, turnSchema)

  /** Protocol validity of a parsed turn list, as one boolean column —
    * always true/false, never NULL. A turn with a missing/null `role`
    * would null-propagate through `===` and then through `forall`
    * (SQL three-valued logic), so the per-turn predicate is coalesced to
    * false: a turn that cannot prove itself valid is invalid, and
    * downstream `valid.cast("int")` sums stay exact on real records.
    */
  def validTurns(turns: Column): Column =
    turns.isNotNull &&
      size(turns) >= 2 && size(turns) % 2 === 0 &&
      forall(transform(turns, (t, i) =>
        coalesce(
          t.getField("role") === when(i % 2 === 0, "user").otherwise("assistant") &&
            t.getField("content").isNotNull &&
            length(t.getField("content")) > 0,
          lit(false))), x => x)

  /** Flatten with the minimal chat template `<|role|>content...` — the
    * deterministic serialization a trainer tokenizes. Empty string for
    * unparseable rows.
    */
  def flattenTurns(turns: Column): Column =
    when(turns.isNull, lit("")).otherwise(
      aggregate(turns, lit(""), (acc, t) =>
        concat(acc, lit("<|"), t.getField("role"), lit("|>"),
          coalesce(t.getField("content"), lit("")))))

  /** Total content characters carried by `role`'s turns (the assistant
    * mass is what the loss trains on; the user mass is masked).
    */
  def roleChars(turns: Column, role: String): Column =
    when(turns.isNull, lit(0L)).otherwise(
      aggregate(filter(turns, t => t.getField("role") === role),
        lit(0L), (acc, t) =>
          acc + coalesce(length(t.getField("content")).cast("long"), lit(0L))))
}
