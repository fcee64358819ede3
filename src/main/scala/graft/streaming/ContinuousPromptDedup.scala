package graft.streaming

import graft.operators.PreferencePairs
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous preference-record intake with FIRST-SEEN prompt dedup: the
  * streaming twin of [[PreferencePairs.withPromptDup]]'s keep-first rule,
  * for the annotation-queue shape where labeled (prompt, chosen,
  * rejected) records arrive continuously and the trainer must never see a
  * prompt twice. "First" means arrival order: batch id, then smallest
  * record id within the batch.
  *
  * Two invariants the batch twin also carries:
  *   - INVALID records are filtered before the stateful stage, so they
  *     neither emit nor SHIELD a later valid record for the same prompt
  *     (validation is stateless — it rides the stream scan);
  *   - state is one boolean per prompt key (the smallest keyed state
  *     possible), sharded by the same 60-bit hash the batch dedup
  *     shuffles on. No timeout: a dedup frontier never forgets.
  */
object ContinuousPromptDedup {

  /** One serialized preference record arriving on the stream. */
  case class PrefRecord(rec_id: Long, json: String)

  /** First valid record of a prompt, flattened for the trainer. */
  case class FirstPref(prompt_key: Long, rec_id: Long,
                       chosen_text: String, rejected_text: String)

  /** Parse + validate + keep the first-ever VALID record per prompt.
    * Append mode: a prompt emits exactly once, in the micro-batch that
    * first carries a valid record for it.
    */
  def firstSeen(records: Dataset[PrefRecord],
                maxLenRatio: Int = 4,
                family: String = graft.functions.HashFamily.Xx64)
               (implicit spark: SparkSession): Dataset[FirstPref] = {
    import spark.implicits._
    val rec = PreferencePairs.parsePair(col("json"))
    records
      .select(col("rec_id"), rec.as("rec"))
      .filter(PreferencePairs.validPair(col("rec"), maxLenRatio))
      .select(
        expr(graft.operators.TextAnalysis.hash60("rec.prompt", family))
          .as("prompt_key"),
        col("rec_id"),
        PreferencePairs.flattenBranch(col("rec"), "chosen").as("chosen_text"),
        PreferencePairs.flattenBranch(col("rec"), "rejected").as("rejected_text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, FirstPref](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, batch: Iterator[(Long, Long, String, String)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = batch.minBy(_._2)
            Iterator.single(FirstPref(key, first._2, first._3, first._4))
          }
      }
  }
}
