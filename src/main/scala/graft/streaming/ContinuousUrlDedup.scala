package graft.streaming

import graft.operators.UrlOps
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous crawl intake with FIRST-SEEN URL dedup: arriving capture
  * records are canonicalized and only the first capture of each canonical
  * page ever emitted — the streaming twin of [[UrlOps.urlDedup]]'s min-id
  * keeper, with "first" meaning arrival order (batch id, then smallest id
  * within the batch), the natural rule when the stream IS the crawl.
  *
  * State is one boolean per canonical page (`GroupState[Boolean]`), the
  * smallest keyed state Structured Streaming can carry — at web scale the
  * seen-set is exactly the canonical-key cardinality and lives in the
  * state store, sharded by the same key the dedup groups on, so no
  * executor ever holds more than its shard. No timeout: a crawl frontier
  * never forgets a page (bound it operationally by state-store TTL if a
  * deployment must).
  */
object ContinuousUrlDedup {

  /** One capture record arriving on the stream. */
  case class Capture(doc_id: Long, url: String)

  /** First capture of a canonical page, as emitted downstream. */
  case class FirstSeen(canonical_url: String, first_doc_id: Long)

  /** Canonicalize + keep first-ever capture per canonical page. Append
    * mode: a page emits exactly once, in the micro-batch that first
    * carries it (smallest doc_id within that batch on ties).
    */
  def firstSeen(captures: Dataset[Capture])
               (implicit spark: SparkSession): Dataset[FirstSeen] = {
    import spark.implicits._
    UrlOps.withUrlParts(captures.toDF(), "url")
      .select(col("canonical_url"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, FirstSeen](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[(String, Long)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(FirstSeen(key, batch.map(_._2).min))
          }
      }
  }
}
