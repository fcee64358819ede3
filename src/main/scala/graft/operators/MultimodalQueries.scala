package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata.
  * The container has no image/audio codecs, so the decode step is a
  * deterministic stub (graft.operators.Multimodal) — what is REAL and
  * oracle-checked here is the Spark-side plumbing: binary encode, byte-level
  * metadata extraction, and deterministic batch shaping.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary column metadata: byte length + first code point, computed from
    // an encoded binary payload (stand-in for image/audio blobs).
    "q_m1_binary_meta" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          col("text"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("int").as("n_bytes"),
          ascii(substring(col("text"), 1, 1)).cast("int").as("first_code"))
        .orderBy("doc_id")),

    // Composition: decode media payloads to feature vectors (stub codec),
    // then rank by cosine similarity against media_id 0's features — the
    // full multimodal -> embedding -> similarity pipeline shape. Stub-codec
    // features are not SQL-expressible: rows-only + MultimodalSpec.
    "q_m2_media_similarity" -> ((s, dir) => {
      val feats = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(s.read.parquet(s"$dir/documents.parquet")))
        .toDF().select(col("media_id"), col("features"))
      val query = feats.filter(col("media_id") === 0)
        .head().getSeq[Float](1).toArray
      SimilaritySearch.bruteForceTopK(feats.filter(col("media_id") =!= 0),
          "media_id", "features", query, 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy(col("cosine").desc, col("media_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_m1_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_code
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
