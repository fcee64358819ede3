package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord container support — the training-sample format TF/JAX data
  * loaders consume, hand-rolled from the PUBLIC framing spec
  * (tensorflow `record_writer.h`):
  * {{{
  *   uint64  length          (little-endian)
  *   uint32  masked_crc32c(length bytes)
  *   byte[length] payload
  *   uint32  masked_crc32c(payload)
  *   mask(crc) = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  * }}}
  * CRC32C is `java.util.zip.CRC32C` — JDK-native, offline. The format
  * has NO sync marker, so a corrupt frame quarantines the REST of its
  * file (one loud `valid = false` row with the reason and the byte count
  * skipped — the WARC quarantine discipline, minus WARC's resync which
  * this format structurally cannot offer; keep files partition-sized so
  * the blast radius of one bad byte is one task's output).
  *
  * Write side: one file per KEY (a caller-chosen long in `[0, numFiles)`)
  * via `repartitionAndSortWithinPartitions` with an identity partitioner
  * — file contents and record ORDER are fully determined by (key,
  * sortCol), never by hash-partition placement, so round-trip tests and
  * incremental consumers see stable bytes. The per-partition imperative
  * write is the sanctioned RDD case (a custom file SINK).
  */
object TfRecordIO {

  private val MaskDelta = 0xa282ead8L
  /** Frames above this are treated as corruption, not allocation targets
    * (the WARC oversized-Content-Length lesson). */
  private val MaxRecordBytes: Long = 256L * 1024 * 1024

  /** Masked CRC32C of a byte range, as the unsigned 32-bit value. */
  def maskedCrc32c(bytes: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue // already unsigned in the low 32 bits
    (((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xffffffffL
  }

  private def putLeInt(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }

  /** One framed record (header + length-crc + payload + payload-crc). */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + 4 + payload.length + 4)
    var i = 0
    var len = payload.length.toLong
    while (i < 8) { out(i) = len.toByte; len >>>= 8; i += 1 } // uint64 LE
    putLeInt(out, 8, maskedCrc32c(out, 0, 8))
    System.arraycopy(payload, 0, out, 12, payload.length)
    putLeInt(out, 12 + payload.length,
      maskedCrc32c(out, 12, payload.length))
    out
  }

  /** Write `payloadCol` (binary) to `numFiles` TFRecord files under
    * `dir`: row → file `part-<fileKeyCol>.tfrecord`, ordered by
    * `sortCol` within the file. `fileKeyCol` must be a long in
    * `[0, numFiles)` (enforce upstream — it IS the file index, so the
    * layout is content-determined). Returns rows written. */
  def write(df: DataFrame, fileKeyCol: String, sortCol: String,
            payloadCol: String, dir: String, numFiles: Int): Long = {
    require(numFiles >= 1)
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pairs = df
      .select(col(fileKeyCol).cast("long"), col(sortCol).cast("long"),
        col(payloadCol))
      .rdd.map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Array[Byte]](2)))
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = numFiles
      override def getPartition(key: Any): Int = {
        val k = key.asInstanceOf[(Long, Long)]._1
        require(k >= 0 && k < numFiles, s"file key $k outside [0, $numFiles)")
        k.toInt
      }
    }
    val written = pairs
      .repartitionAndSortWithinPartitions(partitioner)
      .mapPartitionsWithIndex { (idx, it) =>
        val path = new org.apache.hadoop.fs.Path(
          f"$dir/part-$idx%05d.tfrecord")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        var n = 0L
        try it.foreach { case (_, payload) =>
          out.write(frame(if (payload == null) Array.emptyByteArray else payload))
          n += 1
        } finally out.close()
        Iterator.single(n)
      }
      .sum().toLong
    written
  }

  final case class TfRecord(file: String, rec_idx: Int, valid: Boolean,
                            reason: String, payload: Array[Byte],
                            bytes_skipped: Long)

  /** Read every `*.tfrecord` under `dir`: one row per CRC-verified record
    * plus, per corrupt file, ONE `valid = false` row naming the defect
    * and the bytes quarantined (everything from the bad frame to EOF —
    * no sync marker exists to resync on). File-parallel like
    * [[WarcIngest]]: the unit of parallelism is the file.
    *
    * STREAMING (r13 VERDICT #5): records are parsed lazily, one frame at
    * a time — memory is O(largest record), never O(file), so a 10 GB
    * shard flows through a task the same as a 10 MB one. The stream
    * closes at EOF, at the first defect (the quarantine row is the last
    * emitted), and on task completion (downstream `limit`/failure). */
  def read(spark: SparkSession, dir: String): Dataset[TfRecord] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .map(_.getPath.toString).filter(_.endsWith(".tfrecord")).sorted
    spark.createDataset(files).flatMap(f => streamFile(f, conf))
  }

  /** Lazy single-file record iterator — one frame in memory at a time
    * (the [[FrameStream]] scaffold). */
  private[sources] def streamFile(
      f: String,
      conf: org.apache.spark.util.SerializableConfiguration): Iterator[TfRecord] =
    new FrameStream[TfRecord](f, conf) {
      private val head = new Array[Byte](12)
      private var rec = 0
      private def quarantine(reason: String): TfRecord = {
        val row = TfRecord(file, rec, valid = false, reason,
          Array.emptyByteArray, fileSize - pos)
        closeStream()
        row
      }
      override protected def parseFrame(): TfRecord = {
        if (pos >= fileSize) { closeStream(); return null }
        if (fileSize - pos < 12) return quarantine("truncated-header")
        in.readFully(pos, head, 0, 12)
        var len = 0L
        var i = 7
        while (i >= 0) { len = (len << 8) | (head(i) & 0xffL); i -= 1 }
        val lenCrc = (head(8) & 0xffL) | ((head(9) & 0xffL) << 8) |
          ((head(10) & 0xffL) << 16) | ((head(11) & 0xffL) << 24)
        if (lenCrc != maskedCrc32c(head, 0, 8)) quarantine("length-crc-mismatch")
        else if (len < 0 || len > MaxRecordBytes) quarantine("oversized-length")
        else if (fileSize - pos - 12 < len + 4) quarantine("truncated-payload")
        else {
          val payload = new Array[Byte](len.toInt)
          in.readFully(pos + 12, payload, 0, len.toInt)
          val tail = new Array[Byte](4)
          in.readFully(pos + 12 + len, tail, 0, 4)
          val pCrc = (tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
            ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)
          if (pCrc != maskedCrc32c(payload, 0, payload.length))
            quarantine("payload-crc-mismatch")
          else {
            val row = TfRecord(file, rec, valid = true, "", payload, 0L)
            pos += 12 + len + 4
            rec += 1
            row
          }
        }
      }
    }
}
