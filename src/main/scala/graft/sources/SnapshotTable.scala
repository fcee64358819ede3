package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based VERSIONED table: atomic snapshot commits, read-at-
  * snapshot, and time travel over plain parquet — the table-level
  * atomicity [[LakeLayout.mergeUpsert]]'s dynamic partition overwrite
  * lacks (r11 VERDICT #2: a reader racing an in-place maintenance pass
  * could see partition A new + partition B old).
  *
  * == Layout (the public Iceberg/Delta shape, minimally) ==
  * {{{
  *   table/
  *     data/v00000001/[p=.../]part-*.parquet   immutable, append-only
  *     _manifests/v00000001.manifest           file list of snapshot 1
  *     _current                                pointer: highest committed version
  * }}}
  *
  * A commit (a) writes NEW data files under a fresh `data/vN/` directory
  * — existing files are never touched, (b) writes the new snapshot's
  * manifest (every data file composing version N, tab-separated
  * `partitionSpec \t relativePath` lines), and only then (c) swaps the
  * `_current` pointer via write-temp + ATOMIC_MOVE (the
  * [[JdbcIncremental]] watermark discipline). The pointer swap IS the
  * commit point:
  *
  *  - a reader pinned to snapshot N reads a byte-stable file set no
  *    matter how many commits land meanwhile (nothing it references is
  *    ever rewritten);
  *  - a crash anywhere before the pointer swap leaves version N fully
  *    readable — the orphaned `data/vN+1` directory and manifest are
  *    invisible to readers and reclaimed by [[vacuum]];
  *  - `_manifests/vN.manifest` is created with a no-replace move, so a
  *    racing second committer fails LOUDLY instead of silently
  *    clobbering (optimistic concurrency; a single writer at a time is
  *    the supported regime, as in Hive/Delta-on-HDFS).
  *
  * Reads: the manifest is the unit of PRUNING — [[readSnapshot]] with a
  * partition predicate selects the file subset driver-side (manifest
  * rows are partition-count-bounded) before any Spark scan is planned,
  * the same file-skipping shape Iceberg calls manifest filtering.
  * Partition directory names follow hive layout, so partition columns
  * come back via each commit directory's `basePath` read; one snapshot
  * unions at most #contributing-commits scans (compaction via
  * [[commitOverwrite]] resets that to one).
  *
  * Pointer/manifest IO is java.nio against local/NFS-visible paths (the
  * test and local[32] regime; `file:` URIs accepted). On HDFS the same
  * scheme holds with `FileSystem.rename`; on S3-class object stores a
  * pointer swap needs a conditional PUT or an external lock — documented
  * constraint, not hidden.
  *
  * CONTRACT: partition values must be path-safe (no `/`, `=`, newline,
  * or nulls) — the hive-layout restriction; enforce upstream.
  *
  * Reference surface: the candy pipeline overwrites per-day MySQL tables
  * in place (`reference/src/data_processor.py:137-145`) — versioned
  * snapshots are part of the 100 TB extensions.
  */
object SnapshotTable {

  final case class ManifestEntry(partSpec: String, relPath: String)

  private def root(tablePath: String): String = {
    val r = tablePath.stripPrefix("file://").stripPrefix("file:")
    r.stripSuffix("/")
  }
  private def manifestDir(t: String) = Paths.get(root(t), "_manifests")
  private def manifestPath(t: String, v: Long) =
    manifestDir(t).resolve(f"v$v%08d.manifest")
  private def pointerPath(t: String) = Paths.get(root(t), "_current")
  private def dataDirName(v: Long) = f"data/v$v%08d"

  /** Highest COMMITTED version (the pointer), if any. */
  def currentVersion(tablePath: String): Option[Long] = {
    val p = pointerPath(tablePath)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  /** All manifest versions on disk, ascending (committed history plus
    * any crash-orphaned preparation — orphans are > the pointer). */
  def snapshots(tablePath: String): Seq[Long] = {
    val d = manifestDir(tablePath)
    if (!Files.exists(d)) return Nil
    val it = Files.list(d).iterator()
    val vs = Seq.newBuilder[Long]
    while (it.hasNext) {
      val name = it.next().getFileName.toString
      if (name.startsWith("v") && name.endsWith(".manifest"))
        vs += name.stripPrefix("v").stripSuffix(".manifest").toLong
    }
    vs.result().sorted
  }

  /** Version numbers claimed by `data/vN` DIRECTORIES, manifested or not.
    * A crash between the parquet write and the manifest move leaves a
    * data-dir shell with NO manifest; deriving the next version from
    * manifests alone would retry the same v forever (every retry fails on
    * SaveMode.ErrorIfExists against the shell — r12 ADVICE). The next
    * version must clear BOTH namespaces. */
  private def dataDirVersions(tablePath: String): Seq[Long] = {
    val d = Paths.get(root(tablePath), "data")
    if (!Files.exists(d)) return Nil
    val ls = Files.list(d)
    try {
      val vs = Seq.newBuilder[Long]
      ls.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v") && name.drop(1).forall(_.isDigit))
          vs += name.stripPrefix("v").toLong
      }
      vs.result().sorted
    } finally ls.close()
  }

  /** The file list of snapshot `version` (default: the committed
    * pointer). Header lines (`#key=value`) are metadata, not files. */
  def manifest(tablePath: String, version: Option[Long] = None): Seq[ManifestEntry] = {
    val v = version.orElse(currentVersion(tablePath)).getOrElse(
      sys.error(s"no committed snapshot at $tablePath"))
    val p = manifestPath(tablePath, v)
    require(Files.exists(p), s"snapshot v$v does not exist at $tablePath")
    new String(Files.readAllBytes(p), "UTF-8").split("\n", -1).toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val tab = line.indexOf('\t')
        ManifestEntry(line.substring(0, tab), line.substring(tab + 1))
      }
  }

  /** The transaction id snapshot `version` was committed under, if any —
    * the exactly-once key of [[commitAppendTxn]]. The `#txn=` header is
    * always the FIRST manifest line when present ([[prepare]] writes it
    * so), and the probe reads ONE bounded chunk, never the whole manifest
    * — [[commitAppendTxn]] probes every version per commit, and a full
    * parse per probe made a long-running ingest quadratic in manifest
    * bytes (r12 ADVICE). */
  def txnOf(tablePath: String, version: Long): Option[String] = {
    val p = manifestPath(tablePath, version)
    require(Files.exists(p), s"snapshot v$version does not exist at $tablePath")
    val ch = Files.newByteChannel(p)
    val head = try {
      val buf = java.nio.ByteBuffer.allocate(512) // txn ids are short
      val n = ch.read(buf)
      if (n <= 0) "" else new String(buf.array(), 0, n, "UTF-8")
    } finally ch.close()
    val firstLine = head.takeWhile(_ != '\n')
    if (firstLine.startsWith("#txn=")) Some(firstLine.stripPrefix("#txn="))
    else None
  }

  /** Read a snapshot — the committed one, or any historical `version`
    * (time travel). `partitionPruning` filters manifest entries by their
    * hive partition spec (e.g. `_ == "o_year=1995"` or a prefix test)
    * BEFORE planning, so pruned files are never listed, opened, or
    * scheduled. */
  def readSnapshot(spark: SparkSession, tablePath: String,
                   version: Option[Long] = None,
                   partitionPruning: String => Boolean = _ => true,
                   allowSchemaEvolution: Boolean = false): DataFrame = {
    val entries = manifest(tablePath, version).filter(e => partitionPruning(e.partSpec))
    require(entries.nonEmpty, s"snapshot has no files after pruning at $tablePath")
    val r = root(tablePath)
    // group by commit directory so each group's basePath recovers the
    // hive partition columns written under it
    val byCommit = entries.groupBy(_.relPath.split("/").take(2).mkString("/"))
    byCommit.toSeq.sortBy(_._1).map { case (commitDir, es) =>
      spark.read
        .option("basePath", s"$r/$commitDir")
        .parquet(es.map(e => s"$r/${e.relPath}"): _*)
    // strict by default: a column appearing/vanishing between commits is
    // an error unless the reader opts into evolution, in which case rows
    // from commits without the column read NULL (Delta's mergeSchema
    // read semantics)
    }.reduce(_.unionByName(_, allowMissingColumns = allowSchemaEvolution))
  }

  /** Overwrite commit: snapshot N+1 is exactly `df`. */
  def commitOverwrite(df: DataFrame, tablePath: String,
                      partitionCols: Seq[String] = Nil,
                      filesPerPartition: Int = 1): Long =
    commit(df, tablePath, partitionCols, filesPerPartition) { (_, fresh) => fresh }

  /** Append commit: snapshot N+1 = snapshot N's files plus `df`'s. */
  def commitAppend(df: DataFrame, tablePath: String,
                   partitionCols: Seq[String] = Nil,
                   filesPerPartition: Int = 1): Long =
    commit(df, tablePath, partitionCols, filesPerPartition) { (prev, fresh) =>
      prev ++ fresh
    }

  /** Replace-partitions commit (dynamic-overwrite semantics, atomically):
    * snapshot N+1 drops every prior file belonging to a replaced
    * partition and adds `df`'s files — but readers see either all of N
    * or all of N+1, never a half-swapped table. The replaced set
    * defaults to the partitions PRESENT in `df`; pass
    * `replacedPartitions` explicitly when a replaced partition's new
    * content can be EMPTY (all rows deleted / all groups zeroed) — an
    * empty partition writes no files, so it cannot be inferred from the
    * output, and inferring would silently keep its old files (the
    * limitation dynamic partition overwrite itself has). */
  def commitReplacePartitions(df: DataFrame, tablePath: String,
                              partitionCols: Seq[String],
                              filesPerPartition: Int = 1,
                              replacedPartitions: Option[Set[String]] = None): Long =
    commit(df, tablePath, partitionCols, filesPerPartition) { (prev, fresh) =>
      val replaced = replacedPartitions.getOrElse(fresh.map(_.partSpec).toSet)
      prev.filterNot(e => replaced.contains(e.partSpec)) ++ fresh
    }

  private def commit(df: DataFrame, tablePath: String,
                     partitionCols: Seq[String], filesPerPartition: Int)
                    (compose: (Seq[ManifestEntry], Seq[ManifestEntry]) => Seq[ManifestEntry]): Long = {
    val v = prepare(df, tablePath, partitionCols, filesPerPartition)(compose)
    swapPointer(tablePath, v)
    v
  }

  /** IDEMPOTENT append commit keyed by a caller transaction id — the
    * exactly-once sink primitive for streaming `foreachBatch` (txnId =
    * the stable micro-batch id). The protocol (the Delta-style
    * txn-version idea over this layout):
    *
    *  - a manifest carrying `#txn=<id>` already exists at a version ≤
    *    the pointer → the commit already happened: NO-OP, return it;
    *  - it exists ABOVE the pointer → the previous attempt crashed
    *    between manifest and pointer swap; data + manifest are complete
    *    (the manifest move is atomic and happens after the data write),
    *    so ROLL FORWARD by swapping the pointer — no data is rewritten;
    *  - otherwise prepare a fresh version with the txn header and commit.
    *
    * Replaying a crashed or completed batch therefore lands EXACTLY ONE
    * snapshot per txn id, whatever the crash point. Single writer per
    * table, as elsewhere in this layer.
    */
  def commitAppendTxn(df: DataFrame, tablePath: String,
                      partitionCols: Seq[String], txnId: String,
                      filesPerPartition: Int = 1): Long = {
    // newest-first: the replay case (txn already committed) almost always
    // matches the latest versions; each probe is one bounded header read
    val existing = snapshots(tablePath).reverseIterator
      .find(v => txnOf(tablePath, v).contains(txnId))
    existing match {
      case Some(v) if currentVersion(tablePath).exists(_ >= v) => v
      case Some(v) => swapPointer(tablePath, v); v
      case None =>
        val v = prepare(df, tablePath, partitionCols, filesPerPartition,
          txn = Some(txnId))((prev, fresh) => prev ++ fresh)
        swapPointer(tablePath, v)
        v
    }
  }

  /** Write data + manifest for the NEXT version WITHOUT committing it —
    * the crash window between (b) and (c) in the object doc, exposed for
    * LakeLayoutSpec's crash test. Returns the prepared version. */
  private[sources] def prepare(df: DataFrame, tablePath: String,
                               partitionCols: Seq[String], filesPerPartition: Int,
                               txn: Option[String] = None)
                              (compose: (Seq[ManifestEntry], Seq[ManifestEntry]) => Seq[ManifestEntry]): Long = {
    val prev = currentVersion(tablePath).map(v => manifest(tablePath, Some(v)))
      .getOrElse(Nil)
    // next version clears manifests AND data-dir shells: a crash between
    // the data write and the manifest move leaves an unmanifested data/vN
    // that would otherwise wedge every subsequent commit of version N
    // (vacuum() reclaims the shell later; it is unreachable by readers)
    val v = (snapshots(tablePath) ++ dataDirVersions(tablePath))
      .maxOption.getOrElse(0L) + 1
    val r = root(tablePath)
    val dataDir = s"$r/${dataDirName(v)}"
    // shape like LakeLayout.writePartitioned: each directory's rows
    // co-located into filesPerPartition tasks, sorted so each task writes
    // each directory once
    val shaped =
      if (partitionCols.isEmpty) df.repartition(filesPerPartition)
      else df.repartition(
          df.sparkSession.sessionState.conf.numShufflePartitions,
          partitionCols.map(col) :+
            pmod(hash(df.columns.map(col): _*), lit(filesPerPartition)): _*)
        .sortWithinPartitions(partitionCols.map(col): _*)
    shaped.write
      .mode(SaveMode.ErrorIfExists) // a racing committer fails loudly
      .partitionBy(partitionCols: _*)
      .parquet(dataDir)
    val fresh = listDataFiles(df.sparkSession, dataDir).map { abs =>
      val rel = abs.stripPrefix(s"$r/")
      val inCommit = rel.stripPrefix(dataDirName(v) + "/")
      val partSpec = inCommit.split("/").dropRight(1).mkString("/")
      ManifestEntry(partSpec, rel)
    }.sortBy(_.relPath)
    val header = txn.map(id => s"#txn=$id\n").getOrElse("")
    val lines = header + compose(prev, fresh)
      .map(e => s"${e.partSpec}\t${e.relPath}").mkString("\n")
    Files.createDirectories(manifestDir(tablePath))
    val tmp = manifestDir(tablePath).resolve(f"v$v%08d.manifest.tmp")
    Files.write(tmp, lines.getBytes("UTF-8"))
    // NO replace: two committers preparing the same version — one loses,
    // loudly, instead of silently overwriting the other's manifest
    Files.move(tmp, manifestPath(tablePath, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** The commit point: write-temp + ATOMIC_MOVE over `_current`. */
  private[sources] def swapPointer(tablePath: String, version: Long): Unit = {
    val tmp = Paths.get(root(tablePath), s"_current.tmp.$version")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(tablePath), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil // an all-empty commit writes no dir
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        out += f.getPath.toUri.getPath
    }
    out.result()
  }

  /** MERGE-style CDC apply with SNAPSHOT semantics — the atomic twin of
    * [[LakeLayout.mergeUpsert]] (same key/partition contract): the
    * current snapshot is read manifest-pruned to the changeset's
    * partitions, merged rows are written as new files, and one
    * replace-partitions commit swaps the pointer. A concurrent reader
    * sees all-old or all-new, and every prior snapshot stays time-
    * travelable. Returns the committed version. */
  def mergeUpsert(spark: SparkSession, tablePath: String, changes: DataFrame,
                  keyCols: Seq[String], partitionCols: Seq[String],
                  deleteCol: Option[String] = None,
                  filesPerPartition: Int = 1): Long = {
    require(keyCols.nonEmpty && partitionCols.nonEmpty)
    require(partitionCols.forall(p => !keyCols.contains(p)),
      "partition columns must not overlap the key")
    val affected = changes.select(partitionCols.map(col): _*).distinct().collect()
      .map(row => partitionCols.zipWithIndex
        .map { case (p, i) => s"$p=${row.get(i)}" }.mkString("/")).toSet
    require(affected.nonEmpty, "empty changeset")
    // a changeset can target a BRAND-NEW partition (pure insert): the
    // pruned read then selects zero files — current is the empty frame
    // with the table's schema, and the merge reduces to the inserts
    val hasAffectedFiles = manifest(tablePath, None)
      .exists(e => affected.contains(e.partSpec))
    val current =
      if (hasAffectedFiles)
        readSnapshot(spark, tablePath, partitionPruning = affected.contains)
      else readSnapshot(spark, tablePath).limit(0)
    val dataCols = current.columns.toSeq
    val changeKeys = changes.select(keyCols.map(col): _*).distinct()
    val upserts = deleteCol match {
      case Some(d) => changes.filter(!coalesce(col(d), lit(false))).drop(d)
      case None => changes
    }
    val merged = current
      .join(changeKeys, keyCols, "left_anti")
      .unionByName(upserts.select(dataCols.map(col): _*))
      // lineage cut: the commit's write must not re-plan the snapshot
      // read mid-overwrite (and the merge is cheaper materialized once)
      .localCheckpoint()
    // replaced set passed EXPLICITLY: a partition whose keys were all
    // deleted writes no files but must still drop from the manifest
    commitReplacePartitions(merged, tablePath, partitionCols,
      filesPerPartition, replacedPartitions = Some(affected))
  }

  /** Incremental maintenance of an ADDITIVE grouped-aggregate table with
    * SNAPSHOT semantics — the atomic twin of
    * [[LakeLayout.maintainAggregate]] (same additive-only contract, same
    * delta algebra via the shared helpers): the delta aggregates only the
    * changeset, the current snapshot is read manifest-pruned to the
    * touched partitions (a delta introducing a BRAND-NEW partition merges
    * against the empty frame), and one replace-partitions commit swaps
    * the pointer — a reader never sees partition A maintained and
    * partition B not, and every prior aggregate state stays
    * time-travelable. Returns the committed version.
    */
  def maintainAggregate(spark: SparkSession, tablePath: String,
                        changes: DataFrame, groupCols: Seq[String],
                        countCol: String,
                        sumCols: Map[String, org.apache.spark.sql.Column],
                        partitionCols: Seq[String],
                        deleteCol: Option[String] = None,
                        filesPerPartition: Int = 1): Long = {
    require(groupCols.nonEmpty && partitionCols.nonEmpty)
    require(partitionCols.forall(groupCols.contains),
      "partition columns must be group columns")
    val delta = LakeLayout.aggregateDelta(changes, groupCols, countCol,
      sumCols, deleteCol)
    val affected = delta.select(partitionCols.map(col): _*).distinct().collect()
      .map(row => partitionCols.zipWithIndex
        .map { case (p, i) => s"$p=${row.get(i)}" }.mkString("/")).toSet
    require(affected.nonEmpty, "empty changeset")
    val base = readSnapshot(spark, tablePath)
    val hasAffectedFiles = manifest(tablePath, None)
      .exists(e => affected.contains(e.partSpec))
    val current =
      if (hasAffectedFiles)
        readSnapshot(spark, tablePath, partitionPruning = affected.contains)
      else base.limit(0)
    val typed = LakeLayout.combineAggregate(current, delta,
      // schema from the snapshot read (partition cols included, in the
      // basePath-read order)
      base.schema, groupCols, countCol, sumCols.keys.toSeq.sorted)
      .localCheckpoint() // maintained table is group-count-sized
    // explicit replaced set: an all-groups-zeroed partition writes no
    // files but must still drop from the manifest
    commitReplacePartitions(typed, tablePath, partitionCols,
      filesPerPartition, replacedPartitions = Some(affected))
  }

  /** Table history as a DataFrame — (version, committed, txn, n_files,
    * n_partitions): the DESCRIBE-HISTORY introspection a maintenance job
    * reads before choosing what to vacuum or which version to pin.
    * Driver-side over the manifests (version-count-bounded). */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val committed = currentVersion(tablePath).getOrElse(-1L)
    snapshots(tablePath).map { v =>
      val es = manifest(tablePath, Some(v))
      (v, v <= committed, txnOf(tablePath, v).getOrElse(""),
        es.size.toLong, es.map(_.partSpec).distinct.size.toLong)
    }.toDF("version", "committed", "txn", "n_files", "n_partitions")
  }

  /** Compaction as a COMMIT: rewrite the current snapshot into one fresh
    * commit directory (resetting the per-snapshot scan-union count that
    * grows with contributing commits) — readers switch atomically, prior
    * versions stay time-travelable until [[vacuum]] reclaims them. */
  def compact(spark: SparkSession, tablePath: String,
              partitionCols: Seq[String] = Nil,
              filesPerPartition: Int = 1): Long =
    // no caching: the rewrite reads the old commit dirs while writing a
    // fresh one — conflict-free by the layout, and a 100 TB table must
    // stream through, not materialize
    commitOverwrite(readSnapshot(spark, tablePath), tablePath,
      partitionCols, filesPerPartition)

  /** Reclaim space: delete data files referenced by NO retained manifest
    * (keep the last `keepSnapshots` committed versions; orphaned
    * preparations beyond the pointer are reclaimed too) and drop the
    * expired manifests. Time travel remains valid for every kept
    * version. Returns (filesDeleted, manifestsDeleted). */
  def vacuum(spark: SparkSession, tablePath: String,
             keepSnapshots: Int = 2): (Long, Long) = {
    val committed = currentVersion(tablePath).getOrElse(
      sys.error(s"no committed snapshot at $tablePath"))
    val all = snapshots(tablePath)
    val keep = all.filter(_ <= committed).takeRight(math.max(1, keepSnapshots)).toSet
    val referenced = keep.toSeq.flatMap(v => manifest(tablePath, Some(v)))
      .map(_.relPath).toSet
    val r = root(tablePath)
    var filesDeleted = 0L
    listDataFiles(spark, s"$r/data").foreach { abs =>
      val rel = abs.stripPrefix(s"$r/")
      if (!referenced.contains(rel)) {
        Files.deleteIfExists(Paths.get(abs))
        filesDeleted += 1
      }
    }
    var manifestsDeleted = 0L
    all.filterNot(keep.contains).foreach { v =>
      Files.deleteIfExists(manifestPath(tablePath, v))
      manifestsDeleted += 1
    }
    // remove commit DIRECTORIES that no retained manifest references at
    // all (a vacuumed crash-orphan, or a fully-superseded commit): only
    // hidden markers (_SUCCESS, .crc) remain in them after the file pass
    // above, and a leftover data/vN shell would wedge the table — the
    // next prepare of that version number writes with ErrorIfExists and
    // an existing directory fails the commit. Partially-referenced dirs
    // (replace-partitions keeps some of an old commit's files) are left
    // alone: their versions are committed history, never re-prepared.
    val referencedDirs = referenced.map(_.split("/").take(2).mkString("/"))
    val dataRoot = Paths.get(r, "data")
    if (Files.exists(dataRoot)) {
      val ls = Files.list(dataRoot)
      val children = try {
        val b = Seq.newBuilder[java.nio.file.Path]
        ls.forEach(p => b += p)
        b.result()
      } finally ls.close()
      children.filter(p => Files.isDirectory(p) &&
          !referencedDirs.contains(s"data/${p.getFileName}"))
        .foreach { p =>
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => Files.deleteIfExists(q))
          finally walk.close()
        }
    }
    (filesDeleted, manifestsDeleted)
  }
}
