package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned table format — the Delta-style transaction-log
  * semantics the reference leans on (ACID commits, versioning, time
  * travel, /root/reference/README.md:36-40) rebuilt natively for plain
  * parquet:
  *
  * - data files are immutable, written once under `data/<uuid>/`;
  * - each commit is a JSON manifest `_graft_log/v{N}.json` listing the
  *   table's live files for that version plus operation metadata;
  * - commits are ATOMIC: the manifest is staged to a temp file and
  *   atomically linked into the log — readers see either the old or the
  *   new version, never a partial table;
  * - concurrent writers race on the version number; the loser's link
  *   fails and retries against the next version (optimistic concurrency,
  *   as Delta does). Read-modify-write transactions ([[mergeCommit]])
  *   additionally re-run against the new latest version when they lose —
  *   a blind retry would silently discard the concurrent commit;
  * - [[writeOnce]] makes an operation tag part of the commit race, so
  *   at-least-once re-deliveries (streaming batch replays) cannot commit
  *   twice even from concurrent writers;
  * - `readVersion` time-travels by reading an old manifest — old data
  *   files are never mutated. Reads union file schemas (merge-on-read),
  *   so a commit may WIDEN the schema and older files surface NULL for
  *   the new columns — the mergeSchema evolution story.
  *
  * Local-filesystem link is atomic here; on an object store the same
  * protocol runs against a log store with put-if-absent.
  */
object VersionedTable {

  private def logDir(path: String): Path = Paths.get(path, "_graft_log")

  private def manifestPath(path: String, v: Long): Path =
    logDir(path).resolve(f"v$v%08d.json")

  /** Run `f` over a directory listing, closing the stream afterwards
    * (Files.list leaks an open fd until closed; versions() runs per
    * commit retry and per micro-batch, so leaks accumulate fast).
    */
  private def listDir[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Versions present in the log, ascending. */
  def versions(path: String): Seq[Long] = {
    val dir = logDir(path)
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir)(_.map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d{8}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted)
  }

  // ------------------------------------------------- log checkpoints
  //
  // Delta compacts its JSON log into a checkpoint every 10 commits so
  // that log replay reads one checkpoint + a bounded tail instead of
  // every manifest since table creation. Same here: every
  // `checkpointInterval`-th commit folds the cumulative (version, op)
  // history into `chk-v{N}.json`; [[committedOps]] (the exactly-once
  // hot path, consulted per micro-batch) then costs O(interval), not
  // O(versions) — at 10⁵ commits that is the difference between 10
  // driver-side file reads and 100,000. Checkpoints are committed with
  // the same put-if-absent link as manifests, so racing writers cannot
  // corrupt one, and they survive [[vacuum]] (which keeps the newest),
  // preserving the op-dedup history of vacuumed versions.

  /** Every N-th commit writes a log checkpoint. */
  val checkpointInterval: Int = 10

  private def checkpointPath(path: String, v: Long): Path =
    logDir(path).resolve(f"chk-v$v%08d.json")

  private def checkpoints(path: String): Seq[Long] = {
    val dir = logDir(path)
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir)(_.map(_.getFileName.toString)
      .collect { case n if n.matches("chk-v\\d{8}\\.json") =>
        n.stripPrefix("chk-v").stripSuffix(".json").toLong }
      .toSeq.sorted)
  }

  private val cpEntryRe = """\[(\d+),"((?:[^"\\]|\\.)*)"\]""".r

  private def readCheckpoint(path: String, v: Long): Seq[(Long, String)] =
    cpEntryRe.findAllMatchIn(Files.readString(checkpointPath(path, v)))
      .map(m => (m.group(1).toLong, unesc(m.group(2)))).toSeq

  /** (version, op) pairs committed through `upTo`: the newest
    * checkpoint at or below `upTo`, plus the manifest tail after it —
    * O(interval) manifest reads once checkpoints exist.
    */
  private def opsThrough(path: String, upTo: Long): Seq[(Long, String)] = {
    val cp = checkpoints(path).filter(_ <= upTo).lastOption
    val base = cp.map(readCheckpoint(path, _)).getOrElse(Seq.empty)
    val from = cp.getOrElse(-1L)
    base ++ versions(path).filter(v => v > from && v <= upTo)
      .map(v => (v, opOf(path, v)))
  }

  private def maybeCheckpoint(path: String, version: Long): Unit =
    if (version > 0 && version % checkpointInterval == 0 &&
        !Files.exists(checkpointPath(path, version))) {
      val entries = opsThrough(path, version)
        .map { case (v, o) => s"""[$v,"${esc(o)}"]""" }.mkString(",")
      val tmp = logDir(path).resolve(s".tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, s"""{"version":$version,"ops":[$entries]}""")
      try { Files.createLink(checkpointPath(path, version), tmp); () }
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally { Files.deleteIfExists(tmp); () }
    }

  def latestVersion(path: String): Option[Long] = versions(path).lastOption

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Stage + atomically commit manifest for `version`; false if that
    * version already exists (lost the race). `dv` lists the version's
    * deletion-vector parquet files (omitted from the JSON when empty, so
    * pre-DV manifests and DV-free tables are byte-identical to before).
    */
  private def tryCommit(path: String, version: Long, files: Seq[String],
      op: String, dv: Seq[String] = Seq.empty): Boolean = {
    Files.createDirectories(logDir(path))
    val dvField =
      if (dv.isEmpty) ""
      else s""","dv":[${dv.map(f => "\"" + esc(f) + "\"").mkString(",")}]"""
    val json =
      s"""{"version":$version,"op":"${esc(op)}","files":[${
        files.map(f => "\"" + esc(f) + "\"").mkString(",")}]$dvField}"""
    val tmp = logDir(path).resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, json)
    // put-if-absent must FAIL when the version exists. ATOMIC_MOVE is the
    // wrong primitive (POSIX rename silently replaces the target, letting
    // a racing writer overwrite a committed manifest); createLink is
    // atomic AND errors on an existing target.
    try {
      Files.createLink(manifestPath(path, version), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp); ()
    }
  }

  /** Write the batch's data files (immutable, never visible until a
    * manifest references them). Returns (dataDir, file list).
    */
  private def writeData(df: DataFrame, path: String,
      sub: String = "data"): (Path, Seq[String]) = {
    val dataDir = Paths.get(s"$path/$sub/${UUID.randomUUID()}")
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    val newFiles = listDir(dataDir)(
      _.map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted)
    (dataDir, newFiles)
  }

  /** Remove a data dir whose commit lost its race — the files were never
    * referenced by any manifest, so this is garbage collection, not
    * deletion of table state.
    */
  private def discardData(dataDir: Path): Unit =
    if (Files.exists(dataDir)) {
      listDir(dataDir)(_.toSeq).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(dataDir)
      ()
    }

  /** Write `df` as a new commit. Append mode unions the previous
    * version's files with the new ones; overwrite replaces them. Returns
    * the committed version.
    *
    * Blind writes only: append bases itself on whatever the latest
    * version is at commit time, and overwrite is last-writer-wins — both
    * are conflict-free under retry. A write whose CONTENT depends on a
    * read of the table must go through [[mergeCommit]], which detects
    * the lost-update race instead of retrying a stale snapshot.
    */
  def write(df: DataFrame, path: String, mode: SaveMode): Long =
    write(df, path, mode,
      if (mode == SaveMode.Append) "append" else "overwrite")

  /** As [[write]] with an explicit operation tag (used by the streaming
    * sink for exactly-once batch bookkeeping).
    */
  def write(df: DataFrame, path: String, mode: SaveMode, op: String): Long = {
    val (_, newFiles) = writeData(df, path)
    var committed = -1L
    while (committed < 0) {
      val prev = latestVersion(path)
      // append carries BOTH the file list and the deletion vectors
      // forward — dropping the DVs would resurrect deleted rows
      val (base, dvBase) = mode match {
        case SaveMode.Append => (
          prev.map(files(path, _)).getOrElse(Seq.empty),
          prev.map(dvFiles(path, _)).getOrElse(Seq.empty))
        case _ => (Seq.empty, Seq.empty)
      }
      val next = prev.getOrElse(-1L) + 1
      if (tryCommit(path, next, base ++ newFiles, op, dvBase))
        committed = next
    }
    maybeCheckpoint(path, committed)
    committed
  }

  /** Write `df` z-clustered on (`colA`, `colB`) as a new commit — the
    * `OPTIMIZE ZORDER BY` analog for the versioned table
    * (/root/reference/bronze_silver_gold/readme.md:84,96 declares
    * Z-ORDER as the layout practice; the algorithm is public Morton
    * clustering). The data routes through [[ZOrder.clustered]] — the
    * overflow-safe min-max normalization + bit interleave and ONE range
    * shuffle into `numFiles` z-contiguous partitions — before the
    * ordinary commit protocol, so each committed file owns a tight
    * min/max box in BOTH dimensions. No separate read path exists:
    * [[readWhere]]'s lazily-built stats sidecar sees those boxes and
    * prunes to ~√files for a narrow predicate on EITHER column, where a
    * single-column sort layout prunes on one and scans everything on
    * the other. DV-sound like every read: deletion vectors only shrink
    * a file's live rows, so the clustered boxes stay valid bounds.
    */
  def writeClustered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Long =
    write(ZOrder.clustered(df, colA, colB, numFiles), path, mode,
      s"zorder($colA,$colB)")

  /** Transactional `OPTIMIZE ZORDER BY` — rewrite the CURRENT live rows
    * (deletion vectors applied) into a z-clustered layout as a new
    * overwrite version: contents identical, layout new, every previous
    * version still time-travelable. The layout-only analog of
    * [[compact]], combining it with [[writeClustered]]'s Morton
    * range-shuffle so subsequent [[readWhere]] calls prune on either
    * clustered dimension. Tagged in the history so audits can tell a
    * layout rewrite from a data change. Returns the committed version.
    */
  def optimizeZOrder(spark: SparkSession, path: String, colA: String,
      colB: String, numFiles: Int): Long =
    write(ZOrder.clustered(read(spark, path), colA, colB, numFiles), path,
      SaveMode.Overwrite, s"optimize-zorder($colA,$colB)")

  /** Exactly-once tagged commit: commit `df` under `op` unless a
    * manifest already carries that tag. The tag check is part of the
    * commit RACE, not a separate check-then-write: losing a version race
    * re-checks only the manifests that appeared since, so two concurrent
    * replays of the same batch commit exactly one version between them.
    * Returns the committed version, or None when the tag already won.
    */
  def writeOnce(df: DataFrame, path: String, mode: SaveMode,
      op: String): Option[Long] = {
    val start = versions(path)
    // checkpointed read: O(interval), not O(versions) — this check runs
    // per micro-batch in the streaming sink
    if (opsThrough(path, Long.MaxValue).exists(_._2 == op)) return None
    val (dataDir, newFiles) = writeData(df, path)
    val startSet = start.toSet
    var result: Option[Option[Long]] = None
    while (result.isEmpty) {
      val prev = latestVersion(path)
      val (base, dvBase) = mode match {
        case SaveMode.Append => (
          prev.map(files(path, _)).getOrElse(Seq.empty),
          prev.map(dvFiles(path, _)).getOrElse(Seq.empty))
        case _ => (Seq.empty, Seq.empty)
      }
      val next = prev.getOrElse(-1L) + 1
      // the tag re-check runs BEFORE every attempt, not only after a
      // lost version race: a concurrent replay that committed while
      // THIS replay was still staging parquet (writeData above takes
      // seconds) leaves the next version number free, so an
      // after-failure-only check never fires and the batch double
      // commits — the DeltaInterop.write discipline (re-check txn
      // inside the loop ahead of each attempt)
      if (versions(path).exists(v =>
          !startSet.contains(v) && opOf(path, v) == op)) {
        // a concurrent replay of this very batch won the race: our data
        // files must not become a duplicate commit
        discardData(dataDir)
        result = Some(None)
      }
      else if (tryCommit(path, next, base ++ newFiles, op, dvBase)) {
        maybeCheckpoint(path, next)
        result = Some(Some(next))
      }
    }
    result.get
  }

  /** The operation tag of a committed version, parsed straight off the
    * manifest (cheap driver-side read — no Spark job per lookup).
    */
  def opOf(path: String, version: Long): String = {
    val json = Files.readString(manifestPath(path, version))
    val m = """"op":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
    m.map(g => unesc(g.group(1))).getOrElse("")
  }

  /** Operation tags already committed (for idempotent re-delivery).
    * Driver-side file reads bounded by the checkpoint interval — the
    * newest checkpoint plus the manifest tail, never the whole log.
    * Includes ops of vacuumed versions when a checkpoint covers them.
    */
  def committedOps(spark: SparkSession, path: String): Set[String] =
    opsThrough(path, Long.MaxValue).map(_._2).toSet

  /** The live files of `version` (parsed from its manifest via Spark's
    * JSON reader).
    */
  def files(path: String, version: Long): Seq[String] = {
    val spark = SparkSession.active
    spark.read.json(manifestPath(path, version).toString)
      .select(explode(col("files")).as("f"))
      .collect().map(_.getString(0)).toSeq
  }

  // ------------------------------------------------- deletion vectors
  //
  // DELETE / MERGE at 100 TB must not rewrite 100 TB. Copy-on-write
  // [[mergeCommit]] rewrites the whole table per merge; Delta's answer is
  // (a) rewrite only the files a merge touches and (b) deletion vectors —
  // mark deleted ROW POSITIONS in a side file and let readers subtract
  // them, so a delete/merge commit costs O(changed rows), not O(table).
  // Same here: a DV is a parquet file of (file, pos) pairs recorded from
  // the scan's `_metadata.file_path`/`_metadata.row_index`, listed in the
  // manifest's `dv` field. Readers anti-join the DV (broadcast while the
  // DV is small, shuffle beyond the gate — production Delta refines this
  // to a roaring bitmap per file; the protocol shape is identical). DV
  // entries that reference files no longer in the manifest are inert, so
  // rewrites (compaction, pruned merge) simply drop rows from the DV's
  // effective domain without editing DV files — immutability everywhere.

  private val FileCol = "_vt_file"
  private val PosCol = "_vt_pos"
  /** Above this total DV size the read-side anti-join stops broadcasting. */
  private val dvBroadcastBytes: Long = 64L << 20

  /** Deletion-vector files of `version` (empty for DV-free manifests). */
  def dvFiles(path: String, version: Long): Seq[String] = {
    val json = Files.readString(manifestPath(path, version))
    """"dv":\[([^\]]*)\]""".r.findFirstMatchIn(json).map { m =>
      """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(m.group(1))
        .map(g => unesc(g.group(1))).toSeq
    }.getOrElse(Seq.empty)
  }

  /** Scan `fs` with the file/position metadata columns attached. */
  private def withPos(spark: SparkSession, fs: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(fs: _*)
      .withColumn(FileCol, col("_metadata.file_path"))
      .withColumn(PosCol, col("_metadata.row_index"))

  /** Subtract DV positions from a [[withPos]] scan. Broadcast is gated on
    * the DVs' on-disk size (a driver-side stat, no extra job).
    */
  private def subtractDv(spark: SparkSession, scan: DataFrame,
      dvs: Seq[String]): DataFrame =
    if (dvs.isEmpty) scan
    else {
      val dv = spark.read.parquet(dvs: _*).select(col("file"), col("pos"))
      val bytes = dvs.map(f => Files.size(Paths.get(f))).sum
      val probe = if (bytes <= dvBroadcastBytes) broadcast(dv) else dv
      scan.join(probe,
        scan(FileCol) === probe("file") && scan(PosCol) === probe("pos"),
        "left_anti")
    }

  /** The live rows of a version, position columns attached (the common
    * read under every DV-aware operation).
    */
  private def liveWithPos(spark: SparkSession, fs: Seq[String],
      dvs: Seq[String]): DataFrame =
    subtractDv(spark, withPos(spark, fs), dvs)

  /** `_metadata.file_path` is a URI (`file:///…`); manifests store plain
    * paths. Driver-side mapping for pruned-merge's touched-file list.
    */
  private def uriToPath(u: String): String = new java.net.URI(u).getPath

  /** DV-based DELETE: mark rows matching `cond` deleted — data files are
    * untouched, the commit writes only the matched (file, pos) pairs.
    * Optimistic-concurrency loop as [[mergeCommit]]. Returns the
    * committed version.
    */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path"))
      val fs = files(path, base)
      val dvs = dvFiles(path, base)
      val hits = liveWithPos(spark, fs, dvs).filter(cond)
        .select(col(FileCol).as("file"), col(PosCol).as("pos"))
      val (dvDir, newDv) = writeData(hits, path, "dv")
      if (tryCommit(path, base + 1, fs, "delete", dvs ++ newDv))
        committed = base + 1
      else discardData(dvDir) // concurrent commit won: recompute positions
    }
    maybeCheckpoint(path, committed)
    committed
  }

  /** MERGE via deletion vectors: matched target rows are DV-masked and
    * the source lands as new data files — NO target file is rewritten,
    * so commit cost is O(source + matched positions) regardless of table
    * size. Result is observably identical to [[mergeCommit]]. Same
    * precondition as [[graft.operators.Merge.upsert]]: one source row
    * per key.
    */
  def mergeCommitDV(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String]): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path"))
      val fs = files(path, base)
      val dvs = dvFiles(path, base)
      val matched = liveWithPos(spark, fs, dvs)
        .join(source.select(keys.map(col): _*), keys, "left_semi")
        .select(col(FileCol).as("file"), col(PosCol).as("pos"))
      val (dvDir, newDv) = writeData(matched, path, "dv")
      val (dataDir, newFiles) = writeData(source, path)
      if (tryCommit(path, base + 1, fs ++ newFiles, "merge-dv", dvs ++ newDv))
        committed = base + 1
      else { discardData(dvDir); discardData(dataDir) }
    }
    maybeCheckpoint(path, committed)
    committed
  }

  /** MERGE with file pruning: rewrite ONLY the files that contain a
    * matched key; untouched files carry over by reference (Delta's
    * copy-on-write merge). The driver handles a file-name list (metadata
    * scale); the data job reads just the touched files plus the source.
    * Prefer [[mergeCommitDV]] when updates are sparse and rewrite
    * amplification matters; prefer this when DV accumulation (read-side
    * anti-join growth) matters.
    */
  def mergeCommitPruned(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String]): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path"))
      val fs = files(path, base)
      val dvs = dvFiles(path, base)
      val live = liveWithPos(spark, fs, dvs)
      // bounded driver traffic: one row per TOUCHED FILE, never per data row
      val touched = live
        .join(source.select(keys.map(col): _*), keys, "left_semi")
        .select(FileCol).distinct()
        .collect().map(r => uriToPath(r.getString(0))).toSet
      val untouched = fs.filterNot(touched)
      val targetSlice =
        if (touched.isEmpty) live.drop(FileCol, PosCol).limit(0)
        else liveWithPos(spark, fs.filter(touched), dvs).drop(FileCol, PosCol)
      val merged = graft.operators.Merge.upsert(targetSlice, source, keys)
      val (dataDir, newFiles) = writeData(merged, path)
      // DV entries for rewritten files go inert with the files themselves
      if (tryCommit(path, base + 1, untouched ++ newFiles, "merge-pruned", dvs))
        committed = base + 1
      else discardData(dataDir)
    }
    maybeCheckpoint(path, committed)
    committed
  }

  // ---------------------------------------------------- change data feed

  /** Row-level change feed for `(fromVersion, toVersion]` — Delta CDF's
    * shape: the table columns plus `_change_type` (`insert` | `delete`;
    * a merge's update surfaces as delete-of-preimage + insert-of-
    * postimage) and `_commit_version`. Exact for commits that only add
    * files and/or DV entries (append, [[writeOnce]], [[deleteWhere]],
    * [[mergeCommitDV]]); `compact` commits are pure layout and yield no
    * changes; rewrite commits (overwrite, [[mergeCommit]],
    * [[mergeCommitPruned]]) destroy row identity and raise — a CDF
    * consumer pins the table to DV-based operations, exactly as Delta
    * requires CDF to be enabled before it records changes.
    */
  def changes(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, s"bad range ($fromVersion, $toVersion]")
    val meta = Seq(FileCol, PosCol)
    val deltas = ((fromVersion + 1) to toVersion).flatMap { v =>
      val op = opOf(path, v)
      // compact AND optimize-zorder are pure-LAYOUT rewrites (identical
      // row content, different file clustering): both yield no changes.
      // Without the zorder case, CDF over any range spanning an
      // optimize permanently raised on a commit that changed zero rows.
      if (op == "compact" || op.startsWith("optimize-zorder(")) Seq.empty
      else {
        val prevFiles = files(path, v - 1).toSet
        val curFiles = files(path, v)
        val removed = prevFiles -- curFiles.toSet
        if (removed.nonEmpty)
          throw new UnsupportedOperationException(
            s"version $v (op=$op) rewrites files; the change feed supports " +
              "append/delete/merge-dv commits (and skips compact)")
        val addedFiles = curFiles.filterNot(prevFiles)
        val addedDv = dvFiles(path, v).filterNot(dvFiles(path, v - 1).toSet)
        val inserts =
          if (addedFiles.isEmpty) Seq.empty
          else Seq(spark.read.option("mergeSchema", "true")
            .parquet(addedFiles: _*)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(v)))
        val deletes =
          if (addedDv.isEmpty) Seq.empty
          else {
            val dv = spark.read.parquet(addedDv: _*).select(col("file"), col("pos"))
            val scan = withPos(spark, files(path, v - 1))
            Seq(scan.join(broadcast(dv),
                scan(FileCol) === dv("file") && scan(PosCol) === dv("pos"),
                "left_semi")
              .drop(meta: _*)
              .withColumn("_change_type", lit("delete"))
              .withColumn("_commit_version", lit(v)))
          }
        inserts ++ deletes
      }
    }
    val empty = readVersion(spark, path, toVersion).limit(0)
      .withColumn("_change_type", lit(""))
      .withColumn("_commit_version", lit(0L))
    deltas.foldLeft(empty)(_.unionByName(_, allowMissingColumns = true))
  }

  /** Read the table as of `version` (time travel). Schemas are unioned
    * across files (merge-on-read), so versions written after a widening
    * append surface the full evolved schema with NULLs where a file
    * predates a column. Deletion vectors, when present, are subtracted
    * by a size-gated anti-join; DV-free versions keep the plain scan
    * (zero overhead).
    */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = files(path, version)
    if (fs.isEmpty)
      spark.emptyDataFrame
    else {
      val dvs = dvFiles(path, version)
      if (dvs.isEmpty) spark.read.option("mergeSchema", "true").parquet(fs: _*)
      else liveWithPos(spark, fs, dvs).drop(FileCol, PosCol)
    }
  }

  /** RESTORE `version` as a NEW commit: the table's head becomes a
    * manifest referencing exactly the old version's files and deletion
    * vectors (Delta's `RESTORE TABLE ... TO VERSION AS OF` semantics —
    * time travel made durable while preserving history; a later restore
    * can roll the restore itself back). Metadata-only: no data file is
    * read, moved, or rewritten, so restoring a 100 TB table costs one
    * manifest write. Retries on version races like any blind commit;
    * requires the target version's manifest to still exist (VACUUM with
    * a retention window shorter than the restore target forfeits it).
    */
  def restore(path: String, version: Long): Long = {
    require(Files.exists(manifestPath(path, version)),
      s"cannot restore to version $version: manifest vacuumed or absent")
    val fs = files(path, version)
    val dv = dvFiles(path, version)
    var committed = -1L
    while (committed < 0) {
      val next = latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path")) + 1
      if (tryCommit(path, next, fs, s"restore($version)", dv))
        committed = next
    }
    maybeCheckpoint(path, committed)
    committed
  }

  /** Read the latest version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path,
      latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path")))

  // ---------------------------------------------------- data skipping
  //
  // Delta stores per-file column min/max in its log and prunes files
  // before the scan. Here the stats live in a sidecar parquet per
  // indexed column (`_graft_stats/<col>/`), keyed by data-file path.
  // Data files are IMMUTABLE, so a file's stats never change: the
  // sidecar is append-only, missing entries are computed lazily (one
  // aggregation over just the unindexed files), and entries for
  // vacuumed files are inert. Deletion vectors only shrink a file's
  // live rows, so manifest-file stats stay sound bounds — a fully
  // deleted range costs one false-positive file read, never a wrong
  // result.

  private def statsDir(path: String, column: String): Path =
    Paths.get(path, "_graft_stats", column)

  /** Range read with file skipping: the rows of the latest version
    * satisfying `lo <= column <= hi`, scanning only files whose
    * [min,max] intersects the range. Result is identical to
    * `read(...).filter(...)`; only the files touched differ. Returns
    * (rows, filesRead, filesTotal).
    *
    * First call over new files pays one stats aggregation for exactly
    * those files (grouped by `_metadata.file_path` — the shuffle is
    * file-count wide); later calls prune from the sidecar alone. All
    * range comparisons run in the engine with its own type coercion —
    * no driver-side value comparisons. Driver traffic is bounded by
    * the FILE count (the same order as reading the manifest), never by
    * rows. All-null files (mn = mx = NULL) are skipped: the range
    * filter excludes null rows regardless.
    */
  def readWhere(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): (DataFrame, Long, Long) = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no versions at $path"))
    val fs = files(path, v)
    if (fs.isEmpty) return (spark.emptyDataFrame, 0L, 0L)
    val dir = statsDir(path, column)
    val have: Set[String] =
      if (Files.exists(dir))
        spark.read.parquet(dir.toString)
          .select("file").collect().map(_.getString(0)).toSet
      else Set.empty
    val missing = fs.filterNot(have)
    if (missing.nonEmpty) {
      val src = spark.read.option("mergeSchema", "true").parquet(missing: _*)
      val agged =
        if (src.columns.contains(column))
          src.groupBy(col("_metadata.file_path").as("uri"))
            .agg(min(col(column)).as("mn"), max(col(column)).as("mx"))
        else {
          // EVERY unindexed file predates the schema-evolved column
          // (e.g. an old-schema writer appended after the column was
          // indexed) — col(column) would not resolve against their
          // merged schema. Those files read back NULL for the column,
          // which any range filter excludes, so the sound stats entry
          // is the all-null row (the existing skip-with-null
          // semantics). Type the nulls from the sidecar, or from the
          // table's full merged schema on a first-ever stats pass, so
          // the sidecar parquet stays schema-stable across appends.
          val dt =
            if (Files.exists(dir))
              spark.read.parquet(dir.toString).schema("mn").dataType
            else spark.read.option("mergeSchema", "true").parquet(fs: _*)
              .schema.find(_.name == column).map(_.dataType)
              .getOrElse(throw new IllegalArgumentException(
                s"data-skipping column '$column' exists in no file of $path"))
          src.groupBy(col("_metadata.file_path").as("uri"))
            .agg(min(lit(null).cast(dt)).as("mn"),
              max(lit(null).cast(dt)).as("mx"))
        }
      agged
        // manifests store plain paths; `file_path` is a file: URI on the
        // local FS — strip the scheme so sidecar keys match manifests
        .select(regexp_replace(col("uri"), "^file:(//)?", "").as("file"),
          col("mn"), col("mx"))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(dir.toString)
    }
    val stats = spark.read.parquet(dir.toString)
      .filter(col("file").isInCollection(fs))
    val kept = stats
      .filter(col("mx") >= lit(lo) && col("mn") <= lit(hi))
      .select("file").collect().map(_.getString(0)).distinct.toSeq
    // a file with no stats row (lost append race) is read conservatively
    val haveNow = stats.select("file").collect().map(_.getString(0)).toSet
    val toRead = kept ++ fs.filterNot(haveNow)
    val cond = col(column) >= lit(lo) && col(column) <= lit(hi)
    val out =
      if (toRead.isEmpty) read(spark, path).filter(cond).limit(0)
      else liveWithPos(spark, toRead, dvFiles(path, v))
        .drop(FileCol, PosCol).filter(cond)
    (out, toRead.size.toLong, fs.size.toLong)
  }

  // ---------------------------------------------------------- bloom skip
  // Min/max stats prune RANGE predicates; a point lookup on a column the
  // table is not clustered by (every file's [min,max] spans the probe)
  // skips nothing. The Bloom sidecar fixes exactly that: per file, the
  // SET of k md5-derived bit positions its values touch — equality
  // probes read only files whose set covers all k probe positions.
  // Same lifecycle discipline as the stats sidecar: data files are
  // immutable so entries never change, missing entries are computed
  // lazily for exactly the unindexed files, DVs only shrink live rows
  // (a fully-deleted value costs one false-positive file read, never a
  // wrong result), and [[vacuumStats]]-style cleanup is inherited by
  // keying on the same file paths.

  private def bloomDir(path: String, column: String): Path =
    Paths.get(path, "_graft_bloom", column)

  private val BloomBits = 4096
  private val BloomK = 5

  private def bloomHashHex(i: Int, v: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"bloom-v1|$i|$v".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Equality read with Bloom file skipping: the live rows of the latest
    * version where `column = value`, scanning only files whose Bloom
    * side entry covers the probe. Result is identical to
    * `read(...).filter(col === value)`; only files touched differ.
    * Returns (rows, filesRead, filesTotal).
    *
    * The per-file "filter" is stored as the sorted distinct position
    * set (≤ [[BloomBits]] ints — the sparse representation of the
    * bitmap, exact for the membership test and cheaper to build with a
    * distinct-aggregate than a bitmap OR). Probe positions are computed
    * driver-side from the identical md5 formula the build runs in the
    * engine, over the column's string cast — supported for string and
    * integral columns, where both renderings agree.
    */
  def readWhereEquals(spark: SparkSession, path: String, column: String,
      value: Any): (DataFrame, Long, Long) = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no versions at $path"))
    val fs = files(path, v)
    if (fs.isEmpty) return (spark.emptyDataFrame, 0L, 0L)
    val dir = bloomDir(path, column)
    val have: Set[String] =
      if (Files.exists(dir))
        spark.read.parquet(dir.toString)
          .select("file").collect().map(_.getString(0)).toSet
      else Set.empty
    val missing = fs.filterNot(have)
    if (missing.nonEmpty) {
      val src = spark.read.option("mergeSchema", "true").parquet(missing: _*)
      val fileList = src.select(col("_metadata.file_path").as("uri")).distinct()
      val sets =
        if (src.columns.contains(column)) {
          val posExprs = (0 until BloomK).map { i =>
            (conv(substring(md5(concat(lit(s"bloom-v1|$i|"), col("v"))),
              1, 12), 16, 10).cast("bigint") % BloomBits).cast("int")
          }
          src
            .select(col("_metadata.file_path").as("uri"),
              col(column).cast("string").as("v"))
            .filter(col("v").isNotNull)
            .select(col("uri"), explode(array(posExprs: _*)).as("pos"))
            .groupBy("uri")
            .agg(sort_array(collect_set(col("pos"))).as("pos_set"))
        } else fileList.limit(0)
          .select(col("uri"), array().cast("array<int>").as("pos_set"))
      // every scanned file gets an entry: a file whose values are all
      // NULL for the column (old-schema file under mergeSchema, or a
      // genuinely all-null file) contributes no position rows, and its
      // sound entry is the EMPTY set — an equality probe excludes null
      val entries = fileList.join(sets, Seq("uri"), "left")
        .select(col("uri"),
          coalesce(col("pos_set"), array().cast("array<int>")).as("pos_set"))
      entries
        .select(regexp_replace(col("uri"), "^file:(//)?", "").as("file"),
          col("pos_set"))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(dir.toString)
    }
    val probe: Seq[Int] = (0 until BloomK).map { i =>
      (java.lang.Long.parseLong(
        bloomHashHex(i, String.valueOf(value)).substring(0, 12), 16)
        % BloomBits).toInt
    }
    val side = spark.read.parquet(dir.toString)
      .filter(col("file").isInCollection(fs))
    val kept = side
      .filter(probe.distinct.map(p => array_contains(col("pos_set"), p))
        .reduce(_ && _))
      .select("file").collect().map(_.getString(0)).distinct.toSeq
    val haveNow = side.select("file").collect().map(_.getString(0)).toSet
    val toRead = kept ++ fs.filterNot(haveNow)
    val cond = col(column) === lit(value)
    val out =
      if (toRead.isEmpty) read(spark, path).filter(cond).limit(0)
      else liveWithPos(spark, toRead, dvFiles(path, v))
        .drop(FileCol, PosCol).filter(cond)
    (out, toRead.size.toLong, fs.size.toLong)
  }

  /** Drop data-skipping sidecar rows whose file is referenced by NO
    * retained manifest — the stats analog of [[vacuum]] (dead rows are
    * inert for correctness but accumulate forever on a churning table).
    * Bounded by file count end to end: each column's sidecar collects
    * to the driver (same order as a manifest read) and is rewritten
    * from memory, which also sidesteps Spark's self-overwrite
    * restriction. Run when no concurrent [[readWhere]] is appending —
    * a lost concurrent append only costs that reader a lazy recompute,
    * never a wrong result. Returns the number of rows dropped.
    */
  def vacuumStats(spark: SparkSession, path: String): Long = {
    // the Bloom sidecar shares the (file, …) keying — same cleanup
    val roots = Seq("_graft_stats", "_graft_bloom")
      .map(Paths.get(path, _)).filter(Files.exists(_))
    if (roots.isEmpty) return 0L
    // live-file keys come from the metadata plane (manifest lists —
    // driver-sized by definition); the sidecar ROWS stay distributed:
    // a left-semi join against the broadcast key table replaces the
    // old collect-and-filter, which at millions of indexed files would
    // pull whole stats sidecars into the driver
    val live: Set[String] =
      versions(path).flatMap(v => files(path, v)).toSet
    import spark.implicits._
    val liveDf = live.toSeq.sorted.toDF("file")
    var dropped = 0L
    roots.flatMap(r => listDir(r)(_.toSeq)).filter(Files.isDirectory(_))
      .foreach { colDir =>
      val df = spark.read.parquet(colDir.toString)
      val total = df.count()
      val kept = df.join(broadcast(liveDf), Seq("file"), "left_semi")
      val keptN = kept.count()
      if (keptN < total) {
        // rewrite via a temp dir + directory swap (Spark refuses a
        // self-overwrite of its own input path)
        val tmp = Files.createTempDirectory("graft_vacuum")
        kept.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        listDir(colDir)(_.toSeq).foreach(Files.deleteIfExists(_))
        listDir(tmp)(_.toSeq).foreach { p =>
          Files.move(p, colDir.resolve(p.getFileName.toString))
        }
        Files.deleteIfExists(tmp)
        dropped += total - keptN
      }
    }
    dropped
  }

  /** Commit history as a DataFrame (version, op, n_files). */
  def history(spark: SparkSession, path: String): DataFrame =
    spark.read.json(s"${logDir(path)}/v*.json")
      .select(col("version"), col("op"), size(col("files")).as("n_files"))
      .orderBy("version")

  /** Retention cleanup — the reference's "table retention policies to
    * auto-delete old files" (/root/reference/bronze_silver_gold/
    * readme.md:117), Delta's VACUUM analog: drop every manifest older
    * than the newest `retainLast` versions, then delete data files no
    * retained manifest references. Time travel to a vacuumed version
    * fails by design (its manifest is gone); readers of RETAINED versions
    * are untouched because their files are, too. Manifests go first so an
    * expired version disappears atomically before any of its exclusive
    * files do. Returns the number of data files deleted.
    *
    * `minAgeMs` guards the in-flight-commit window: a concurrent writer
    * stages data files BEFORE its manifest lands, and a zero-horizon
    * sweep would delete them as unreferenced, corrupting the commit the
    * moment it wins its race. Unreferenced files younger than the horizon
    * are left for the next vacuum — the same defense Delta's VACUUM
    * retention period provides. Pass 0 only when no writer can be active.
    */
  def vacuum(path: String, retainLast: Int = 1,
      minAgeMs: Long = 24L * 3600 * 1000): Int = {
    require(retainLast >= 1, "must retain at least the latest version")
    val vs = versions(path)
    // the sweep always runs (never short-circuit on version count): files
    // orphaned by an earlier manifest drop but protected by the age
    // horizon at the time, and leftovers of lost commit races, are
    // collected by whichever later vacuum finds them old enough
    val retained = vs.takeRight(retainLast)
    // deletion-vector files are table state like data files: live while
    // any retained manifest lists them, swept from their own root after
    val live = retained.flatMap(v =>
      files(path, v) ++ dvFiles(path, v)).toSet
    vs.dropRight(retainLast).foreach { v =>
      Files.deleteIfExists(manifestPath(path, v)); ()
    }
    // superseded checkpoints go with them; the NEWEST survives so the
    // op-dedup history of vacuumed versions remains consultable
    checkpoints(path).dropRight(1).foreach { v =>
      Files.deleteIfExists(checkpointPath(path, v)); ()
    }
    val horizon = System.currentTimeMillis() - minAgeMs
    def expired(p: Path): Boolean =
      Files.getLastModifiedTime(p).toMillis <= horizon
    var deleted = 0
    Seq(s"$path/data", s"$path/dv").map(Paths.get(_))
      .filter(Files.exists(_)).foreach { root =>
      val subs = listDir(root)(_.filter(Files.isDirectory(_)).toSeq)
      subs.foreach { sub =>
        val entries = listDir(sub)(_.toSeq)
        val parqs = entries.filter(_.toString.endsWith(".parquet"))
        val dead = parqs.filter(p => !live.contains(p.toString) && expired(p))
        dead.foreach { p => Files.deleteIfExists(p); deleted += 1 }
        if (!parqs.exists(p => live.contains(p.toString)) &&
            dead.size == parqs.size) {
          // no retained version reaches into this commit dir and every
          // data file is confirmed dead: remove the leftover markers
          // (_SUCCESS etc.) and the dir itself
          entries.filterNot(_.toString.endsWith(".parquet"))
            .foreach(Files.deleteIfExists(_))
          Files.deleteIfExists(sub)
          ()
        }
      }
    }
    deleted
  }

  /** OPTIMIZE-style file compaction — the reference's "OPTIMIZE command
    * to compact small files" with a 128-256MB target
    * (/root/reference/bronze_silver_gold/readme.md:96,107). Files of the
    * latest version smaller than `targetBytes` are bin-packed into
    * ~target-sized rewrites and committed as one new version whose
    * manifest lists (kept large files ++ compacted files); table CONTENT
    * is bit-identical (pure file-layout change), old versions still
    * time-travel, and the superseded small files become vacuumable.
    *
    * Scale shape: the driver touches only file METADATA (one size stat
    * per live file — what Delta reads from its log); the data move is a
    * distributed scan + repartition of just the small files, never the
    * whole table. Rewriting mixed-schema files materializes the unioned
    * schema with NULLs — exactly what merge-on-read surfaces, so reads
    * are unchanged.
    *
    * Optimistic concurrency as [[mergeCommit]]: the plan is computed
    * against a captured base and committed at base+1; losing the race
    * discards the rewrite and re-plans, so a concurrent append's files
    * are never dropped from the manifest.
    *
    * Returns the committed version, or None when fewer than 2 files are
    * below target (nothing to compact).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Option[Long] = {
    var result: Option[Option[Long]] = None
    while (result.isEmpty) {
      val base = latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path"))
      val all = files(path, base)
      val small = all.filter(f => Files.size(Paths.get(f)) < targetBytes)
      if (small.size < 2) result = Some(None)
      else {
        val keep = all.filterNot(small.toSet)
        val dvs = dvFiles(path, base)
        val total = small.map(f => Files.size(Paths.get(f))).sum
        val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
        // DV-masked rows must NOT resurrect in the rewrite: compact the
        // LIVE rows of the small files (their DV entries then go inert);
        // kept files retain their DV subtraction through the carried list
        val compacted = liveWithPos(spark, small, dvs)
          .drop(FileCol, PosCol).repartition(nOut)
        val (dataDir, newFiles) = writeData(compacted, path)
        if (tryCommit(path, base + 1, keep ++ newFiles, "compact", dvs)) {
          maybeCheckpoint(path, base + 1)
          result = Some(Some(base + 1))
        } else discardData(dataDir) // concurrent commit won: re-plan
      }
    }
    result.get
  }

  /** MERGE as a transaction: upsert `source` into the latest version on
    * `keys`, committed as a single new overwrite version (readers never
    * observe the intermediate state).
    *
    * Read-modify-write under optimistic concurrency: the merge is
    * computed against a CAPTURED base version and committed at exactly
    * base+1. If another writer commits first, the stale merge result is
    * DISCARDED and the merge re-runs against the new latest — the
    * lost-update behavior Delta's conflict detection prevents, prevented
    * the same way (detect, then re-execute rather than abort).
    */
  def mergeCommit(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String]): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path"))
      val merged = graft.operators.Merge.upsert(
        readVersion(spark, path, base), source, keys)
      val (dataDir, newFiles) = writeData(merged, path)
      if (tryCommit(path, base + 1, newFiles, "merge")) committed = base + 1
      else discardData(dataDir) // conflicting commit won: re-read, re-merge
    }
    maybeCheckpoint(path, committed)
    committed
  }
}
