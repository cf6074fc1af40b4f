package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  *   atomically renamed into the log — readers see either the old or the
  *   new version, never a partial table;
  * - concurrent writers race on the version number; the loser's rename
  *   fails and retries against the next version (optimistic concurrency,
  *   as Delta does);
  * - `readVersion` time-travels by reading an old manifest — old data
  *   files are never mutated.
  *
  * Local-filesystem rename is atomic here; on an object store the same
  * protocol runs against a log store with put-if-absent.
  */
object VersionedTable {

  private def logDir(path: String): Path = Paths.get(path, "_graft_log")

  private def manifestPath(path: String, v: Long): Path =
    logDir(path).resolve(f"v$v%08d.json")

  /** Versions present in the log, ascending. */
  def versions(path: String): Seq[Long] = {
    val dir = logDir(path)
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d{8}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  def latestVersion(path: String): Option[Long] = versions(path).lastOption

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** Stage + atomically commit manifest for `version`; false if that
    * version already exists (lost the race).
    */
  private def tryCommit(path: String, version: Long, files: Seq[String],
      op: String): Boolean = {
    Files.createDirectories(logDir(path))
    val json =
      s"""{"version":$version,"op":"${esc(op)}","files":[${
        files.map(f => "\"" + esc(f) + "\"").mkString(",")}]}"""
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

  /** Write `df` as a new commit. Append mode unions the previous
    * version's files with the new ones; overwrite replaces them. Returns
    * the committed version.
    */
  def write(df: DataFrame, path: String, mode: SaveMode): Long =
    write(df, path, mode,
      if (mode == SaveMode.Append) "append" else "overwrite")

  /** As [[write]] with an explicit operation tag (used by the streaming
    * sink for exactly-once batch bookkeeping).
    */
  def write(df: DataFrame, path: String, mode: SaveMode, op: String): Long = {
    val dataDir = s"$path/data/${UUID.randomUUID()}"
    df.write.mode(SaveMode.Overwrite).parquet(dataDir)
    val newFiles = Files.list(Paths.get(dataDir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    var committed = -1L
    while (committed < 0) {
      val prev = latestVersion(path)
      val base = mode match {
        case SaveMode.Append => prev.map(files(path, _)).getOrElse(Seq.empty)
        case _ => Seq.empty
      }
      val next = prev.getOrElse(-1L) + 1
      if (tryCommit(path, next, base ++ newFiles, op))
        committed = next
    }
    committed
  }

  /** Operation tags already committed (for idempotent re-delivery). */
  def committedOps(spark: SparkSession, path: String): Set[String] =
    if (latestVersion(path).isEmpty) Set.empty
    else history(spark, path).select("op").collect().map(_.getString(0)).toSet

  /** The live files of `version` (parsed from its manifest via Spark's
    * JSON reader).
    */
  def files(path: String, version: Long): Seq[String] = {
    val spark = SparkSession.active
    spark.read.json(manifestPath(path, version).toString)
      .select(explode(col("files")).as("f"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Read the table as of `version` (time travel). */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = files(path, version)
    if (fs.isEmpty)
      spark.emptyDataFrame
    else spark.read.parquet(fs: _*)
  }

  /** Read the latest version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path,
      latestVersion(path).getOrElse(
        throw new IllegalStateException(s"no versions at $path")))

  /** Commit history as a DataFrame (version, op, n_files). */
  def history(spark: SparkSession, path: String): DataFrame =
    spark.read.json(s"${logDir(path)}/v*.json")
      .select(col("version"), col("op"), size(col("files")).as("n_files"))
      .orderBy("version")

  /** MERGE as a transaction: upsert `source` into the latest version on
    * `keys`, committed as a single new overwrite version (readers never
    * observe the intermediate state).
    */
  def mergeCommit(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String]): Long = {
    val merged = graft.operators.Merge.upsert(read(spark, path), source, keys)
    write(merged, path, SaveMode.Overwrite)
  }
}
