package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** READ-ONLY interop with the Delta Lake transaction-log wire format —
  * the on-disk layout the reference's loaders write with
  * `format("delta")` (/root/reference/bronze/bronze_rx_claims_load.py:58-63).
  * [[VersionedTable]] reimplements the SEMANTICS (ACID log, time travel,
  * DV, CDF, OPTIMIZE, VACUUM) in a portable layout; this probe closes
  * the wire-format gap for reads: a table produced by a Delta writer can
  * be consumed by this engine with no Delta jar on the classpath.
  *
  * Built strictly from the PUBLIC protocol (delta.io "Delta Transaction
  * Log Protocol"): `_delta_log/<20-digit version>.json` holds one JSON
  * action per line (`add`/`remove`/`metaData`/`protocol`/`commitInfo`);
  * `_last_checkpoint` points at a parquet checkpoint carrying the same
  * actions in columnar form; the live file set at version V = replay of
  * adds minus removes up to V; `metaData.schemaString` is a JSON
  * StructType (directly `DataType.fromJson`-parsable — Delta reuses
  * Spark's schema serialization); partition values ride in each add
  * action, NOT in the data files.
  *
  * Scale shape: the log is file-count-bounded (one row per action), so
  * snapshot resolution collects only file metadata to the driver — the
  * same order of driver traffic as listing the directory. Data reads
  * group adds by partition tuple and scan each group with the declared
  * schema, so partition values become literal columns (no re-inference
  * from dir names, which the protocol does not guarantee).
  *
  * Deliberately out of scope (guarded, not silently wrong): reader
  * protocol ≥ 2 (column mapping, deletion vectors, v2 checkpoints) —
  * [[snapshot]] refuses those tables with an explicit error instead of
  * returning phantom rows.
  */
object DeltaInterop {

  /** A resolved table state: the live files (path → partition values),
    * the declared schema, and the partition columns.
    */
  final case class DeltaSnapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[(String, Map[String, String])])

  private val CommitName = """(\d{20})\.json""".r

  /** Resolve the live snapshot at `asOf` (default: latest) by replaying
    * the checkpoint (if usable) plus the JSON commits.
    */
  def snapshot(spark: SparkSession, path: String,
      asOf: Option[Long] = None): DeltaSnapshot = {
    val logDir = Paths.get(path, "_delta_log")
    require(Files.isDirectory(logDir), s"not a Delta table: no _delta_log under $path")

    val commitVersions: Seq[(Long, Path)] =
      Files.list(logDir).iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case CommitName(v) => Some(v.toLong -> p)
          case _ => None
        }
      }.toSeq.sortBy(_._1)
    require(commitVersions.nonEmpty, s"empty _delta_log at $path")

    // checkpoint bootstrap: only when it does not overshoot asOf
    val cpVersion: Option[Long] = {
      val lc = logDir.resolve("_last_checkpoint")
      if (!Files.exists(lc)) None
      else {
        val txt = Files.readString(lc)
        // tiny single-object JSON ({"version":N,"size":M,...})
        """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          .filter(v => asOf.forall(v <= _))
      }
    }

    val upTo = asOf.getOrElse(commitVersions.last._1)
    val replay = commitVersions
      .filter { case (v, _) => v <= upTo && cpVersion.forall(v > _) }
    require(asOf.forall(v => commitVersions.exists(_._1 == v)) || cpVersion.contains(upTo),
      s"version $upTo not present in _delta_log at $path")

    // one struct-per-action-type row set, from checkpoint parquet and/or
    // JSON commits; `v` orders adds against removes across sources
    final case class Act(v: Long, kind: String, filePath: String,
        pv: Map[String, String], schemaString: String,
        partitionColumns: Seq[String], minReader: Long)
    def acts(df: DataFrame, versionCol: org.apache.spark.sql.Column): Seq[Act] = {
      val cols = df.columns.toSet
      def field(name: String, sub: String, dflt: org.apache.spark.sql.Column) =
        if (cols.contains(name)) col(s"$name.$sub") else dflt
      // spark.read.json infers partitionValues as a STRUCT (keys become
      // fields); checkpoint parquet written by Delta stores a MAP — fold
      // both to a map so the collect below is shape-independent
      val addPv: org.apache.spark.sql.Column =
        if (!cols.contains("add")) lit(null)
        else {
          val t = df.schema("add").dataType.asInstanceOf[StructType]
          if (!t.fieldNames.contains("partitionValues")) lit(null)
          else t("partitionValues").dataType match {
            case _: org.apache.spark.sql.types.MapType => col("add.partitionValues")
            case s: StructType if s.nonEmpty =>
              map(s.fields.flatMap(f => Seq(lit(f.name),
                col(s"add.partitionValues.${f.name}").cast("string"))).toSeq: _*)
            case _ => lit(null)
          }
        }
      df.select(
          versionCol.as("v"),
          field("add", "path", lit(null)).as("add_path"),
          addPv.as("add_pv"),
          field("remove", "path", lit(null)).as("remove_path"),
          field("metaData", "schemaString", lit(null)).as("schema_string"),
          (if (cols.contains("metaData")) {
            val t = df.schema("metaData").dataType.asInstanceOf[StructType]
            if (t.fieldNames.contains("partitionColumns")) col("metaData.partitionColumns")
            else lit(null)
          } else lit(null)).as("part_cols"),
          field("protocol", "minReaderVersion", lit(null)).cast("long").as("min_reader"))
        .collect().toSeq.flatMap { r =>
          val v = r.getLong(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[Act]
          if (!r.isNullAt(1)) out += Act(v, "add", r.getString(1),
            Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty),
            null, Nil, 0L)
          if (!r.isNullAt(3)) out += Act(v, "remove", r.getString(3), Map.empty, null, Nil, 0L)
          if (!r.isNullAt(4)) out += Act(v, "meta", null, Map.empty, r.getString(4),
            Option(r.getSeq[String](5)).map(_.toSeq).getOrElse(Nil), 0L)
          if (!r.isNullAt(6)) out += Act(v, "protocol", null, Map.empty, null, Nil, r.getLong(6))
          out.toSeq
        }
    }

    val cpActs: Seq[Act] = cpVersion.toSeq.flatMap { v =>
      val cp = logDir.resolve(f"$v%020d.checkpoint.parquet")
      require(Files.exists(cp), s"_last_checkpoint points at missing $cp")
      acts(spark.read.parquet(cp.toString), lit(v))
    }
    val jsonActs: Seq[Act] =
      if (replay.isEmpty) Nil
      else acts(
        spark.read.json(replay.map(_._2.toString): _*),
        regexp_extract(col("_metadata.file_path"), """(\d{20})\.json""", 1).cast("long"))
    val all = cpActs ++ jsonActs

    val minReader = all.filter(_.kind == "protocol").map(_.minReader)
      .maxOption.getOrElse(1L)
    require(minReader <= 1,
      s"Delta reader protocol $minReader unsupported (column mapping / " +
        "deletion vectors / v2 checkpoints are out of this probe's scope)")

    val meta = all.filter(_.kind == "meta").maxByOption(_.v).getOrElse(
      throw new IllegalStateException(s"no metaData action in _delta_log at $path"))
    val schema = DataType.fromJson(meta.schemaString).asInstanceOf[StructType]

    // live = path whose newest action is an add (same-version tie → add
    // wins: a commit never removes a file it adds)
    val lastAdd = all.filter(_.kind == "add").groupBy(_.filePath)
      .view.mapValues(as => as.maxBy(_.v)).toMap
    val lastRemove = all.filter(_.kind == "remove").groupBy(_.filePath)
      .view.mapValues(_.map(_.v).max).toMap
    val live = lastAdd.values.toSeq
      .filter(a => lastRemove.get(a.filePath).forall(_ <= a.v))
      .sortBy(_.filePath)
      .map(a => (decodePath(a.filePath), a.pv))
    DeltaSnapshot(upTo, schema, meta.partitionColumns, live)
  }

  /** add.path is a percent-encoded relative URI per the protocol. */
  private def decodePath(p: String): String =
    try new java.net.URI(p).getPath catch { case _: Exception => p }

  /** Read a Delta table's latest (or `asOf`) version as a DataFrame with
    * the log-declared schema, partition values restored from the add
    * actions.
    */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    val partSet = snap.partitionColumns.toSet
    val dataSchema = StructType(snap.schema.filterNot(f => partSet.contains(f.name)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val byPv = snap.files.groupBy(_._2)
    byPv.map { case (pv, fs) =>
      val base = spark.read.schema(dataSchema)
        .parquet(fs.map(f => s"$path/${f._1}"): _*)
      snap.partitionColumns.foldLeft(base) { (df, pc) =>
        val f = snap.schema(pc)
        // protocol: null partition value serializes as JSON null / absent
        df.withColumn(pc, lit(pv.getOrElse(pc, null)).cast(f.dataType))
      }.select(snap.schema.fieldNames.map(col).toSeq: _*)
    }.reduce(_.unionByName(_))
  }
}
