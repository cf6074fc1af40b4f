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

    // a checkpointed table may have ZERO json commits after log cleanup
    val cpVersionRaw: Option[Long] = {
      val lc = logDir.resolve("_last_checkpoint")
      if (!Files.exists(lc)) None
      else
        // tiny single-object JSON ({"version":N,"size":M,...})
        """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(Files.readString(lc))
          .map(_.group(1).toLong)
    }
    val latestKnown = (commitVersions.map(_._1) ++ cpVersionRaw.toSeq)
      .maxOption.getOrElse(
        throw new IllegalArgumentException(s"empty _delta_log at $path"))
    val upTo = asOf.getOrElse(latestKnown)
    // bootstrap from the checkpoint only when it does not overshoot asOf
    val cpVersion = cpVersionRaw.filter(_ <= upTo)
    val replay = commitVersions
      .filter { case (v, _) => v <= upTo && cpVersion.forall(v > _) }
    require(commitVersions.exists(_._1 == upTo) || cpVersion.contains(upTo),
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

  // ------------------------------------------------------------- write

  /** Minimal JSON string escape for action fields (schemaString is
    * itself JSON and needs its quotes escaped when embedded).
    */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Write `df` as a Delta commit (protocol 1) that any Delta reader
    * consumes — the outbound half of the interop. Overwrite creates or
    * replaces the table (metaData + protocol + adds + removes of the
    * previous live set); Append adds files, emitting an updated
    * metaData action when the schema widened (mergeSchema semantics —
    * new columns appended to the declared schema). Data files are
    * staged with Spark's own parquet writer (hive-style partition dirs,
    * which Delta also uses) and registered with their partition values
    * in the add actions, per the protocol. Commits are put-if-absent on
    * the 20-digit version file — the protocol's optimistic-concurrency
    * rule — retrying on collision. Returns the committed version.
    *
    * Scale: driver traffic is file-count bounded (staged-file listing +
    * log replay); the data itself moves file-by-file with no re-read.
    */
  def write(df: DataFrame, path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists,
      partitionBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.SaveMode
    val spark = df.sparkSession
    val root = Paths.get(path)
    val logDir = root.resolve("_delta_log")
    Files.createDirectories(logDir)
    // a table exists if the log holds any commit OR a checkpoint pointer
    // (cleanup can leave a checkpoint with zero json commits)
    val exists = Files.list(logDir).iterator().asScala
      .exists(p => CommitName.findFirstIn(p.getFileName.toString).isDefined ||
        p.getFileName.toString == "_last_checkpoint")
    require(mode != SaveMode.ErrorIfExists || !exists,
      s"delta table already exists at $path")
    if (mode == SaveMode.Ignore && exists) return snapshot(spark, path).version

    // stage data files with Spark's writer, then move under the root
    val tmp = Files.createTempDirectory("delta_stage")
    val w0 = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0)
      .parquet(tmp.toString)
    val staged = Files.walk(tmp).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    val adds = staged.map { p =>
      val rel = tmp.relativize(p)
      val target = root.resolve(rel)
      Files.createDirectories(target.getParent)
      Files.move(p, target)
      val pv = rel.iterator().asScala.toSeq.dropRight(1).map(_.toString)
        .filter(_.contains("=")).map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null else v)
        }
      val pvJson = pv.map { case (k, v) =>
        s"${jstr(k)}:${if (v == null) "null" else jstr(v)}" }
        .mkString("{", ",", "}")
      val size = Files.size(target)
      s"""{"add":{"path":${jstr(rel.toString)},"partitionValues":$pvJson,"size":$size,"modificationTime":${Files.getLastModifiedTime(target).toMillis},"dataChange":true}}"""
    }

    val metaAction = (schema: StructType) =>
      s"""{"metaData":{"id":${jstr(java.util.UUID.nameUUIDFromBytes(path.getBytes("UTF-8")).toString)},"format":{"provider":"parquet","options":{}},"schemaString":${jstr(schema.json)},"partitionColumns":${partitionBy.map(jstr).mkString("[", ",", "]")},"configuration":{},"createdTime":${System.currentTimeMillis()}}}"""
    val protocolAction =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

    // optimistic commit loop: derive the state, try CREATE_NEW, retry on
    // a concurrent writer's collision
    while (true) {
      val (version, head) =
        if (!exists || mode == SaveMode.Overwrite) {
          val removes =
            if (exists)
              snapshot(spark, path).files.map { case (f, _) =>
                s"""{"remove":{"path":${jstr(f)},"deletionTimestamp":${System.currentTimeMillis()},"dataChange":true}}"""
              }
            else Nil
          val v = if (exists) snapshot(spark, path).version + 1 else 0L
          (v, Seq(protocolAction, metaAction(df.schema)) ++ removes)
        } else {
          val snap = snapshot(spark, path)
          val merged = StructType(snap.schema.fields ++
            df.schema.fields.filterNot(f => snap.schema.fieldNames.contains(f.name)))
          val meta =
            if (merged.fieldNames.sameElements(snap.schema.fieldNames)) Nil
            else Seq(metaAction(merged))
          (snap.version + 1, meta)
        }
      try {
        Files.write(logDir.resolve(f"$version%020d.json"),
          (head ++ adds).mkString("", "\n", "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        return version
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost the race: re-derive
      }
    }
    -1L // unreachable
  }

  /** Write a parquet checkpoint of the current snapshot plus the
    * `_last_checkpoint` pointer, allowing pre-checkpoint JSON commits to
    * be cleaned — the same compaction a Delta writer performs.
    */
  def checkpoint(spark: SparkSession, path: String): Long = {
    import spark.implicits._
    val logDir = Paths.get(path, "_delta_log")
    val snap = snapshot(spark, path)
    // carry forward the LATEST metaData and protocol actions (commit
    // files replayed in version order; Files.list order is unspecified)
    val commitLines = Files.list(logDir).iterator().asScala
      .flatMap { p => p.getFileName.toString match {
        case CommitName(v) => Some(v.toLong -> p)
        case _ => None
      }}.toSeq.sortBy(_._1)
      .flatMap { case (_, p) => Files.readAllLines(p).asScala }
    val lastMeta = commitLines.filter(_.contains("\"metaData\""))
      .lastOption.getOrElse(
        throw new IllegalStateException("no metaData action to checkpoint"))
    val lastProtocol = commitLines.filter(_.contains("\"protocol\""))
      .lastOption.getOrElse("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
    val metaSrc = Seq(lastProtocol, lastMeta)
    val addJson = snap.files.map { case (f, pv) =>
      val pvJson = pv.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${jstr(k)}:${if (v == null) "null" else jstr(v)}" }
        .mkString("{", ",", "}")
      s"""{"add":{"path":${jstr(f)},"partitionValues":$pvJson,"size":0,"modificationTime":0,"dataChange":false}}"""
    }
    val tmp = Files.createTempDirectory("delta_cp")
    spark.read.json((metaSrc ++ addJson).toDS).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, logDir.resolve(f"${snap.version}%020d.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.writeString(logDir.resolve("_last_checkpoint"),
      s"""{"version":${snap.version},"size":${metaSrc.size + addJson.size}}""")
    snap.version
  }

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
