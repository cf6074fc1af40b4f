package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Read-only `_delta_log` interop: fixtures are built BY HAND to the
  * public Delta transaction-log protocol (JSON commits, percent-encoded
  * relative paths, partition values in add actions, parquet checkpoint
  * + `_last_checkpoint` pointer) — no Delta jar exists in this
  * environment, which is exactly the situation the probe targets.
  */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private val tableSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("ds", StringType)))

  /** JSON-string-escape a schemaString for embedding in an action. */
  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def metaAction: String =
    s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},"schemaString":"${esc(tableSchema.json)}","partitionColumns":["ds"],"configuration":{},"createdTime":1700000000000}}"""

  private def protocolAction(reader: Int = 1): String =
    s"""{"protocol":{"minReaderVersion":$reader,"minWriterVersion":2}}"""

  private def addAction(path: String, ds: String): String =
    s"""{"add":{"path":"$path","partitionValues":{"ds":"$ds"},"size":512,"modificationTime":1700000000000,"dataChange":true}}"""

  private def removeAction(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000001000,"dataChange":true}}"""

  /** Write `df` (k, v only — partition values live in the log) as a
    * single parquet FILE at tableRoot/relPath, Delta-layout style.
    */
  private def writeDataFile(root: Path, relPath: String, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("delta_part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val target = root.resolve(relPath)
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeCommit(root: Path, version: Long, actions: Seq[String]): Unit = {
    val logDir = root.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"$version%020d.json"),
      actions.mkString("", "\n", "\n"))
  }

  /** v0: file1(ds=01) + meta + protocol; v1: file2(ds=02);
    * v2: remove file1, add file3(ds=01).
    */
  private def fixture(): Path = {
    val root = Files.createTempDirectory("delta_tbl").resolve("t")
    Files.createDirectories(root)
    writeDataFile(root, "ds=2024-01-01/part-0000.parquet",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    writeDataFile(root, "ds=2024-01-02/part-0001.parquet",
      Seq((3L, "c")).toDF("k", "v"))
    writeDataFile(root, "ds=2024-01-01/part-0002.parquet",
      Seq((4L, "d")).toDF("k", "v"))
    writeCommit(root, 0L, Seq(protocolAction(), metaAction,
      addAction("ds=2024-01-01/part-0000.parquet", "2024-01-01")))
    writeCommit(root, 1L, Seq(
      addAction("ds=2024-01-02/part-0001.parquet", "2024-01-02")))
    writeCommit(root, 2L, Seq(
      removeAction("ds=2024-01-01/part-0000.parquet"),
      addAction("ds=2024-01-01/part-0002.parquet", "2024-01-01")))
    root
  }

  test("latest snapshot replays adds minus removes, restoring partition values") {
    val root = fixture()
    val df = DeltaInterop.read(spark, root.toString)
    assert(df.columns.toSeq == Seq("k", "v", "ds"), "log-declared column order")
    val rows = df.as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((3L, "c", "2024-01-02"), (4L, "d", "2024-01-01")))
  }

  test("time travel reads the pre-remove file set") {
    val root = fixture()
    val v1 = DeltaInterop.read(spark, root.toString, asOf = Some(1L))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(v1 == Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"),
      (3L, "c", "2024-01-02")))
    val v0 = DeltaInterop.read(spark, root.toString, asOf = Some(0L))
    assert(v0.count() == 2)
  }

  test("checkpoint bootstrap: snapshot resolves after pre-checkpoint commits are cleaned") {
    val root = fixture()
    val logDir = root.resolve("_delta_log")
    // checkpoint at v2 = the live adds + meta + protocol, columnar
    val cpJson = Seq(
      addAction("ds=2024-01-02/part-0001.parquet", "2024-01-02"),
      addAction("ds=2024-01-01/part-0002.parquet", "2024-01-01"),
      metaAction, protocolAction())
    spark.read.json(cpJson.toDS).coalesce(1)
      .write.mode("overwrite").parquet(logDir.resolve("cp_tmp").toString)
    val part = Files.list(logDir.resolve("cp_tmp")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, logDir.resolve(f"${2L}%020d.checkpoint.parquet"))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":2,"size":4}""")
    // log cleanup: pre-checkpoint JSON commits removed — the replay MUST
    // come from the checkpoint now
    Seq(0L, 1L, 2L).foreach(v =>
      Files.delete(logDir.resolve(f"$v%020d.json")))
    // one post-checkpoint commit on top
    writeDataFile(root, "ds=2024-01-03/part-0003.parquet",
      Seq((5L, "e")).toDF("k", "v"))
    writeCommit(root, 3L, Seq(
      addAction("ds=2024-01-03/part-0003.parquet", "2024-01-03")))
    val rows = DeltaInterop.read(spark, root.toString)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((3L, "c", "2024-01-02"), (4L, "d", "2024-01-01"),
      (5L, "e", "2024-01-03")))
  }

  test("unsupported reader protocol is refused, not misread") {
    val root = Files.createTempDirectory("delta_v3").resolve("t")
    Files.createDirectories(root)
    writeDataFile(root, "part-0000.parquet", Seq((1L, "a")).toDF("k", "v"))
    writeCommit(root, 0L, Seq(protocolAction(reader = 3), metaAction,
      s"""{"add":{"path":"part-0000.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.snapshot(spark, root.toString)
    }
    assert(e.getMessage.contains("protocol"))
  }

  test("a non-delta directory is rejected up front") {
    val root = Files.createTempDirectory("not_delta")
    intercept[IllegalArgumentException] {
      DeltaInterop.snapshot(spark, root.toString)
    }
  }
}
