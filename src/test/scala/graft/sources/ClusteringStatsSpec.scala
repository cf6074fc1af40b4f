package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ClusteringStatsSpec extends SparkSpec {
  import spark.implicits._

  lazy val root: String = Files.createTempDirectory("cluster").toString

  /** Sum over files of per-file bounding-box area in (days × suppkey)
    * space — small when files are spatially local.
    */
  private def boxArea(path: String): Double =
    spark.read.parquet(path)
      .withColumn("days", datediff(to_date($"l_shipdate"), lit("1992-01-01")))
      .groupBy(input_file_name())
      .agg(((max($"days") - min($"days") + 1) *
        (max($"l_suppkey") - min($"l_suppkey") + 1)).as("area"))
      .agg(sum($"area")).as[Double].collect()(0)

  test("z-order clustering localizes files in both dimensions") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("days", datediff(to_date($"l_shipdate"), lit("1992-01-01")))
    Clustering.writeZOrdered(li, s"$root/zorder", $"days", $"l_suppkey", 8)
    li.repartition(8).write.mode("overwrite").parquet(s"$root/unclustered")
    val (z, u) = (boxArea(s"$root/zorder"), boxArea(s"$root/unclustered"))
    assert(z < u / 2,
      s"z-ordered files must cover far smaller bounding boxes: z=$z unclustered=$u")
    // clustering preserves the data
    assert(spark.read.parquet(s"$root/zorder").count() == li.count())
  }

  test("stats index prunes files and preserves query results") {
    val li = Tables.lineitem(spark, sf)
    Clustering.writeZOrdered(
      li.withColumn("days", datediff(to_date($"l_shipdate"), lit("1992-01-01"))),
      s"$root/bydate", $"days", $"l_suppkey", 16)
    StatsIndex.writeStats(spark, s"$root/bydate", Seq("days", "l_suppkey"))
    // a two-month slice in the middle of the data's actual day range
    val (pruned, read, total) = StatsIndex.prunedRead(
      spark, s"$root/bydate", "days", 2000, 2060)
    assert(read < total, s"narrow range must skip files (read $read of $total)")
    val full = spark.read.parquet(s"$root/bydate")
      .filter($"days" >= 2000 && $"days" <= 2060)
    assert(full.count() > 0)
    assert(pruned.count() == full.count() && pruned.exceptAll(full).isEmpty,
      "pruned read must return exactly the full-scan result")
    // a range entirely outside the data prunes everything, returns empty
    val (empty, read0, _) = StatsIndex.prunedRead(spark, s"$root/bydate", "days", 0, 10)
    assert(read0 == 0 && empty.count() == 0)
  }

  test("stats index prunedRead reconstructs hive partition columns (basePath)") {
    // stats are built over the whole table (partition discovery on);
    // a pruned read of leaf files WITHOUT basePath dropped the
    // partition column — crashing partition-column predicates and
    // breaking the documented full-scan equivalence
    val df = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"),
      (4L, 40L, "b")).toDF("k", "v", "ds")
    df.write.mode("overwrite").partitionBy("ds").parquet(s"$root/part")
    StatsIndex.writeStats(spark, s"$root/part", Seq("v"))
    val (pruned, read, total) = StatsIndex.prunedRead(
      spark, s"$root/part", "v", 10L, 20L)
    assert(read <= total)
    assert(pruned.columns.contains("ds"),
      "partition column must survive the pruned read")
    val full = spark.read.parquet(s"$root/part")
      .filter($"v" >= 10L && $"v" <= 20L)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("ZOrder clustering of an EMPTY input is the identity, not an NPE") {
    val empty = spark.range(0)
      .select($"id".as("a"), $"id".as("b"))
    assert(ZOrder.clustered(empty, "a", "b", 4).count() == 0)
    ZOrder.clusterWrite3(empty.withColumn("c", $"a"),
      s"$root/z3empty", "a", "b", "c", 4)
    assert(spark.read.parquet(s"$root/z3empty").count() == 0)
    ZOrder.hilbertClusterWrite(empty, s"$root/hempty", "a", "b", 4)
    assert(spark.read.parquet(s"$root/hempty").count() == 0)
  }
}
