package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index — the Delta-style data-skipping
  * layer for plain-parquet tables. Delta keeps per-file column stats in
  * its transaction log and prunes files before the scan; here the stats
  * table is computed once per layer write (one aggregation over the
  * data, grouped by file) and persisted next to the table. Readers
  * intersect their predicate range with each file's [min,max] and hand
  * Spark only the surviving files — on a date-clustered 100 TB layer a
  * narrow range touches a handful of files instead of all of them, on
  * top of the row-group pruning parquet already does inside each file.
  */
object StatsIndex {

  /** Compute the per-file [min,max] stats table for `columns` of the
    * parquet table at `path`.
    */
  def collectStats(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Persist the stats table next to the layer (its "manifest"). */
  def writeStats(spark: SparkSession, path: String, columns: Seq[String]): Unit =
    collectStats(spark, path, columns)
      .coalesce(1).write.mode("overwrite").parquet(s"${path}__stats")

  /** Read only the files whose [min,max] range for `column` intersects
    * [lo, hi]; equivalent results to a full scan + filter, touching a
    * subset of files. Returns (DataFrame, filesRead, filesTotal).
    */
  def prunedRead(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): (DataFrame, Long, Long) = {
    val stats = spark.read.parquet(s"${path}__stats")
    val total = stats.count()
    val keep = stats.filter(
      col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select("file").collect().map(_.getString(0))
    val df =
      if (keep.isEmpty) {
        // predicate range misses every file: empty result, table schema
        val schema = spark.read.parquet(path).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else spark.read
        // basePath anchors partition discovery: the stats were built
        // over the whole table (hive partition columns reconstructed),
        // and a leaf-file read WITHOUT it drops those columns — a
        // pruned read of a partitioned layer would crash resolving the
        // partition column (or silently return a narrower schema),
        // breaking the documented full-scan equivalence
        .option("basePath", path)
        .parquet(keep.toIndexedSeq: _*)
        .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
    (df, keep.length.toLong, total)
  }
}
