package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}

import graft.sources.VersionedTable

/** The one exactly-once foreachBatch shape shared by every
  * VersionedTable streaming sink: each micro-batch commits atomically
  * under the tag `"<appId>-batch-<batchId>"`, and re-delivered batches
  * (restart replay, zombie retries) are skipped — the tag is part of
  * [[VersionedTable.writeOnce]]'s commit race, so concurrent replays
  * cannot both commit. The driver-side tag cache seeded from the log on
  * the first batch makes the common skip path O(1) per batch.
  *
  * The `appId` NAMESPACES the tag (the Delta SetTransaction
  * discipline): without it, a second query sinking to the same table
  * collides with the first query's batch numbers and its data is
  * silently dropped. Contract, same as Delta's txn appId: an appId is
  * bound to ONE checkpoint lineage — starting over with a FRESH
  * checkpoint dir (batch ids reset to 0) requires a NEW appId, or the
  * old tags will skip the restarted query's early batches.
  */
private[streaming] object IdempotentSink {
  def start(df: DataFrame, tablePath: String, checkpointDir: String,
      appId: String)(transform: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val seen = scala.collection.mutable.Set.empty[String]
    var seeded = false
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val tag = s"$appId-batch-$batchId"
        if (!seeded) {
          seen ++= VersionedTable.committedOps(batch.sparkSession, tablePath)
          seeded = true
        }
        if (!seen.contains(tag)) {
          VersionedTable.writeOnce(transform(batch.toDF()), tablePath,
            SaveMode.Append, tag)
          seen += tag
          ()
        }
      }
      .start()
  }
}
