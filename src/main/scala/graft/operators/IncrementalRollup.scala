package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance from a row-level change feed: apply a
  * CDF batch ([[graft.sources.VersionedTable.changes]] — `insert` /
  * `delete` rows tagged `_change_type`) to a keyed (sum, count)
  * aggregate WITHOUT re-reading the base table. Deletes are retractions
  * (−value, −1); groups whose count empties out drop. Cost is
  * O(|changes| + |touched groups|) — at 100 TB the base table never
  * re-scans, which is the entire point (q53 covers the append-only
  * partial-merge form; this handles deletes and DV-merges too).
  *
  * Exactness: sum/count are retraction-safe aggregates. Keep the value
  * column in an exact domain (integer/decimal — the house rule for
  * money); a DOUBLE sum would drift from a fresh recompute by
  * floating-point reassociation even though the algebra is right.
  */
object IncrementalRollup {

  /** The keyed (sum, count) aggregate this module maintains. */
  def fullAggregate(table: DataFrame, keyCols: Seq[String], valCol: String,
      sumCol: String = "sum_v", cntCol: String = "n_rows"): DataFrame =
    table.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valCol)).as(sumCol), count(lit(1)).as(cntCol))

  /** Net per-key deltas of one CDF batch (map-combinable; one shuffle
    * of the CHANGES, never the base).
    */
  def deltaAggregate(changes: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame =
    changes.withColumn("__sign",
        when(col("_change_type") === "delete", lit(-1L)).otherwise(lit(1L)))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valCol) * col("__sign")).as("__ds"),
        sum(col("__sign")).as("__dc"))

  /** current aggregate + CDF batch → next aggregate. Full-outer on the
    * keys: new groups appear, emptied groups drop.
    */
  def applyChanges(current: DataFrame, changes: DataFrame,
      keyCols: Seq[String], valCol: String,
      sumCol: String = "sum_v", cntCol: String = "n_rows"): DataFrame = {
    val d = deltaAggregate(changes, keyCols, valCol)
    current.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__ds"), lit(0L))).as(sumCol),
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L))).as(cntCol)): _*)
      .filter(col(cntCol) > 0)
  }
}
