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
    * of the CHANGES, never the base). Signs are mapped EXPLICITLY per
    * change type — insert/update_postimage add, delete/update_preimage
    * retract — and an unrecognized type fails the job instead of
    * silently corrupting the maintained aggregate with a guessed sign
    * (this module and [[IncrementalView]] previously defaulted unknown
    * types to OPPOSITE signs — a trap for any future CDF source that
    * emits update pre/post images).
    */
  def deltaAggregate(changes: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame =
    changes.withColumn("__sign", IncrementalView.changeSign)
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
    // NULL-SAFE key equality: a plain USING join never matches a null
    // group key, so the null-key group would split into two output rows
    // (the stale current row AND the delta row) instead of merging —
    // diverging from the fresh recompute this module promises to equal
    val cond = keyCols.map(k => current(k) <=> d(k)).reduce(_ && _)
    current.join(d, cond, "full_outer")
      .select(keyCols.map(k => coalesce(current(k), d(k)).as(k)) ++ Seq(
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__ds"), lit(0L))).as(sumCol),
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L))).as(cntCol)): _*)
      // =!= 0, not > 0 (the IncrementalView rule): counts cannot go
      // negative on a consistent feed, and an inconsistent one should
      // surface as a visible negative-count row, not vanish
      .filter(col(cntCol) =!= 0)
  }
}
