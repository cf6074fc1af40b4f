package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance driven by the row-level
  * change data feed ([[graft.sources.VersionedTable.changes]]) — the
  * missing half of aggregate-table refresh (SURVEY.md §2 D12): the
  * append-only path (Gold.mergeRollup, q53) cannot absorb DELETEs, but a
  * change feed can, via SIGNED partial aggregates (+1 per insert, −1 per
  * delete; classic incremental view maintenance). Counts and sums are
  * self-inverse under the sign, so the view never needs the base table
  * again; a MAX/MIN cannot be maintained this way (a deleted maximum
  * needs a rescan) and is deliberately absent from the maintainable
  * surface.
  *
  * Scale shape: the delta aggregate is over the CHANGE SLICE only
  * (O(changed rows), map-combinable), and the merge touches the view's
  * key space, never the base table — at 100 TB the refresh cost tracks
  * the write rate, not the table size.
  */
object IncrementalView {

  /** The one signed-CDF convention, shared with [[IncrementalRollup]]:
    * insert / update_postimage contribute +1, delete / update_preimage
    * retract −1, and any OTHER change type fails the job loudly — the
    * two modules previously guessed opposite signs for unknown types,
    * so the same malformed feed would double-count in one and
    * double-retract in the other.
    */
  private[operators] def changeSign: org.apache.spark.sql.Column =
    when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(
        lit("unknown _change_type: "), col("_change_type"))).cast("long"))

  /** Signed partial aggregate of a change-feed slice: per key, the net
    * row count and net decimal sum of `valueCol` (exact — decimal
    * partials merge associatively, no float drift across refreshes).
    */
  def delta(changes: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    changes
      .withColumn("_sign", changeSign)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_sign")).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)") * col("_sign")).as("total"))

  /** The view a full recompute would produce (used to seed, and by specs
    * to prove delta-maintenance ≡ recompute).
    */
  def full(base: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total"))

  /** Merge a signed delta into the maintained view. Keys whose net count
    * reaches zero drop out — exactly what a recompute would show.
    */
  def merge(view: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("total")).as("total"))
      .filter(col("n_rows") =!= 0)
}
