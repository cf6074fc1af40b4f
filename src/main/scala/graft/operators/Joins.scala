package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Null-safe key joins shared by the upsert/SCD operators.
  *
  * A plain `join(right, keys)` (USING form) never matches NULL = NULL,
  * so a NULL business key silently falls through every matched-branch:
  * an anti-join "untouched" set keeps the target's NULL-key row while
  * the source's copy unions in as new — one duplicate per merge, the
  * exact non-idempotency Delta MERGE does not have (its join condition
  * is whatever you write; these operators' contract is key EQUALITY
  * with NULLs matching NULLs, i.e. `<=>`).
  *
  * The right side's key columns are renamed before the condition is
  * built, so resolution is by unambiguous name even when `right`
  * derives from `left` (the SCD changed-keys set derives from the
  * current slice — dataset-apply disambiguation on shared expression
  * ids is exactly the self-join trap this avoids). Semi/anti joins
  * emit no right-side columns, so the rename never leaks.
  */
object Joins {
  private def renamed(right: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(right)((d, k) => d.withColumnRenamed(k, s"__js_$k"))

  private def cond(keys: Seq[String]) =
    keys.map(k => col(k) <=> col(s"__js_$k")).reduce(_ && _)

  /** left_semi on `keys`, NULL keys matching NULL keys. */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(renamed(right, keys), cond(keys), "left_semi")

  /** left_anti on `keys`, NULL keys matching NULL keys. */
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(renamed(right, keys), cond(keys), "left_anti")

  /** left outer on `keys`, NULL keys matching NULL keys. The right
    * side's key columns are dropped from the output (they duplicate
    * the left's); non-key right columns pass through.
    */
  def left(leftDf: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    leftDf.join(renamed(right, keys), cond(keys), "left")
      .drop(keys.map(k => s"__js_$k"): _*)
}
