package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — range join and as-of join — composed from built-in
  * operators in their SCALABLE shapes (extension preference order (a):
  * composition before custom Catalyst plans).
  *
  * A naive range/as-of join is a non-equi join, which Spark plans as a
  * broadcast-nested-loop — quadratic and driver-bound at scale. Both
  * operators here reduce to EQUALITY joins:
  * - range join: bucket event time into tolerance-sized bins; a pair
  *   within tolerance must sit in the same or adjacent bins, so joining
  *   on (key, bin) ∪ (key, bin±1) + an exact residual filter finds
  *   exactly the in-range pairs with an ordinary hash shuffle.
  * - as-of join: union both sides tagged, one window pass per key in
  *   time order carrying the last right-side value forward — a single
  *   shuffle on the key, no join at all.
  */
object Temporal {

  /** Pairs of `left`×`right` rows with equal `key` whose timestamps
    * differ by at most `toleranceSec`. Output keeps all left/right
    * columns (prefixed); callers project.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0)
    val tolUs = toleranceSec * 1000000L
    // integer `div`, not floating division + floor: double rounding can
    // misbin values that land exactly on a bucket boundary
    def bin(tsName: String): Column = expr(s"unix_micros($tsName) div $tolUs")
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withColumn("__bin_l", bin(s"l_$leftTs"))
    // replicate the right side into its own bin and both neighbors so the
    // equality join on (key, bin) covers every in-tolerance pair once
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withColumn("__shift", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bin_r", bin(s"r_$rightTs") + col("__shift"))
      .drop("__shift")
    l.join(r, col(s"l_$key") === col(s"r_$key") && col("__bin_l") === col("__bin_r"))
      .filter(abs(unix_micros(col(s"l_$leftTs")) - unix_micros(col(s"r_$rightTs")))
        <= tolUs)
      .drop("__bin_l", "__bin_r")
  }

  /** For each `left` row: the greatest `right` timestamp of the same key
    * that is ≤ the left timestamp (the as-of match), via the union +
    * running-last window — one shuffle on the key, linear state.
    * Returns `left` plus an `asof_ts` column (null when no prior right
    * row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns
    val tagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"), col("__rts")) ++
        lCols.map(col): _*)
      .unionByName(right
        .withColumn("__ts", col(rightTs))
        .withColumn("__side", lit(0))
        .withColumn("__rts", col(rightTs))
        .select(Seq(col(key).as("__key"), col("__ts"), col("__side"), col("__rts")) ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*))
    // right rows sort before left rows at the same instant (side 0 < 1),
    // so a left row at time t matches right rows with ts <= t
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) :+ col("asof_ts"): _*)
  }
}
