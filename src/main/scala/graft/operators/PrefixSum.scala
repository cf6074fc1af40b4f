package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-sum (running total) over a global ordering — the
  * scan primitive behind surrogate-key assignment, sequence packing, and
  * offset/byte-position bookkeeping.
  *
  * A naive `sum(x) over (order by k)` window has no partition key: Spark
  * plans it as a SINGLE task holding the whole dataset ("WindowExec: No
  * Partition Defined"), which serializes a 100 TB scan through one
  * executor thread. Instead: range-bucket the ordering column with
  * approximate quantiles (any monotone bucketing yields the identical
  * global result — boundaries need not be exact), window WITHIN buckets
  * in parallel, and add per-bucket base offsets from a bounded
  * aggregation. Two driver-side actions move <= `buckets` numbers each —
  * never data — and the result is bit-identical to the single-partition
  * window at any parallelism.
  */
object PrefixSum {

  /** Append `outName` = exclusive running total of `valueCol` (the sum of
    * all values STRICTLY BEFORE each row) in ascending `orderCols` order.
    *
    * Requirements: `orderCols` must be a total order (ties would make
    * "before" ambiguous in any engine), `valueCol` non-null, and the
    * leading order column numeric-castable for bucket spread (a
    * non-numeric leading key degrades to one bucket — still correct, not
    * parallel).
    */
  def exclusiveRunningTotal(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, outName: String, buckets: Int = 64): DataFrame = {
    // persisted: three consumers (quantile sketch, bucket counts, the
    // output plan itself) would otherwise each recompute the input. The
    // cache holds the caller's input plus two derived columns — callers
    // pass narrow projections — and spills to disk when it doesn't fit
    val tmp = graft.CacheScope.persisted(df
      .withColumn("__ps_ord", orderCols.head.try_cast("double"))
      .withColumn("__ps_val", valueCol.cast("bigint")))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // sketch-based split points: driver receives <= buckets doubles
    val bounds = tmp.stat.approxQuantile("__ps_ord", probs, 0.01).distinct.sorted
    val bucketExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__ps_ord") > lit(b), 1).otherwise(0)
    }
    val bucketed = tmp.withColumn("__ps_bucket", bucketExpr)
    // per-bucket totals -> exclusive base offsets; bounded by `buckets`,
    // never by the data, and folded into a codegen'd when-chain (no
    // join or extra exchange in the plan)
    val sums = bucketed.groupBy(col("__ps_bucket"))
      .agg(sum(col("__ps_val")).as("__ps_sum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.map(_._1).zip(
      sums.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (b, off)) =>
      when(col("__ps_bucket") === lit(b), lit(off)).otherwise(acc)
    }
    // ROWS frame, not the default RANGE: with a total order they agree,
    // but ROWS keeps the frame O(1) per row instead of tie-group-sized
    val win = Window.partitionBy(col("__ps_bucket")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn(outName,
        sum(col("__ps_val")).over(win) - col("__ps_val") + offsetExpr)
      .drop("__ps_ord", "__ps_val", "__ps_bucket")
  }
}
