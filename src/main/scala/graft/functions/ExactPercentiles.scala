package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact linear-interpolation percentiles (ANSI percentile_cont) as a
  * typed Aggregator over primitive double buffers.
  *
  * Spark's built-in `percentile` aggregate buffers values in an
  * OpenHashMap[boxed Double, Long] — every row pays boxing plus a hash
  * probe, and the whole aggregate runs interpreted (ObjectHashAggregate).
  * For mostly-distinct inputs (monetary amounts, measurements) the map
  * compresses nothing; a flat growing buffer with one sort at finish is
  * several times faster at identical results: the interpolation below is
  * Spark's own formula, `(hi−pos)·lo_val + (pos−lo)·hi_val`, evaluated in
  * the same order so results are bit-identical to the built-in.
  *
  * Buffers are per-partition partials merged once (normal two-phase
  * aggregation) — memory is O(group values) exactly like the built-in's
  * map, so the scale envelope is unchanged; this trades constant factors
  * only. All requested percentiles come out of ONE buffered pass/sort
  * (the built-in re-sorts its map per percentile).
  */
object ExactPercentiles {

  final case class PercentilesAgg(ps: Seq[Double])
      extends Aggregator[Double, mutable.ArrayBuffer[Double], Seq[Double]] {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1], got $ps")

    override def zero: mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty

    override def reduce(b: mutable.ArrayBuffer[Double], x: Double)
        : mutable.ArrayBuffer[Double] = {
      // NaN is the null sentinel installed by the Column API below —
      // skipped so null inputs vanish exactly as the built-in
      // `percentile` skips them (the primitive channel would otherwise
      // decode null as 0.0 and silently corrupt the distribution)
      if (!x.isNaN) b += x
      b
    }

    override def merge(a: mutable.ArrayBuffer[Double],
        b: mutable.ArrayBuffer[Double]): mutable.ArrayBuffer[Double] = {
      a ++= b; a
    }

    override def finish(b: mutable.ArrayBuffer[Double]): Seq[Double] = {
      val arr = b.toArray
      // no surviving values (empty group or all-null input): NULL array,
      // matching the built-in percentile / quantile_cont contract —
      // emitting NaNs here would leak the null sentinel into results
      if (arr.isEmpty) return null
      java.util.Arrays.sort(arr)
      ps.map { p =>
        {
          // Spark Percentile.getPercentile: position on n−1 gaps, floor/
          // ceil neighbors, convex combination in THIS evaluation order
          val pos = p * (arr.length - 1)
          val lo = math.floor(pos).toInt
          val hi = math.ceil(pos).toInt
          if (lo == hi) arr(lo)
          else (hi - pos) * arr(lo) + (pos - lo) * arr(hi)
        }
      }
    }

    override def bufferEncoder: Encoder[mutable.ArrayBuffer[Double]] =
      Encoders.kryo[mutable.ArrayBuffer[Double]]
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Column API: `df.groupBy(...).agg(percentiles($"x", Seq(0.5, 0.9)))`
    * → array<double> in the requested order. NULL (and NaN) inputs are
    * skipped, matching the built-in `percentile`: the primitive input
    * channel cannot carry null, so nulls ride in as NaN and the reduce
    * drops them — NaN has no defined rank in an ordered statistic
    * anyway, so conflating the two loses nothing.
    */
  def percentiles(value: Column, ps: Seq[Double]): Column =
    udaf(PercentilesAgg(ps), Encoders.scalaDouble)
      .apply(org.apache.spark.sql.functions.coalesce(value,
        org.apache.spark.sql.functions.lit(Double.NaN)))
}
