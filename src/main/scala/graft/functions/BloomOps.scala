package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

/** Distributed Bloom-filter build/probe surfaced as Columns, built on the
  * native Catalyst expressions Spark itself uses for runtime join
  * pruning (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * machinery behind spark.sql.optimizer.runtime.bloomFilter). The build
  * is a real distributed aggregate (partial buffers merged exactly like
  * any other agg — no driver-side construction, no UDF), and the probe
  * is a codegen'd expression over the broadcast one-row filter.
  *
  * The 100 TB use: a small corpus (an eval set, a blocklist, yesterday's
  * keys) compresses to a few MB of bits that prefilter a fact-scale scan
  * BEFORE any join or shuffle — rows that cannot match never leave the
  * scan stage. False positives only cost wasted downstream work; there
  * are no false negatives, so exact post-verification keeps results
  * byte-identical to the unfiltered pipeline.
  */
object BloomOps {

  /** Standard optimal bit count for `n` items at false-positive rate
    * `fpp`: −n·ln(fpp)/ln²2.
    */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate a column into a Bloom filter (BinaryType buffer). Values
    * are xxhash64'd first — the same probe hashing must be applied on
    * the [[mightContain]] side, which it is.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    toColumn(new BloomFilterAggregate(
      toExpression(xxhash64(c)),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression())

  /** Probe: true if `c` might be in the filter, false if definitely not. */
  def mightContain(bloom: Column, c: Column): Column =
    toColumn(BloomFilterMightContain(toExpression(bloom), toExpression(xxhash64(c))))
}
