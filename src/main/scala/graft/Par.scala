package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism repair for CPU-heavy map stages.
  *
  * Spark parallelizes a parquet scan by file splits, and a single
  * row group can only be read by one task — so an input that arrives
  * as one row group (the driver fixtures; any small-file or
  * badly-written upstream layout) executes EVERYTHING fused into the
  * scan stage serially: explodes, per-token hashing, codec work,
  * broadcast-join chains. When the per-row CPU downstream dwarfs one
  * pass over the bytes, a round-robin (or key-clustered) exchange to
  * core count is the cheap repair.
  *
  * [[toCores]] applies it CONDITIONALLY: if the plan already yields at
  * least `defaultParallelism` partitions — the normal case at real
  * scale, where inputs have many splits — it is a no-op, so library
  * call sites pay the extra shuffle only on degenerate layouts instead
  * of unconditionally re-shuffling their largest input. Passing key
  * columns clusters as well as widens, letting downstream per-key
  * windows/aggregates reuse the exchange.
  */
object Par {

  /** `df`, at least `defaultParallelism`-wide — unchanged if the plan
    * already is, else repartitioned (by `keys` when given, round-robin
    * otherwise). Deciding needs the physical partition count, which
    * forces plan translation on the driver but launches no job and
    * reads no data.
    */
  def toCores(df: DataFrame, keys: Column*): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= dp) df
    else if (keys.isEmpty) df.repartition(dp)
    else df.repartition(dp, keys: _*)
  }
}
