package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
    * otherwise).
    *
    * With AQE OFF, deciding needs the physical partition count, which
    * forces plan translation on the driver but launches no job and
    * reads no data. With AQE ON that probe is NOT free: `Dataset.rdd`
    * materializes a separate `AdaptiveSparkPlanExec` whose final-plan
    * computation executes every upstream shuffle stage as a real job
    * and then discards the result (no exchange reuse across
    * QueryExecutions) — a call site wrapping a join/aggregate would run
    * its heavy upstream TWICE. So under AQE this is a no-op: adaptive
    * coalescing/skew handling already re-sizes stages at runtime, and
    * the narrow-scan case this repairs (one row group ⇒ one task) is a
    * bench-layout artifact, and the bench runs AQE off.
    */
  def toCores(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    if (spark.sessionState.conf.adaptiveExecutionEnabled) return df
    val dp = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= dp) df
    else if (keys.isEmpty) df.repartition(dp)
    else df.repartition(dp, keys: _*)
  }

  /** Partition width for a CACHED layout that an iterative operator's
    * join-aggregate rounds will reuse (PageRank weights, BFS edge
    * tables, label-propagation adjacency): at least half the cores —
    * so an environment-level per-cycle slowdown divides across real
    * cores instead of multiplying into wall time — but never below the
    * session reducer count, which is the data-sized knob at real scale
    * (where it normally exceeds core count and this returns it
    * unchanged). Half, not all: iteration stages are short and
    * repeated, and full-width tiny tasks oversubscribe SMT siblings
    * (measured ~1.6× summed-CPU inflation at 32-wide on a 32-vcpu box).
    */
  def iterationWidth(s: SparkSession): Int =
    math.max(s.sparkContext.defaultParallelism / 2,
      s.sessionState.conf.numShufflePartitions)
}
