package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a token stream,
  * built and queried entirely with DataFrame aggregations — no driver
  * state, no UDAF.
  *
  * The sketch is a (depth, bucket, cnt) table of `depths · width` rows
  * regardless of input size. Building it is ONE map-combinable groupBy:
  * each executor pre-aggregates its partition into a partial sketch, so
  * the exchange carries sketches, never tokens — the same property that
  * makes per-shard sketches mergeable by plain `cnt` summation (the
  * merge-distributivity [[CountMinSpec]] asserts). Point estimates are a
  * broadcast join of the query terms' (depth, bucket) keys against the
  * tiny sketch table folded into a `min` aggregation.
  *
  * Guarantees (classic CMS): estimates never under-count, and
  * over-count by more than ⌈e·N/width⌉ with probability ≤ exp(-depths).
  * The q114 oracle audits the one-sided error exactly (`over_err ≥ 0`).
  *
  * Hashing is the engine-portable depth-salted md5 prefix (the same
  * construction as the MinHash/LSH family in [[DedupOps]]), so any
  * engine with md5 rebuilds the identical sketch — what puts the whole
  * sketch, not a summary of it, under the DuckDB oracle.
  *
  * Completes the repo's mergeable-sketch family: HLL (distinct counts,
  * q97), Misra–Gries (heavy hitters, q59), Bloom (membership, q47) —
  * CMS adds point frequency estimates.
  */
object CountMin {

  /** Row-`depth` bucket of a token: depth-salted md5-prefix hash mod
    * `width`. 15 hex digits < 2⁶⁰, so the conv result is an exact
    * non-negative BIGINT on every engine.
    */
  def bucket(depth: Int, tok: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$depth|"), tok)), 1, 15), 16, 10)
      .cast("bigint") % width

  private def depthBuckets(tok: Column, depths: Int, width: Int): Column =
    array((0 until depths).map(d => bucket(d, tok, width)): _*)

  /** Build the (depth, bucket, cnt) sketch table from a token column. */
  def sketch(tokens: DataFrame, tokCol: String, depths: Int,
      width: Int): DataFrame =
    tokens
      .filter(col(tokCol).isNotNull) // null tokens would hash to null bins
      .select(posexplode(depthBuckets(col(tokCol), depths, width)))
      .select(col("pos").as("depth"), col("col").as("bucket"))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point-estimate each term in `terms`: min over depths of the term's
    * bucket counters. The sketch (≤ depths·width rows by construction)
    * broadcasts; terms never shuffle.
    */
  def estimate(sk: DataFrame, terms: DataFrame, termCol: String,
      depths: Int, width: Int): DataFrame =
    terms
      .filter(col(termCol).isNotNull)
      .select(col(termCol), posexplode(depthBuckets(col(termCol), depths, width)))
      .select(col(termCol), col("pos").as("depth"), col("col").as("bucket"))
      .join(broadcast(sk), Seq("depth", "bucket"), "left")
      .groupBy(termCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
