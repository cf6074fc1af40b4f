package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core decomposition — iterative peeling of nodes with degree
  * < k, the classic graph-density screen (Seidman 1983): after peeling,
  * every surviving node has ≥ k surviving neighbors, so the core
  * separates structurally-embedded nodes from hangers-on. Used in
  * curation as a noise filter over similarity/co-occurrence graphs (a
  * doc connected to many docs that are themselves well-connected is
  * corroborated; a pendant cluster is not).
  *
  * Shape: each round is ONE map-combinable degree aggregate plus two
  * semi-joins restricting the edge list to surviving endpoints — no
  * neighbor lists, no per-node state, the same join+agg round discipline
  * as [[PageRank]]/[[ShortestPaths]]. Rounds are BOUNDED (like q126's
  * bounded Bellman–Ford) so the oracle can unroll the identical
  * computation: peeling is idempotent at fixpoint, so extra rounds are
  * no-ops and a production caller can early-exit on a stable edge count
  * without changing the result. Per-round `localCheckpoint` keeps the
  * iterative lineage flat.
  */
object KCore {

  /** Peel `rounds` times at threshold `k` over the undirected graph
    * given as (aCol, bCol) pairs (duplicates/self-loops tolerated).
    * Returns (node, core_degree): every node still in the edge set after
    * the final peel, with its degree in that surviving edge set.
    */
  def core(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // checkpoints with the recorded output partitioning ERASED
    // (graftbridge doc): nothing downstream can exploit the distinct's
    // hash(u,v) layout (degrees group by single endpoints, the semi
    // joins shuffle by u and by v), but the recorded partitioning's
    // un-canonicalized exprIds block ReuseExchange — so each round's
    // `keep` subtree (the full degree aggregate) planned TWICE, once
    // per semi-join build side
    // LAZY checkpoints, materialized by each round's count action (the
    // CC discipline: one job per round instead of an eager
    // materialization job PLUS a probe)
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.eraseScanPartitioning(
        df.localCheckpoint(false))
    var e = ckpt(edges.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    // EARLY EXIT on a stable edge count — value-identical to running
    // every remaining round: peeling only ever REMOVES edges, so an
    // unchanged count means the keep-filter passed every endpoint and
    // the edge set is the fixpoint; all further peels are no-ops (which
    // is also why the bounded-round oracle can unroll a fixed count).
    // At corpus scale the bound exists to LIMIT work on pathological
    // graphs, not to force provably-no-op full-edge-set semi-join
    // passes on converged ones. The count action doubles as the lazy
    // checkpoint's materializer, so a round is still ONE job.
    var prevCount = e.count()
    var stable = prevCount == 0L
    var peels = 0
    while (peels < rounds && !stable) {
      val keep = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("n")
      val next = ckpt(e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi"))
      val c = next.count()
      stable = c == prevCount
      prevCount = c
      // previous round's snapshot is dead once `next` materializes (the
      // count above); Dataset.unpersist cannot free checkpoint blocks,
      // so release the RDD directly instead of pinning every round's
      // edge set until the harness drain
      graft.CacheScope.freeLocalCheckpoint(e)
      e = next
      peels += 1
    }
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("core_degree"))
  }
}
