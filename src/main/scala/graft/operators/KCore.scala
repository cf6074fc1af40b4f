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
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.eraseScanPartitioning(
        df.localCheckpoint())
    var e = ckpt(edges.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    for (_ <- 1 to rounds) {
      val keep = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("n")
      val next = ckpt(e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi"))
      // previous round's snapshot is dead once `next` materializes
      // (eager checkpoint); Dataset.unpersist cannot free checkpoint
      // blocks, so release the RDD directly instead of pinning every
      // round's edge set until the harness drain
      graft.CacheScope.freeLocalCheckpoint(e)
      e = next
    }
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("core_degree"))
  }
}
