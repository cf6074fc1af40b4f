package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed community detection by synchronous label propagation
  * (Raghavan et al. 2007) with a DETERMINISTIC tie-break — the
  * cross-engine-checkable variant of the usually-randomized algorithm.
  *
  * Every node starts labeled with its own id; each round every node
  * adopts the most frequent label among its neighbors, ties broken by
  * the SMALLEST label. Synchronous updates + total tie order make the
  * result a pure function of the graph and the round count (the
  * classic async/random variant is neither reproducible nor
  * oracle-checkable), at the cost of the known label-oscillation mode
  * on bipartite structures — callers pick a fixed small round count,
  * which is also the standard convergence horizon in practice.
  *
  * Per round: one equality join (labels onto edges, shuffle on node
  * id), one map-combinable (node, label) vote count, and one
  * map-combinable argmax per node — the vote rows are bounded by the
  * DISTINCT neighbor labels per node, not the degree, so a 100
  * TB-scale hub aggregates partially map-side instead of collecting an
  * adjacency list anywhere. The argmax rides `max(struct(cnt,
  * -label))`: lexicographic struct ordering maximizes the count and,
  * among equal counts, maximizes the negated label = smallest label —
  * one aggregate, no ranking window. A per-round `localCheckpoint`
  * keeps plan/codegen cost flat in the round count ([[PageRank]]'s
  * discipline).
  */
object LabelPropagation {

  /** Community labels after `iters` synchronous rounds over the
    * undirected graph given as (aCol, bCol) BIGINT-castable pairs
    * (duplicates/self-loops tolerated; the edge set is symmetrized and
    * deduped, self-loops dropped). Returns (id, label).
    */
  def labels(edges: DataFrame, aCol: String, bCol: String,
      iters: Int): DataFrame = {
    val e0 = graft.CacheScope.persisted(
      edges.select(col(aCol).cast("bigint").as("src"),
          col(bCol).cast("bigint").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    // the adjacency cache carries the iteration width
    // ([[graft.Par.iterationWidth]]): every round's vote join runs on
    // these cached partitions
    val adj = graft.CacheScope.persisted(
      e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(graft.Par.iterationWidth(e0.sparkSession),
          col("src")))
    var lbl = adj.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val votes = adj.join(lbl, col("src") === col("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = votes.groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("label"))
        .localCheckpoint(true)
      // previous round's snapshot is dead once `next` materializes
      // (eager checkpoint; Dataset.unpersist cannot free checkpoint
      // blocks) — release instead of pinning every round until drain
      graft.CacheScope.freeLocalCheckpoint(lbl)
      lbl = next
    }
    lbl
  }
}
