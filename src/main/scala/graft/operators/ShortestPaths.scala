package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed multi-source BFS / unweighted shortest paths — the
  * frontier formulation (Pregel's canonical example; Malewicz et al.
  * 2010), not repeated full-table relaxation.
  *
  * Each round expands ONLY the frontier (nodes first reached last
  * round): one equality join frontier⋈edges on the source id, a
  * distinct over the candidate set, and one anti-join against the
  * settled-distance table to drop already-reached nodes. In an
  * unweighted graph the first discovery IS the shortest path, so a
  * node's distance is written exactly once and never revised — total
  * work across all rounds is O(|E| + |V|) join rows, versus
  * O(rounds · |E|) for Bellman-Ford-style full relaxation. That is the
  * difference between a 100 TB edge list scanned once per REACHED hop
  * and one scanned per ROUND regardless of progress.
  *
  * The hop number enters as a literal (no per-row arithmetic chain), a
  * per-round `localCheckpoint` truncates lineage so Catalyst + codegen
  * cost stays flat in the round count (same discipline as
  * [[PageRank]]/[[ConnectedComponents]]), and the one driver scalar per
  * round is the frontier count used for early exit — bounded, and it
  * stops the loop the moment the reachable set is exhausted.
  */
object ShortestPaths {

  /** Hop distances from `sources` (a one-column DataFrame of node ids)
    * over the DIRECTED edge set (srcCol → dstCol); symmetrize first for
    * an undirected graph. Returns (id, dist) for every node reachable
    * within `maxHops`, including the sources at dist 0. Deterministic:
    * distance is a pure function of the graph, independent of
    * partitioning and join order.
    */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, idCol: String, maxHops: Int): DataFrame = {
    // the deduped edge cache carries the iteration width
    // ([[graft.Par.iterationWidth]]): the per-hop expansion join runs
    // on these cached partitions (the node-sized frontier broadcasts),
    // so a session reducer count narrower than the cores must not cap
    // the rounds' parallelism
    val e0 = graft.CacheScope.persisted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
        .repartition(graft.Par.iterationWidth(edges.sparkSession),
          col("src")))
    // settled distances accumulate as a LIST of per-hop checkpointed
    // frontiers, unioned lazily — each node's row is materialized exactly
    // once, when its hop settles. (Re-checkpointing `dist ∪ newly` every
    // round would rewrite the whole settled table per hop: O(V·rounds)
    // materialized rows instead of O(V).) The union depth is bounded by
    // maxHops, so lineage stays flat without per-round re-materialization.
    var parts = List(
      sources.select(col(idCol).as("id"), lit(0L).as("dist"))
        .distinct().localCheckpoint(true))
    def dist = parts.reduce(_ unionAll _)
    var frontier = parts.head.select("id")
    var hop = 1
    var expanding = true
    while (expanding && hop <= maxHops) {
      val candidates = e0.join(frontier, col("src") === col("id"))
        .select(col("dst").as("id")).distinct()
      // first-touch wins: anything already settled keeps its earlier
      // (by construction smaller) distance
      // LAZY checkpoint + count(): the emptiness probe materializes
      // every partition (count touches all of them — unlike isEmpty's
      // limit-1, which would checkpoint only the partitions it reads
      // and leave truncated lineage behind the rest) — so each round
      // runs ONE job where eager-checkpoint-then-probe ran two
      val newly = candidates.join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(hop.toLong).as("dist"))
        .localCheckpoint(false)
      if (newly.count() == 0L) expanding = false
      else {
        parts = newly :: parts
        frontier = newly.select("id")
        hop += 1
      }
    }
    dist
  }

  /** Per-seed BFS distances: like [[hopDistances]] but state is keyed on
    * (node, seed), so every node learns its hop distance to EACH seed
    * individually instead of to the seed set — the input centrality
    * estimators (harmonic/closeness sampled over k pivots) need. Same
    * frontier discipline: per-(id, seed) first-touch wins, each settled
    * row materialized once in a per-hop checkpointed frontier; state is
    * at most |V|·k rows, so k bounds memory the way maxHops bounds
    * rounds.
    */
  def seededHopDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, idCol: String, seedCol: String,
      maxHops: Int): DataFrame = {
    // same iteration-width edge layout as [[hopDistances]]
    val e0 = graft.CacheScope.persisted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
        .repartition(graft.Par.iterationWidth(edges.sparkSession),
          col("src")))
    var parts = List(
      sources.select(col(idCol).as("id"), col(seedCol).as("seed"),
        lit(0L).as("dist")).distinct().localCheckpoint(true))
    def dist = parts.reduce(_ unionAll _)
    var frontier = parts.head.select("id", "seed")
    var hop = 1
    var expanding = true
    while (expanding && hop <= maxHops) {
      val candidates = e0.join(frontier, col("src") === col("id"))
        .select(col("dst").as("id"), col("seed")).distinct()
      // lazy checkpoint + count: one job per round (see hopDistances)
      val newly = candidates.join(dist, Seq("id", "seed"), "left_anti")
        .select(col("id"), col("seed"), lit(hop.toLong).as("dist"))
        .localCheckpoint(false)
      if (newly.count() == 0L) expanding = false
      else {
        parts = newly :: parts
        frontier = newly.select("id", "seed")
        hop += 1
      }
    }
    dist
  }

  /** Bounded-round Bellman–Ford over POSITIVE integer edge weights:
    * `rounds` synchronous min-plus relaxations from the source set.
    * Dijkstra's priority queue is inherently sequential — the honest
    * distributed form is the Pregel relaxation round (one equality join
    * dist⋈edges on the source id, one min-merge), and bounding the round
    * count bounds the path length explored, exactly like [[hopDistances]]
    * bounds hops. Unlike BFS, a settled distance CAN improve in a later
    * round (a longer-but-lighter path), so the whole distance table
    * re-materializes per round — state genuinely changes, the PageRank
    * argument, not the BFS one. Distances are exact BIGINTs: min-plus
    * over integers is associative/commutative with no float anywhere,
    * so any engine and any partitioning agree bit-for-bit. Returns
    * (id, dist) for nodes reachable within `rounds` relaxations.
    */
  def weightedDistances(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, idCol: String,
      rounds: Int): DataFrame = {
    // parallel edges collapse to their lightest weight up front — one
    // bounded groupBy that shrinks every later round's join
    // same iteration-width edge layout as [[hopDistances]]
    val e0 = graft.CacheScope.persisted(
      edges.groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
        .agg(min(col(weightCol)).as("w"))
        .repartition(graft.Par.iterationWidth(edges.sparkSession),
          col("src")))
    var dist = sources.select(col(idCol).as("id"), lit(0L).as("dist"))
      .distinct().localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val relaxed = e0.join(dist, col("src") === col("id"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionAll(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      // the previous round's full distance table is dead once `next`
      // materializes (eager checkpoint; unlike the BFS variants above,
      // nothing unions over old rounds) — free it instead of pinning
      // O(rounds × |V|) blocks until the harness drain
      graft.CacheScope.freeLocalCheckpoint(dist)
      dist = next
    }
    dist
  }
}
