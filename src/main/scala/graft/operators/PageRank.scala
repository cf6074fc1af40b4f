package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PageRank by power iteration — the canonical iterative
  * join-aggregate graph computation (Page et al. 1999; the MapReduce
  * formulation is Dean & Ghemawat's original motivating example). Used
  * in data curation to rank documents/hosts by link authority (e.g.
  * harvesting seed lists for a crawl corpus).
  *
  * Each iteration is one equality join (rank onto out-edges) and one
  * map-combinable sum by destination — both plain hash shuffles on node
  * id, the shape that scales out linearly; no adjacency list is ever
  * collected per node, so hub nodes with millions of edges stay
  * aggregate rows, not OOMs. A FIXED iteration count keeps the result
  * deterministic and cross-engine checkable (convergence-threshold
  * stopping would couple the result to float noise).
  *
  * The edge set is symmetrized (u→v ⇒ v→u), which removes dangling
  * nodes by construction — every node that appears has out-degree ≥ 1,
  * so no rank mass leaks and the total stays 1 without the dangling
  * redistribution term (the variant to add when feeding a genuinely
  * directed graph).
  */
object PageRank {

  /** Out-degree per source: a partial-aggregating groupBy, the scale-safe
    * degree computation (hub edges combine map-side; the shuffle carries
    * one row per node, not one per edge). Shared by all three variants.
    */
  private def outDegrees(e: DataFrame): DataFrame =
    e.groupBy("src").agg(count(lit(1)).as("outdeg"))

  /** (src, dst, outdeg) weight table: the degree AGGREGATE joined back
    * onto the edges — exposed package-private so the plan-shape spec can
    * pin that no Window over the edge table ever reappears here (the
    * hub-key window funnel this replaced).
    */
  private[graft] def weighted(e: DataFrame): DataFrame =
    e.join(outDegrees(e), "src")

  /** Persisted (degree, weights) pair shared by every variant's
    * iteration loop. The edge side is hash-partitioned AND sorted by
    * `src` BEFORE the persist, so the per-iteration `src === id` join
    * reuses the cached layout: across `iters` rounds the edge table
    * never exchanges or sorts again — only the node-sized rank table
    * shuffles each round. (A hot hub key does concentrate its edges in
    * one cached partition, but unlike the window funnel this replaced
    * nothing buffers per key — the merge join streams the edge side and
    * the rank side carries one row per key — so the cost is task-length
    * imbalance bounded by max-degree, which amortizes over the
    * partition count at scale, not memory.)
    */
  private[graft] def degreeWeighted(e: DataFrame): (DataFrame, DataFrame) = {
    val deg = graft.CacheScope.persisted(outDegrees(e))
    // the cached layout is sized to CORES, not to the session reducer
    // count: every iteration's rank⋈weights merge join and its map-side
    // contribution combine inherit this width (the rank side exchanges
    // to match), and those are the CPU-bound stages of the whole
    // operator — at a narrow session default (the bench runs 8 data-
    // sized reducers) the iterations would run 8-wide on a 32-core box,
    // so any per-cycle slowdown of the environment multiplies straight
    // into wall time (r10 driver: 90.8 task-CPU-s at 8-wide = 41 s
    // wall). Node-sized final aggregates stay at the session default.
    // the degree side is repartitioned to the SAME explicit width, or
    // the planner co-partitions both sides of the degree join at the
    // session reducer count and the core-count layout above silently
    // collapses (measured: weights.rdd.getNumPartitions was 8 despite
    // repartition(32, src) with an unhinted join). With both sides at
    // `width` the explicit layout survives either plan the stats pick:
    // a size-based broadcast of deg at small scale preserves the
    // streamed side's layout, and at real scale — where the node-sized
    // degree table can exceed any broadcast limit — the co-partitioned
    // merge join needs no broadcast at all (no broadcast() hint here on
    // purpose: deg is unbounded).
    val width = graft.Par.iterationWidth(e.sparkSession)
    val weights = graft.CacheScope.persisted(
      e.repartition(width, col("src")).sortWithinPartitions("src")
        .join(deg.repartition(width, col("src")), "src"))
    (deg, weights)
  }

  /** One power-iteration update (pre-checkpoint): contributions flow
    * src→dst scaled by 1/outdeg, then every node takes base + damped
    * inbound mass. Package-private so the plan-shape spec can pin that
    * the persisted weight table's cached (src-partitioned, src-sorted)
    * layout is REUSED — no exchange and no sort above the edge table's
    * cache scan inside the per-round join.
    */
  private[graft] def iterationStep(weights: DataFrame, nodes: DataFrame,
      rank: DataFrame, base: Column, damping: Double): DataFrame = {
    val contrib = weights
      .join(rank, col("src") === col("id"))
      .groupBy(col("dst"))
      .agg(sum(col("rank") / col("outdeg")).as("c"))
    nodes.join(contrib, col("id") === col("dst"), "left")
      .select(col("id"),
        (base + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
  }

  /** Ranks after `iters` power iterations over the symmetrized edge set
    * of `edges` (two string/long columns). Returns (id, rank) — rank is
    * a raw double; callers round for presentation.
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    // dedupe BEFORE symmetrizing, and persist the deduped set: the
    // upstream pair pipeline (often a join) would otherwise run once per
    // union branch, and the post-union distinct would shuffle the raw
    // edge multiplicity instead of the (usually far smaller) edge set
    val e0 = graft.CacheScope.persisted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    // sym now has TWO consumers (the degree aggregate and the join side
    // of weighted) — persist it so the union+distinct shuffle runs once
    val sym = graft.CacheScope.persisted(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    // (src, dst, outdeg): rank flows src→dst scaled by 1/outdeg(src).
    // The out-degree is a map-combinable groupBy(src).count() joined
    // back — NEVER a Window.partitionBy(src) over the edge table: a
    // window hash-shuffles EVERY edge of a hub into one task and
    // buffers the whole partition, the classic power-law straggler/OOM.
    // The aggregate combines per-task before its (node-sized) shuffle.
    val (deg, weights) = degreeWeighted(sym)
    // symmetrized graph ⇒ every node is a source, so the degree table's
    // keys ARE the node set — already distinct, already cached; no
    // edge-sized distinct job
    val nodes = deg.select(col("src").as("id"))
    // one bounded driver scalar (like the watermark read) — N appears as
    // a literal in every iteration's plan
    val n = nodes.count()
    // e0 and sym are dead once weights materializes (deg already
    // materialized under the count above): force the weight cache now
    // and return both edge-sized caches before the iterations, instead
    // of holding three edge-scale datasets through every round
    weights.count()
    e0.unpersist(blocking = false)
    sym.unpersist(blocking = false)
    val base = lit(1.0 - damping) / lit(n.toDouble)
    var rank = nodes.select(col("id"), (lit(1.0) / lit(n.toDouble)).as("rank"))
    (1 to iters).foreach { _ =>
      // symmetric graph ⇒ every node receives mass; left join + coalesce
      // keeps the operator correct for general edge sets anyway.
      // localCheckpoint (eager, node-sized) truncates the lineage so
      // each round optimizes and codegens a ONE-round plan — without it
      // the final plan nests every previous round and Catalyst +
      // codegen compile time grows superlinearly in `iters` (the same
      // per-round materialization ConnectedComponents uses; on a real
      // cluster with lossy executors, set a checkpoint dir and swap in
      // checkpoint()).
      val next = iterationStep(weights, nodes, rank, base, damping)
        .localCheckpoint(true)
      // the eager checkpoint above has fully materialized `next`, so
      // the previous round's snapshot blocks are dead — free them NOW
      // (Dataset.unpersist cannot: checkpoint blocks bypass the
      // CacheManager) instead of pinning O(iters × |nodes|) storage
      // until the harness drain. Round 0's rank is a plain plan with
      // no checkpoint RDD, where this is a no-op.
      graft.CacheScope.freeLocalCheckpoint(rank)
      rank = next
    }
    rank
  }

  /** PageRank over a GENUINELY DIRECTED edge set: no symmetrization, so
    * sink nodes (no out-edges) are dangling and their rank mass must be
    * redistributed uniformly each round — the standard dangling-node
    * correction, without which total rank leaks and the ordering
    * drifts. The per-round dangling mass is a one-row aggregate over
    * the node-sized rank table (a scalar subquery in the update plan,
    * never a driver loop); everything else is [[ranks]]'s join+agg
    * round over the same pre-partitioned out-edge table.
    */
  def ranksDirected(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e0 = graft.CacheScope.persisted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val (deg, weights) = degreeWeighted(e0)
    // the node table CARRIES the dangling flag (has_out = ever a
    // source), so the per-iteration dangling mass is a filtered scan of
    // the checkpointed rank table — never a rank ⋈ dangling shuffle
    // join per round (the r9-flagged shape). The degree table's keys
    // are the distinct sources, so the flag costs a node-sized left
    // join once, not a second edge-sized distinct job.
    val nodes = graft.CacheScope.persisted(
      e0.select(col("src").as("id"))
        .union(e0.select(col("dst").as("id"))).distinct()
        .join(deg.select(col("src").as("id"), lit(true).as("has_out")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("has_out"), lit(false)).as("has_out")))
    val n = nodes.count()
    // e0 feeds nothing past this point once weights materializes —
    // force it now (one cached-layout pass the first iteration would
    // have paid anyway) and return the edge-sized distinct cache, so
    // the iterations run against the minimal storage footprint (the
    // r9 spike-mode suspect was storage pressure on exactly these
    // blocks mid-suite)
    weights.count()
    e0.unpersist(blocking = false)
    val base = lit(1.0 - damping) / lit(n.toDouble)
    var rank = nodes.select(col("id"), col("has_out"),
      (lit(1.0) / lit(n.toDouble)).as("rank"))
    (1 to iters).foreach { _ =>
      // the dangling mass rides the SAME job as the rank update: a
      // 1-row aggregate over the checkpointed rank table's dangling
      // rows, broadcast into the update plan — not a blocking driver
      // `.scalar()`, which costs an extra driver round-trip per
      // iteration (measured: q96's r07 regression). The broadcast side
      // is one row; the rank blocks it reads are the localCheckpoint
      // from the previous round, so nothing recomputes.
      val danglingMass = rank.filter(!col("has_out"))
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dmass"))
      val contrib = weights
        .join(rank.select(col("id"), col("rank")), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      val next = nodes.join(contrib, col("id") === col("dst"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(col("id"), col("has_out"),
          (base + lit(damping) * (coalesce(col("c"), lit(0.0)) +
            col("__dmass") / lit(n.toDouble))).as("rank"))
        .localCheckpoint(true)
      // previous round's checkpoint blocks are dead once `next` is
      // eagerly materialized (see ranks) — free, don't pin all rounds
      graft.CacheScope.freeLocalCheckpoint(rank)
      rank = next
    }
    rank.select(col("id"), col("rank"))
  }

  /** Personalized PageRank: teleport restarts land on the SEED set
    * instead of uniformly, so rank becomes proximity-to-the-seeds — the
    * relevance score behind graph-based recommendation and "expand this
    * cohort" feature pipelines (Page et al. 1999 §6 personalized
    * vectors). Same per-round shape as [[ranks]] (one rank join + one
    * map-combinable sum over the pre-partitioned weight table, per-round
    * localCheckpoint); the only new state is a persisted node-sized seed
    * flag, and the one extra driver scalar is the seed count. Nodes
    * unreached within `iters` hops hold rank exactly 0.0 on any engine.
    */
  def personalizedRanks(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val e0 = graft.CacheScope.persisted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val sym = graft.CacheScope.persisted(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    val (deg, weights) = degreeWeighted(sym)
    val nodes = deg.select(col("src").as("id"))
    val sd = seeds.select(col(seedCol).as("id")).distinct()
    val seedFlag = graft.CacheScope.persisted(
      nodes.join(sd.withColumn("is_seed", lit(true)), Seq("id"), "left")
        .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed")))
    // bounded driver scalar: seeds PRESENT IN THE GRAPH (restart mass
    // must sum to 1 over reachable restarts)
    val nSeeds = seedFlag.filter(col("is_seed")).count()
    require(nSeeds > 0, "no seed appears in the graph")
    // same eager release as [[ranks]]: the edge-sized e0/sym caches are
    // dead once the weight table materializes
    weights.count()
    e0.unpersist(blocking = false)
    sym.unpersist(blocking = false)
    val base = when(col("is_seed"), lit((1.0 - damping) / nSeeds))
      .otherwise(lit(0.0))
    var rank = seedFlag.select(col("id"),
      when(col("is_seed"), lit(1.0 / nSeeds)).otherwise(lit(0.0)).as("rank"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val next = iterationStep(weights, seedFlag, rank, base, damping)
        .localCheckpoint(true)
      // previous round's checkpoint blocks are dead once `next` is
      // eagerly materialized (see ranks) — free, don't pin all rounds
      graft.CacheScope.freeLocalCheckpoint(rank)
      rank = next
    }
    rank
  }
}
