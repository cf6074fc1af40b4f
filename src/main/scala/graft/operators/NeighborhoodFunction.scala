package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood function N(r) — how many nodes are reachable within r
  * hops — and the effective-radius / graph-diameter statistics it
  * carries (Palmer et al. 2002 "ANF"; Boldi & Vigna 2011 "HyperBall").
  * In corpus curation this is the connectivity audit over a similarity
  * or link graph: a near-dup graph whose N(r) explodes by r=2 is
  * over-merged, and a crawl graph's effective diameter decides frontier
  * scheduling depth.
  *
  * Two formulations, both iterative join+aggregate rounds (never an
  * all-pairs materialization):
  *
  *  - [[exactFromRoots]]: EXACT reachability from a bounded ROOT SAMPLE.
  *    The (root, node) pair table is bounded by |roots| × |V|, so the
  *    sample size — not the graph — caps the shuffle; this is the
  *    estimator you can afford exactly, and the oracle-checkable one
  *    (the sampled-source N(r) estimator of the ANF paper §3).
  *  - [[hyperBall]]: per-node mergeable HLL sketches over the WHOLE
  *    graph — sketch(v, r) = ⋃ of sketch(w, r−1) over v's
  *    OUT-neighbors w, plus v's own — one equality join and one
  *    `hll_union_agg` per round, state O(|V| · 2^lgConfigK) bytes.
  *    This is the 100 TB shape: every node's N(r) in r rounds, no pair
  *    table at all.
  *
  * All three compute FORWARD reachability (the ball of nodes reachable
  * from v along edge direction), so their counts agree with each other
  * on any input; on a symmetrized graph forward = backward.
  *
  * Both settle via per-round `localCheckpoint` (the PageRank/
  * ConnectedComponents convention) so round k's plan doesn't nest
  * round k−1's.
  */
object NeighborhoodFunction {

  /** Exact (root, node, hop) first-reach table for `rounds` hops from
    * `roots` (single column `root`) over directed edges (src, dst).
    * hop = the FIRST round each node entered the root's ball (root
    * itself at hop 0); N(root, r) = count of rows with hop ≤ r. The
    * frontier is anti-joined against the settled set each round, so a
    * node is carried once per root, never once per path.
    */
  def exactFromRoots(edges: DataFrame, roots: DataFrame,
      rounds: Int): DataFrame = {
    // the edge table is hash-partitioned AND sorted by `src` BEFORE the
    // persist (the PageRank degreeWeighted layout): across `rounds`
    // expansion joins the edges never exchange or sort again — only the
    // (sample-bounded) frontier shuffles each round
    val sym = graft.CacheScope.persisted(
      edges.select(col("src"), col("dst"))
        // width sized for the iteration rounds
        // ([[graft.Par.iterationWidth]]): every round's expansion join
        // runs exactly as wide as this cached layout
        .repartition(graft.Par.iterationWidth(edges.sparkSession),
          col("src"))
        .sortWithinPartitions("src"))
    var settled = graft.CacheScope.persisted(
      // distinct: a duplicated root value would seed two identical
      // hop-0 rows (later rounds dedup, hop 0 would not), inflating
      // N(root, r) for that root — same guard ShortestPaths puts on
      // its sources
      roots.select(col("root"), col("root").as("node"),
        lit(0).as("hop")).distinct())
    var frontier = settled
    var r = 1
    var saturated = false
    while (r <= rounds && !saturated) {
      // aliases, not df("col") references: the first frontier (the
      // caller's roots) often DERIVES from the edge table, and an
      // unaliased self-join is ambiguous there
      val next = frontier.as("f").join(sym.as("e"),
          col("f.node") === col("e.src"))
        .select(col("f.root").as("root"), col("e.dst").as("node"))
        .distinct()
        .join(settled, Seq("root", "node"), "left_anti")
        .withColumn("hop", lit(r))
        .localCheckpoint(true)
      // STOP once the frontier empties (every ball saturated): each
      // further round would launch an expansion join + eager
      // checkpoint job over an empty frontier — per-round fixed cost
      // for provably nothing (the BFS discipline ShortestPaths
      // follows). isEmpty reads the just-materialized blocks, not a
      // recompute.
      if (next.isEmpty) {
        saturated = true
        graft.CacheScope.freeLocalCheckpoint(next)
      } else {
        // settled stays a plain union of the per-round checkpointed
        // frontiers — no extra eager materialization job per round;
        // the next anti-join just reads ≤ r small materialized tables
        settled = settled.union(next)
        frontier = next
      }
      r += 1
    }
    settled
  }

  /** Multi-source BFS reach COUNTS via bitmasks (the MS-BFS idea, Then
    * et al. VLDB 2014): with ≤ 64 roots, each node carries one BIGINT
    * whose bit b is set once root b has reached it; a round is
    *
    *   mask(v) |= OR over in-neighbors u of mask(u)
    *
    * — an edge join plus a map-combinable `bit_or` aggregate. No
    * (root, node) pair table ever exists: state is |V| longs, per-round
    * traffic is |E| longs (combined map-side), and the per-hop
    * N(r) = Σ_v popcount(mask_r(v)) falls out of a one-row sum. This is
    * the exact-counting shape that [[hyperBall]] generalizes (HLL
    * sketches instead of bitmasks when the source set is unbounded).
    *
    * `rootBits` is (id, mask) with each root's single-bit mask assigned
    * DETERMINISTICALLY by the caller (all masks must be distinct single
    * bits; ≥ 65 roots needs multiple passes). Returns (hop,
    * reached_pairs) for hop = 1..rounds, counting (root, node) pairs
    * with dist ≤ hop — root itself included, saturation repeats the
    * count.
    */
  def multiSourceReachCounts(edges: DataFrame, rootBits: DataFrame,
      rounds: Int): DataFrame = {
    val sym = graft.CacheScope.persisted(
      edges.select(col("src"), col("dst"))
        // width sized for the iteration rounds
        // ([[graft.Par.iterationWidth]]): every round's expansion join
        // runs exactly as wide as this cached layout
        .repartition(graft.Par.iterationWidth(edges.sparkSession),
          col("src"))
        .sortWithinPartitions("src"))
    // BOTH endpoints PLUS the roots themselves: on a directed edge set
    // a sink-only node still counts toward every root's ball (src-only
    // dropped it silently), and an ISOLATED root — present in rootBits
    // but in no edge — still owns its (root, root) self-pair at every
    // hop, exactly as [[exactFromRoots]] emits it; building the node
    // set from edges alone made the two estimators disagree by the
    // isolated-root count
    val nodes = sym.select(col("src").as("id"))
      .union(sym.select(col("dst").as("id")))
      .union(rootBits.select(col("id"))).distinct()
    var mask = nodes
      .join(rootBits.select(col("id"), col("mask").as("__rb")), Seq("id"),
        "left")
      .select(col("id"), coalesce(col("__rb"), lit(0L)).as("mask"))
      .localCheckpoint(true)
    val perRound = (1 to rounds).map { r =>
      val contrib = sym.as("e").join(mask.as("m"),
          col("e.src") === col("m.id"))
        .groupBy(col("e.dst").as("id"))
        .agg(expr("bit_or(mask)").as("c"))
      mask = mask.as("m").join(contrib.as("c"), Seq("id"), "left")
        .select(col("id"),
          col("m.mask").bitwiseOR(coalesce(col("c.c"), lit(0L))).as("mask"))
        .localCheckpoint(true)
      mask.agg(sum(expr("bit_count(mask)")).cast("bigint")
          .as("reached_pairs"))
        .select(lit(r).as("hop"), col("reached_pairs"))
    }
    perRound.reduce(_.unionByName(_))
  }

  /** HyperBall ball-size estimates for `rounds` rounds: returns
    * (id, hop, est) — the HLL estimate of |ball(id, hop)| for EVERY
    * node and every round 1..`rounds`, built with Spark's mergeable
    * `hll_sketch_agg`/`hll_union_agg` (Datasketches HLL), lgConfigK
    * registers per node. Each round's sketch table is localCheckpointed,
    * so the returned union reads materialized blocks — one action
    * downstream evaluates all rounds without recomputing any.
    */
  def hyperBall(edges: DataFrame, rounds: Int, lgConfigK: Int = 8,
      lastRoundTargets: Option[DataFrame] = None): DataFrame = {
    // partitioned+sorted by `dst` — the sketch join key here — so the
    // per-round join only shuffles the (node-sized) sketch table, never
    // the edges
    val sym = graft.CacheScope.persisted(
      edges.select(col("src"), col("dst"))
        .repartition(col("dst")).sortWithinPartitions("dst"))
    // both endpoints, as in [[multiSourceReachCounts]]: a sink-only
    // node's ball is {self} and must appear in the output on directed
    // input rather than vanish
    val nodes = sym.select(col("src").as("id"))
      .union(sym.select(col("dst").as("id"))).distinct()
    var sk = nodes
      .groupBy("id").agg(hll_sketch_agg(col("id"), lit(lgConfigK)).as("sketch"))
      .localCheckpoint(true)
    val perRound = (1 to rounds).map { r =>
      // when the CALLER only audits a bounded target set, the final
      // round — the one whose sketches are densest — needs to union
      // only into those targets: filter the edge side (and the
      // own-sketch side) by a broadcast of the target ids. Earlier
      // rounds stay whole-graph (a target's ball at r needs every
      // in-neighbor's full sketch at r−1).
      val restrict = lastRoundTargets.filter(_ => r == rounds)
      val (symR, ownR) = restrict match {
        case Some(tg) =>
          val keys = broadcast(tg.select(col(tg.columns.head).as("__t")))
          (sym.join(keys, sym("src") === col("__t")).drop("__t"),
            sk.join(keys, sk("id") === col("__t")).drop("__t"))
        case None => (sym, sk)
      }
      val nbr = symR.as("e").join(sk.as("k"), col("e.dst") === col("k.id"))
        .select(col("e.src").as("id"), col("k.sketch").as("sketch"))
      sk = nbr.union(ownR.select(col("id"), col("sketch")))
        .groupBy("id").agg(hll_union_agg(col("sketch")).as("sketch"))
        .localCheckpoint(true)
      sk.select(col("id"), lit(r).as("hop"),
        hll_sketch_estimate(col("sketch")).as("est"))
    }
    perRound.reduce(_.unionByName(_))
  }
}
