package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Neighborhood-function correctness: the pair-level exact BFS, the
  * MS-BFS bitmask counts (q256's formulation), and the HyperBall HLL
  * estimator are three routes to the same N(r) — proven equal / within
  * sketch tolerance on constructed graphs and the fixture graph.
  */
class NeighborhoodFunctionSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5 plus a disjoint star 10-{11,12,13}, symmetrized
  private def symEdges = {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L))
    (e ++ e.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("exactFromRoots labels each node with its first-reach hop") {
    val got = NeighborhoodFunction
      .exactFromRoots(symEdges, Seq(1L).toDF("root"), 3)
      .as[(Long, Long, Int)].collect()
      .map(t => t._2 -> t._3).toMap
    // from path-end 1: itself at 0, then one new node per hop; the
    // star component is never reached
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("exactFromRoots dedups duplicated root values (no hop-0 inflation)") {
    // later rounds are distinct'd; hop 0 must be too, or a duplicated
    // root seeds two identical rows and N(root, r) over-counts by one
    val got = NeighborhoodFunction
      .exactFromRoots(symEdges, Seq(1L, 1L).toDF("root"), 2)
      .as[(Long, Long, Int)].collect()
    assert(got.length == got.distinct.length, "duplicate (root, node, hop) rows")
    assert(got.count(t => t._3 == 0) == 1, "exactly one hop-0 row for root 1")
  }

  test("multiSourceReachCounts equals the pair-level cumulative counts") {
    val roots = Seq(1L, 10L).toDF("root")
    val bits = Seq((1L, 1L), (10L, 2L)).toDF("id", "mask")
    val got = NeighborhoodFunction.multiSourceReachCounts(symEdges, bits, 3)
      .as[(Int, Long)].collect().toMap
    val pairs = NeighborhoodFunction.exactFromRoots(symEdges, roots, 3)
    val expect = (1 to 3)
      .map(r => r -> pairs.filter(col("hop") <= r).count()).toMap
    assert(got == expect)
    // star root saturates at hop 1 (center + 3 leaves); the path root
    // adds exactly one node per hop
    assert(got(1) == 2 + 4 && got(2) == 3 + 4 && got(3) == 4 + 4)
  }

  test("an ISOLATED root (no edges) still counts its own self-pair — " +
      "both estimators agree") {
    // node 99 appears in rootBits but in no edge: its ball is {99} at
    // every hop. Built from edge endpoints alone, the MS-BFS node set
    // dropped it and the two estimators disagreed by one pair per hop.
    val roots = Seq(1L, 99L).toDF("root")
    val bits = Seq((1L, 1L), (99L, 2L)).toDF("id", "mask")
    val got = NeighborhoodFunction.multiSourceReachCounts(symEdges, bits, 2)
      .as[(Int, Long)].collect().toMap
    val pairs = NeighborhoodFunction.exactFromRoots(symEdges, roots, 2)
    val expect = (1 to 2)
      .map(r => r -> pairs.filter(col("hop") <= r).count()).toMap
    assert(got == expect)
    assert(got(1) == 2 + 1, "path root reaches 2, isolated root itself")
  }

  test("exactFromRoots stops expanding once every ball saturates") {
    // the star root saturates at hop 1; rounds=10 must not change the
    // result (and internally stops launching expansion jobs — the
    // early-exit is observable as identical output)
    val a = NeighborhoodFunction
      .exactFromRoots(symEdges, Seq(10L).toDF("root"), 2)
      .as[(Long, Long, Int)].collect().toSet
    val b = NeighborhoodFunction
      .exactFromRoots(symEdges, Seq(10L).toDF("root"), 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b)
    assert(a.map(_._2) == Set(10L, 11L, 12L, 13L))
  }

  test("directed input keeps sink-only nodes in the node set") {
    // 1→2→3 with NO symmetrization: 3 is a pure sink. Before r10 the
    // node set came from `src` only, so 3 silently vanished from both
    // the bitmask state and the hyperBall output.
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val counts = NeighborhoodFunction.multiSourceReachCounts(
        directed, Seq((1L, 1L)).toDF("id", "mask"), 2)
      .as[(Int, Long)].collect().toMap
    // forward from 1: {1,2} at hop 1, {1,2,3} at hop 2 — the sink counts
    assert(counts == Map(1 -> 2L, 2 -> 3L))
    val est = NeighborhoodFunction.hyperBall(directed, 1)
      .select(col("id"), round(col("est")).cast("long").as("e"))
      .as[(Long, Long)].collect().toMap
    // the sink's ball is {self}; it must appear, not vanish
    assert(est(3L) == 1L && est(2L) == 2L && est(1L) == 2L)
  }

  test("hyperBall estimates are exact on small balls (sparse HLL regime)") {
    val est = NeighborhoodFunction.hyperBall(symEdges, 3)
      .select(col("id"), col("hop"), round(col("est")).cast("long").as("e"))
      .as[(Long, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // path middle: ball(3,1) = {2,3,4}, ball(3,2) = all five, then flat
    assert(est((3L, 1)) == 3 && est((3L, 2)) == 5 && est((3L, 3)) == 5)
    // star: center sees everything at r=1; a leaf needs r=2
    assert(est((10L, 1)) == 4 && est((11L, 2)) == 4)
  }

  test("lastRoundTargets restriction reproduces the targets' estimates") {
    val full = NeighborhoodFunction.hyperBall(symEdges, 3)
      .filter(col("id") === 3L)
      .select(col("hop"), col("est")).as[(Int, Double)].collect().toMap
    val restricted = NeighborhoodFunction.hyperBall(symEdges, 3,
        lastRoundTargets = Some(Seq(3L).toDF("id")))
      .filter(col("id") === 3L)
      .select(col("hop"), col("est")).as[(Int, Double)].collect().toMap
    assert(restricted == full)
  }

  test("hyperBall tracks the exact MS-BFS counts on the fixture graph") {
    val li = graft.Tables.load(spark, sf, "lineitem")
    val ord = graft.Tables.load(spark, sf, "orders")
    val e0 = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val roots = sym.select(col("src")).distinct()
      .filter(col("src") % 200 === 0 && col("src") <= 4000)
      .select(col("src").as("root")).localCheckpoint(true)
    val bits = roots.select(col("root").as("id"),
      expr("shiftleft(1L, cast(root div 200 AS INT) - 1)").as("mask"))
    val exact = NeighborhoodFunction.multiSourceReachCounts(sym, bits, 3)
      .as[(Int, Long)].collect().toMap
    val est = NeighborhoodFunction
      .hyperBall(sym, 3, lastRoundTargets = Some(roots))
      .join(roots.select(col("root").as("id")), "id")
      .groupBy(col("hop")).agg(sum(col("est")).as("s"))
      .as[(Int, Double)].collect().toMap
    (1 to 3).foreach { r =>
      val rel = math.abs(est(r) - exact(r)) / exact(r).toDouble
      assert(rel <= 0.2, s"hop $r: est ${est(r)} vs exact ${exact(r)}")
    }
  }
}
