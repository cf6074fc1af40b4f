package graft.operators

import graft.SparkSpec

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  // path 1→2→3→4→5 plus a shortcut 1→4: BFS must prefer the 1-hop
  // shortcut (dist(4)=1, dist(5)=2), not the 3-hop path
  test("first discovery wins over longer paths") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("s", "t")
    val sources = Seq(1L).toDF("id")
    val got = ShortestPaths.hopDistances(edges, "s", "t", sources, "id", 10)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 2L)))
  }

  test("maxHops truncates, multi-source takes the nearer seed, and " +
      "unreachable/isolated nodes behave") {
    // two chains from two seeds; node 30 is 1 hop from seed 20 and 3
    // from seed 1; node 99 unreachable; seed 50 isolated (no edges)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 30L), (20L, 30L), (98L, 99L))
      .toDF("s", "t")
    val sources = Seq(1L, 20L, 50L).toDF("id")
    val got = ShortestPaths.hopDistances(edges, "s", "t", sources, "id", 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // maxHops=2: node 3 reached at 2; node 30 at 1 via seed 20; 99 never
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (20L, 0L), (30L, 1L),
      (50L, 0L)))
  }

  test("direction is respected on a directed edge set") {
    val edges = Seq((2L, 1L), (2L, 3L)).toDF("s", "t")
    val got = ShortestPaths.hopDistances(edges, "s", "t",
        Seq(1L).toDF("id"), "id", 5)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L))) // no out-edges from 1: nothing reached
  }

  test("weighted: lighter two-hop beats heavier direct edge; rounds truncate") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5; parallel 1→2 edges collapse
    // to the lighter one; 3→4 only reachable with enough rounds
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (1L, 2L, 7L), (2L, 3L, 3L),
      (3L, 4L, 1L)).toDF("s", "t", "w")
    val src = Seq(1L).toDF("id")
    def run(r: Int) = ShortestPaths.weightedDistances(
      edges, "s", "t", "w", src, "id", r).as[(Long, Long)].collect().toMap
    val d1 = run(1)
    assert(d1 == Map(1L -> 0L, 2L -> 2L, 3L -> 10L),
      s"one relaxation sees only direct edges: $d1")
    val d3 = run(3)
    assert(d3 == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L),
      s"the 2-hop path must displace the heavier direct edge: $d3")
    // layout-independence (exact integers: bitwise equal maps)
    val again = ShortestPaths.weightedDistances(edges.repartition(7),
      "s", "t", "w", src, "id", 3).as[(Long, Long)].collect().toMap
    assert(again == d3)
    graft.CacheScope.drain(spark)
  }
}
