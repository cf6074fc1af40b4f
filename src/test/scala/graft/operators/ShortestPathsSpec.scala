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
}
