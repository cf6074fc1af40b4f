package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("3-core keeps K4, peels pendant chains and triangles") {
    // K4 on {1,2,3,4} (every node degree 3) + a chain 4-5-6 + a triangle
    // {7,8,9} hanging off node 1. The chain dies in round 1 (deg 1),
    // node 5 in round 2; the triangle's nodes have degree 2 < 3 and die
    // too (even 7, whose link to node 1 gives it 3 edges, loses them as
    // 8 and 9 peel).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (1L, 7L), (7L, 8L), (7L, 9L), (8L, 9L)).toDF("a", "b")
    val got = KCore.core(edges, "a", "b", k = 3, rounds = 6)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      s"only K4 survives the 3-core, each with degree 3: $got")
  }

  test("k=1 with ample rounds is the whole graph minus self-loops/dups") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L)).toDF("a", "b")
    val got = KCore.core(edges, "a", "b", k = 1, rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("full peel-out: k above every degree empties the core") {
    // the edge set hits the EMPTY fixpoint in round 1; the stable-count
    // early exit must then stop (count 0 == 0) and return no rows, not
    // loop or resurrect anything
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val got = KCore.core(edges, "a", "b", k = 5, rounds = 6)
      .as[(Long, Long)].collect()
    assert(got.isEmpty)
  }

  test("extra rounds past the fixpoint are no-ops (oracle-unroll safety)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r2 = KCore.core(edges, "a", "b", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toSet
    val r6 = KCore.core(edges, "a", "b", k = 2, rounds = 6)
      .as[(Long, Long)].collect().toSet
    assert(r2 == r6 && r2.map(_._1) == Set(1L, 2L, 3L))
  }
}
