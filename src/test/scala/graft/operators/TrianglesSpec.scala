package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("counts each triangle once per member node on a known graph") {
    // two triangles sharing node 3: {1,2,3} and {3,4,5}; a pendant 5-6
    // edge; a duplicate and a reversed and a self-loop edge to exercise
    // canonicalization
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (5L, 6L), (2L, 1L), (1L, 2L), (4L, 4L)).toDF("a", "b")
    val got = Triangles.perNodeCounts(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 1L)))
  }

  test("triangle-free graphs (bipartite, tree, empty) yield no rows") {
    val bipartite = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("a", "b")
    assert(Triangles.perNodeCounts(bipartite, "a", "b").count() == 0)
    val tree = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("a", "b")
    assert(Triangles.perNodeCounts(tree, "a", "b").count() == 0)
  }

  test("complete graph K5: every node is in C(4,2) = 6 triangles") {
    val edges = (for (i <- 1 to 5; j <- 1 to 5 if i < j) yield
      (i.toLong, j.toLong)).toDF("a", "b")
    val got = Triangles.perNodeCounts(edges, "a", "b")
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 5 && got.forall(_._2 == 6L))
  }
}
