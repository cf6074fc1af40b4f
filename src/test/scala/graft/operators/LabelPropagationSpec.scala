package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  test("two cliques joined by one bridge edge settle into two communities") {
    // K4 on {1..4}, K4 on {11..14}, bridge 4—11
    def clique(ns: Seq[Long]) = for (i <- ns; j <- ns if i < j) yield (i, j)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ (4L, 11L)).toDF("a", "b")
    val got = LabelPropagation.labels(edges, "a", "b", iters = 4)
      .as[(Long, Long)].collect().toMap
    // every clique member lands on its clique's consensus label, and the
    // two cliques keep distinct labels
    val left = Set(1L, 2L, 3L, 4L).map(got)
    val right = Set(11L, 12L, 13L, 14L).map(got)
    assert(left.size == 1 && right.size == 1 && left != right)
  }

  test("synchronous rounds with smallest-label tie-break are deterministic") {
    // triangle {1,2,3}: after round 1 every node holds the smallest
    // neighbor label; repeated runs agree exactly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val a = LabelPropagation.labels(edges, "a", "b", 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = LabelPropagation.labels(edges, "a", "b", 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == Seq((1L, 2L), (2L, 1L), (3L, 1L)) && a == b)
  }

  test("duplicate/reversed/self-loop edges do not distort the vote") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L))
      .toDF("a", "b")
    // node 2's neighbors are {1, 3}: one vote each, tie → smaller label 1
    val got = LabelPropagation.labels(edges, "a", "b", 1)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) == 1L)
  }
}
