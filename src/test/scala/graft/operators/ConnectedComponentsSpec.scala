package graft.operators

import scala.util.Random

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find for the oracle side of the property test. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("non-convergence within maxIters fails LOUDLY, never a partial answer") {
    // past maxIters the edge set is an intermediate re-pointing: nodes
    // of one true component would receive different ids with no
    // signal. A chain needs ≥2 rounds; maxIters=1 must throw.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.components(chain, "a", "b", maxIters = 1)
        .collect()
    }
    ()
  }

  test("chain, triangle, self-loop, reversed duplicates") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), // triangle
      (10L, 11L), (11L, 12L), (12L, 13L),         // chain
      (20L, 20L),                                 // self-loop only
      (30L, 31L), (31L, 30L))                     // reversed dup
    val got = run(edges)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(13L) == 10L)
    assert(got(20L) == 20L) // self-loop node is its own component
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("long path converges (stresses the O(log n) rounds)") {
    val edges = (0 until 64).map(i => (i.toLong, i + 1L))
    val got = run(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 65)
  }

  test("property: matches union-find on random graphs") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val n = 60
      val edges = Seq.fill(50)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = unionFind(n, edges)
      val got = run(edges)
      assert(got == expected, s"seed=$seed")
    }
  }

  test("deterministic across reruns and partitioning") {
    val rnd = new Random(7)
    val edges = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val a = run(edges)
    val b = ConnectedComponents
      .components(edges.toDF("a", "b").repartition(13), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
