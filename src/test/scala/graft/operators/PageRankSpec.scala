package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("iteration join reuses the cached src-partitioned weights: no exchange " +
      "or sort above the edge cache scan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val edges = ((2L to 40L).map(i => (1L, i)) ++ (2L to 40L).map(i => (i, i % 7 + 50L)))
      .toDF("src", "dst")
    val (deg, weights) = PageRank.degreeWeighted(
      graft.CacheScope.persisted(edges.distinct()))
    weights.count() // materialize the cache so the layout is in place
    val nodes = deg.select(col("src").as("id"))
    val n = nodes.count()
    var rank = nodes.select(col("id"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    val step = PageRank.iterationStep(weights, nodes, rank, lit(0.15) / n, 0.85)
    step.collect()
    val plan = (step.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the weights side reads straight from the cache: any Exchange or
    // Sort between the contrib join and the InMemoryTableScan would
    // mean the edge table re-shuffles every iteration (the cost this
    // layout exists to amortize)
    val scanIdx = plan.indexOf("InMemoryTableScan")
    assert(scanIdx >= 0, s"no cache scan in plan:\n$plan")
    val joinIdx = plan.indexOf("SortMergeJoin") max plan.indexOf("ShuffledHashJoin")
    if (joinIdx >= 0) {
      val between = plan.substring(joinIdx, scanIdx max joinIdx)
      assert(!between.contains("Exchange hashpartitioning(src"),
        s"edge table re-exchanged inside the iteration join:\n$plan")
    }
    graft.CacheScope.drain(spark)
  }

  test("rank mass is conserved and hubs outrank leaves") {
    // star: hub 1 connected to 2..9, plus a separate edge 10-11
    val edges = ((2L to 9L).map(i => (1L, i)) :+ (10L, 11L)).toDF("src", "dst")
    val r = PageRank.ranks(edges, "src", "dst").cache()
    val total = r.agg(sum($"rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass drifted: $total")
    val byId = r.as[(Long, Double)].collect().toMap
    assert((2L to 9L).forall(byId(1L) > byId(_)), "hub must outrank its leaves")
    // symmetric pair: equal ranks by symmetry
    assert(math.abs(byId(10L) - byId(11L)) < 1e-12)
    r.unpersist()
    graft.CacheScope.drain(spark)
  }

  test("personalized: mass stays near the seeds, unreachable nodes rank 0") {
    // path 1-2-3-4-5 plus a disconnected pair 10-11; seed at node 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("sid")
    val r = PageRank.personalizedRanks(edges, "src", "dst", seeds, "sid",
      iters = 3).as[(Long, Double)].collect().toMap
    assert(r(10L) == 0.0 && r(11L) == 0.0,
      "no path from the seed set => exactly zero rank")
    // every node within `iters` hops carries mass (path-graph ranks
    // OSCILLATE round to round — bipartite parity — so no monotone
    // distance-decay assertion; see the convergence-test note in
    // [[PageRank]])
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) > 0.0), s"reachable mass: $r")
    assert(r(5L) == 0.0, "beyond iters hops is still untouched at 3 rounds")
    // restart mass bounds total mass by 1
    assert(r.values.sum <= 1.0 + 1e-9)
    graft.CacheScope.drain(spark)
  }

  test("degree path is a map-combinable aggregate — no Window over the edge table") {
    // r07 finding: Window.partitionBy(src) over raw edges funnels every
    // edge of a power-law hub into one task. The degree must stay a
    // partial-aggregating groupBy joined back; this pins the plan so the
    // window form cannot silently return in any variant (all three
    // route through PageRank.weighted).
    val edges = (1L to 500L).map(i => (i % 37, i % 23)).toDF("src", "dst")
    val w = PageRank.weighted(edges)
    val optimized = w.queryExecution.optimizedPlan
    val windows = optimized.collect {
      case n: org.apache.spark.sql.catalyst.plans.logical.Window => n
    }
    assert(windows.isEmpty, s"edge-keyed window funnel reintroduced:\n$optimized")
    val aggs = optimized.collect {
      case n: org.apache.spark.sql.catalyst.plans.logical.Aggregate => n
    }
    assert(aggs.nonEmpty, "degree must come from an aggregate")
    // and the physical aggregate is partial (combines before the shuffle)
    val phys = w.queryExecution.executedPlan.toString
    assert(phys.contains("HashAggregate"), s"expected hash aggregate:\n$phys")
    graft.CacheScope.drain(spark)
  }

  test("result is independent of partitioning") {
    val edges = (1L to 200L).map(i => (i % 37, i % 23)).toDF("src", "dst")
    val a = PageRank.ranks(edges, "src", "dst")
      .as[(Long, Double)].collect().toMap
    val b = PageRank.ranks(edges.repartition(13), "src", "dst")
      .as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    // identical join/agg plans over the same data: values match to
    // double noise regardless of input partitioning
    assert(a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 })
    graft.CacheScope.drain(spark)
  }

  test("directed variant conserves mass despite sinks; sinks still rank") {
    // pure star: 1 -> {2..9}; every leaf is a dangling sink
    val edges = (2L to 9L).map(i => (1L, i)).toDF("src", "dst")
    val r = PageRank.ranksDirected(edges, "src", "dst").cache()
    val total = r.agg(sum($"rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9,
      s"dangling redistribution must conserve mass: $total")
    val byId = r.as[(Long, Double)].collect().toMap
    assert(byId.size == 9)
    assert(byId.values.forall(_ > 0))
    // all leaves are symmetric — identical rank
    assert((3L to 9L).forall(i => math.abs(byId(i) - byId(2L)) < 1e-12))
    r.unpersist()
    graft.CacheScope.drain(spark)
  }

  test("more iterations move toward the fixpoint, never away") {
    // the (2,3) edge breaks bipartiteness — a pure star oscillates with
    // period 2 under power iteration (λ = −1 eigenvalue), which would
    // make adjacent-iteration deltas misleading
    val edges = ((2L to 9L).map(i => (1L, i)) ++ Seq((9L, 10L), (2L, 3L)))
      .toDF("src", "dst")
    def at(k: Int) = PageRank.ranks(edges, "src", "dst", iters = k)
      .as[(Long, Double)].collect().toMap
    val (r3, r5, r9, r11) = (at(3), at(5), at(9), at(11))
    val dLate = r9.map { case (k, v) => math.abs(v - r11(k)) }.max
    val dEarly = r3.map { case (k, v) => math.abs(v - r5(k)) }.max
    assert(dLate < dEarly, "two-step delta must shrink as iterations grow")
    assert(dLate < 1e-2, s"near fixpoint after 9 rounds, delta=$dLate")
    graft.CacheScope.drain(spark)
  }
}
