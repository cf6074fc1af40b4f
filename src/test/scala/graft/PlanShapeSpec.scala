package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan regression tests: the properties that make these queries
  * scale (pushdown reaching the parquet scan, dimension joins broadcast,
  * no redundant exchanges) are asserted so a refactor can't silently
  * regress them. These are the checks `.explain` review would do by eye.
  */
class PlanShapeSpec extends SparkSpec {

  /** Final AQE plan as text (string-matching descends through query
    * stages, which TreeNode.children does not).
    */
  private def executed(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    p.toString
  }

  private def count(plan: String, marker: String): Int =
    plan.sliding(marker.length).count(_ == marker)

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // Manual salting (Skew.saltedJoin, q60) handles KNOWN skew; this pins
    // the complementary runtime path — AQE detecting an unforeseen hot key
    // from shuffle statistics and splitting its partition — so the engine
    // demonstrably has both levers a 100 TB join needs. Thresholds are
    // lowered to make toy-scale partitions register as skewed.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val pad = "x" * 200
      // one key owns half the fact rows — the classic hot-customer shape
      val facts = spark.range(40000).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val dim = spark.range(50).select(col("id").as("k"),
        (col("id") * 7).as("attr"))
      val joined = facts.join(dim, "k")
      val plan = executed(joined)
      assert(plan.contains("SortMergeJoin"),
        s"broadcast disabled — expected a sort-merge join:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition (skew=true):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("cluster exemplars: per-cluster top-m plans as WindowGroupLimit") {
    val plan = executed(LlmQueries.clusterExemplars(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=m must push a group limit below the exchange:\n$plan")
  }

  test("flagship: dimension joins are broadcast, no sort-merge join") {
    val plan = executed(Queries.flagship(spark, sf))
    assert(count(plan, "BroadcastHashJoin") >= 3,
      s"expected >=3 broadcast joins, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "small-dim joins must not shuffle the fact side")
    // dedup rank-1 must use the one-pass WindowGroupLimit optimization
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("watermark incremental predicate reaches PushedFilters (literal path)") {
    val orders = Tables.orders(spark, sf)
    val wm = operators.Silver.watermarkCommit(
      orders.filter(org.apache.spark.sql.functions.col("o_orderdate") <
        org.apache.spark.sql.functions.lit("1997-01-01").cast("timestamp")),
      "orders", "o_orderdate")
    val inc = operators.Silver.incrementalAfterLiteral(orders, wm, "orders", "o_orderdate")
      .select("o_orderkey")
    val scan = inc.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"),
      s"incremental filter must prune the scan:\n$scan")
  }

  test("watermark broadcast variant stays lazy (no collect in the plan path)") {
    val orders = Tables.orders(spark, sf)
    val wm = operators.Silver.watermarkCommit(
      orders.filter(org.apache.spark.sql.functions.col("o_orderdate") <
        org.apache.spark.sql.functions.lit("1997-01-01").cast("timestamp")),
      "orders", "o_orderdate")
    val plan = executed(
      operators.Silver.incrementalAfter(orders, wm, "orders", "o_orderdate"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"watermark must join as broadcast, plan:\n$plan")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
      s"scan must prune to the projected columns:\n$scan")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 40)
      .select("l_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"predicate must appear in PushedFilters:\n$scan")
  }

  private def factDf = operators.Gold.factLines(
    Tables.lineitem(spark, sf), Tables.orders(spark, sf),
    operators.Gold.dimMember(Tables.customer(spark, sf)),
    operators.Gold.dimProvider(Tables.supplier(spark, sf)),
    operators.Gold.dimDate(spark, "1992-01-01", "2002-12-31"))

  test("fact build: dims broadcast (incl. both date roles), orders join is " +
      "the ONLY fact-side shuffle join, no single-partition window") {
    // disable size-based auto-broadcast: at scale orders is unbounded, so
    // the header:line join must be a shuffle join — simulate that here
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(factDf)
      val bhj = count(plan, "BroadcastHashJoin")
      assert(bhj >= 4,
        s"member/provider + service-date/order-date roles must broadcast, got $bhj:\n$plan")
      val smj = count(plan, "SortMergeJoin") + count(plan, "ShuffledHashJoin")
      assert(smj == 1,
        s"exactly one fact-side shuffle join (lineitem⋈orders), got $smj:\n$plan")
      // the surrogate-key windows must be bucket-partitioned: a global
      // window serializes the dimension through one task at scale
      assert(!plan.contains("Exchange SinglePartition"),
        s"no operator may funnel data to a single partition:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L << 20)
  }

  test("fact build under AQE defaults: dims still broadcast, orders join free to adapt") {
    val plan = executed(factDf)
    assert(count(plan, "BroadcastHashJoin") >= 4, s"plan:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), s"plan:\n$plan")
  }

  test("quantile gate: threshold broadcast onto a cached scored scan, no corpus window") {
    val df = LlmQueries.qualityQuantileGate(spark, sf)
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"per-lang thresholds must broadcast, plan:\n$plan")
    assert(!plan.contains("Window"),
      s"gating must not sort the corpus in a window, plan:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"the scored scan must be reused from cache, not re-scored, plan:\n$plan")
  }

  test("mixture sample: rate table broadcast, document rows never shuffled or windowed") {
    val plan = executed(LlmQueries.mixtureSample(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source rates must broadcast, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no shuffle join of document rows, plan:\n$plan")
    assert(!plan.contains("Window"), s"plan:\n$plan")
  }

  test("heavy hitters: candidate set broadcast; token stream never shuffle-joined") {
    val plan = executed(LlmQueries.heavyHitterTokens(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"MG candidates must broadcast onto the token stream, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the full token stream must not shuffle-join, plan:\n$plan")
  }

  test("tfidf: per-doc top-k plans as WindowGroupLimit, doc count broadcasts") {
    val plan = executed(LlmQueries.tfidfTerms(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=5 must push the limit below the sort, plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 1-row corpus count must broadcast, plan:\n$plan")
  }

  test("quantized ANN: queries broadcast, corpus never shuffles, no window") {
    val plan = executed(LlmQueries.quantizedAnn(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query codes must broadcast against the corpus scan, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus must not shuffle-join, plan:\n$plan")
    assert(!plan.contains("WindowGroupLimit") &&
      count(plan, "Window") == 0,
      s"top-k must be the bounded aggregation, not a window, plan:\n$plan")
  }

  test("span dedup: no cartesian product, per-doc window only") {
    val plan = executed(graft.functions.DedupOps.duplicatedSpanStats(
      Tables.documents(spark, sf), "text", "doc_id"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup must stay equality-join-shaped, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("vocab coverage: running total is bucketed, never a global window") {
    val plan = executed(SparkEntry.queries("q78_vocab_coverage")(spark, sf))
    assert(!plan.contains("Window [") || !plan.contains("No Partition Defined"),
      s"global cumsum must ride the bucketed PrefixSum, plan:\n$plan")
    // the threshold fan-out must broadcast the 4-row table
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"threshold table must broadcast, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("epoch upsample: pure scan shape — no shuffle, no join") {
    val df = functions.Sampling.epochUpsample(
      Tables.documents(spark, sf),
      org.apache.spark.sql.functions.col("lang"),
      org.apache.spark.sql.functions.col("doc_id"),
      Map("en" -> 130, "de" -> 250))
    val plan = executed(df)
    assert(!plan.contains("Exchange"),
      s"upsampling must run at scan speed with no exchange, plan:\n$plan")
  }

  test("gap fill: one window partitioned by member, no global sort before it") {
    val plan = executed(SparkEntry.queries("q80_gap_fill")(spark, sf))
    assert(!plan.contains("No Partition Defined"),
      s"fill window must be per-member, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("subqueries decorrelate: EXISTS/NOT EXISTS become semi/anti hash joins") {
    val plan = executed(SparkEntry.queries("q92_subqueries")(spark, sf))
    assert(plan.contains("LeftSemi") || plan.contains("ExistenceJoin"),
      s"EXISTS must plan as a semi join, plan:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti join, plan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no correlated re-execution shapes, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("funnel: equality joins only, no event-history windows") {
    val plan = executed(SparkEntry.queries("q81_funnel")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"funnel stages must join on user id, plan:\n$plan")
    assert(!plan.contains("Window ["),
      s"funnel must aggregate, not sort event histories, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("PQ ANN: codebook and LUT broadcast, corpus never shuffle-joined, no window") {
    val plan = executed(SparkEntry.queries("q102_pq_ann")(spark, sf))
    assert(count(plan, "BroadcastHashJoin") >= 2,
      s"codebook (encode) and LUT (ADC) must broadcast, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle-join, plan:\n$plan")
    assert(!plan.contains("Window ["),
      s"top-k must be the bounded aggregation, not a window, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("triangles: equality joins only — orientation kills the hub wedge blowup") {
    val plan = executed(SparkEntry.queries("q100_triangle_count")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge + closing-edge joins must stay equality-shaped, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("ppjoin: prefix candidate join is equality-shaped, no cartesian") {
    val plan = executed(SparkEntry.queries("q104_ppjoin_neardup")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join must hash on the shingle key, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("semantic dedup: cluster-key equality pair join, seed assignment broadcast") {
    val plan = executed(SparkEntry.queries("q113_semantic_dedup")(spark, sf))
    // the ONLY nested-loop allowed is the bounded k-seed broadcast; the
    // vector-pair join must hash on the cluster key, never cross
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must not be a cartesian, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("bpe pairs: adjacent pairs built inside the scan — no window, no join") {
    val plan = executed(SparkEntry.queries("q137_bpe_pairs")(spark, sf))
    assert(!plan.contains("Window"),
      s"pairs must come from transform(sequence), not a lag window:\n$plan")
    assert(!plan.contains("Join"),
      s"no join anywhere — one exchange at the pair groupBy only:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("ks drift: CDFs ride bucketed windows, never an unpartitioned one") {
    val plan = executed(SparkEntry.queries("q135_ks_drift")(spark, sf))
    // PrefixSum windows partition by bucket; a global-order window would
    // print an empty partition spec
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition()"),
      s"no unpartitioned window in the KS plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("kcore: every peel round is equality-shaped, no cartesian") {
    val plan = executed(SparkEntry.queries("q139_kcore")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"peel restriction must hash on endpoints, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("CMS: sketch broadcasts to the estimate join, no sort anywhere in build") {
    val plan = executed(SparkEntry.queries("q114_cms_frequency")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the d*w-row sketch must broadcast, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the CMS pipeline is big enough to sort-merge, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("basket lift: order-key equality pair join; only the 1-row total crosses") {
    val plan = executed(SparkEntry.queries("q116_basket_lift")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must hash on the order key, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("DSIR: bucket stats broadcast back to the token stream, one doc-key shuffle") {
    val plan = executed(SparkEntry.queries("q115_dsir_selection")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"score table is width-bounded and must broadcast, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("event paths: rank self-joins stay equality-shaped, no cartesian") {
    val plan = executed(SparkEntry.queries("q119_event_paths")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"(user, rank±) joins must hash, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("histogram quantiles: the bounded sketch broadcasts, no sort-merge join") {
    val plan = executed(SparkEntry.queries("q122_histogram_quantiles")(spark, sf))
    assert(!plan.contains("SortMergeJoin"),
      s"every join side is bins- or quantile-bounded, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("neighborhood function: bitmask rounds never window, never cartesian") {
    val plan = executed(SparkEntry.queries("q256_neighborhood_function")(spark, sf))
    // the MS-BFS formulation's whole point: no per-root pair table, so
    // no Window over anything edge-derived and no cartesian expansion —
    // each round is an equality join + a partial-aggregating bit_or
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"MS-BFS must stay join+aggregate shaped, plan:\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }

  test("lsh band sweep: one tagged self-join feeds all three band shapes") {
    val plan = executed(SparkEntry.queries("q209_lsh_band_sweep")(spark, sf))
    // the tagged-union rewrite: exactly one candidate self-join on
    // (band_rows, band_idx, band_hash) instead of one per shape
    val selfJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length
    assert(selfJoins <= 4, // candidate join + 2 verification joins + truth path
      s"band sweep re-grew per-shape self-joins ($selfJoins shuffled joins):\n$plan")
    graft.CacheScope.drain(spark, blocking = true)
  }
}
