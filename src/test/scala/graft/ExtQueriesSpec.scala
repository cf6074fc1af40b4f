package graft

/** Plan-shape and semantics checks for the q201+ extension registry —
  * the `.explain` review pinned as assertions (PlanShapeSpec discipline).
  */
class ExtQueriesSpec extends SparkSpec {

  test("q207 EXISTS decorrelates to a LEFT SEMI hash join") {
    val plan = ExtQueries.priorityShipLag(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected LeftSemi join:\n$plan")
  }

  test("q203 broadcasts every dimension; exactly one fact-fact shuffle join") {
    val plan = ExtQueries.marketShare(spark, sf)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    val nShuffleJoin = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length
    // 3 declared dimension broadcasts; AQE may legitimately convert the
    // fact-fact join to a 4th broadcast at toy scale — what must NEVER
    // appear is a second shuffled join
    assert(nBroadcast >= 3, s"expected >=3 broadcast joins, got $nBroadcast")
    assert(nShuffleJoin <= 1,
      s"expected at most one shuffled fact-fact join, got $nShuffleJoin")
  }

  test("q201 gopher rules is scan-local: no aggregate, no join") {
    val plan = ExtQueries.gopherRules(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "rule evaluation must not join")
    assert(!plan.contains("HashAggregate"), "rule evaluation must not aggregate")
  }

  test("q205 folds are stable across runs and cover all docs") {
    val a = ExtQueries.cvFolds(spark, sf).collect()
    val b = ExtQueries.cvFolds(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    val total = a.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("q209 recall decreases as band rows grow (fewer, stricter bands)") {
    val rows = ExtQueries.lshBandSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("band_rows") -> r.getAs[Long]("recall_ppm"))
      .toMap
    assert(rows(2L) >= rows(4L) && rows(4L) >= rows(8L),
      s"recall not monotone: $rows")
  }

  test("q210 minhash estimates stay within 5 signature slots of exact") {
    // 16 slots → one slot = 62.5 permille; bound |err| by 5 slots
    val errs = ExtQueries.minhashEstimateError(spark, sf).collect()
      .map(_.getAs[Long]("abs_err_permille"))
    assert(errs.nonEmpty && errs.forall(_ <= 5 * 63), errs.mkString(","))
  }

  test("q211 growth curve is cumulative and ends at the full phrase vocab") {
    val rows = ExtQueries.vocabGrowth(spark, sf).collect()
    val last = rows.last.getAs[Long]("vocab_size")
    assert(last == rows.map(_.getAs[Long]("new_terms")).sum)
    val cum = rows.map(_.getAs[Long]("vocab_size"))
    assert(cum.sameElements(cum.sorted), "vocab_size must be nondecreasing")
  }
}
