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

  test("q263 FIM cuts partition every document exactly; sentinel overhead " +
      "is 3 tokens per FIM doc and zero for plain") {
    val rows = ExtQueries.fimSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mode = r.getAs[String]("mode")
      assert(Set("plain", "psm", "spm")(mode), s"unknown mode $mode")
      val n = r.getAs[Long]("n_tokens")
      val parts = r.getAs[Long]("prefix_tokens") +
        r.getAs[Long]("middle_tokens") + r.getAs[Long]("suffix_tokens")
      assert(parts == n, s"$mode: cuts must partition the tokens: $parts != $n")
      val overhead = r.getAs[Long]("out_tokens") - n
      val expected = if (mode == "plain") 0L else 3L * r.getAs[Long]("n_docs")
      assert(overhead == expected, s"$mode: sentinel overhead $overhead")
    }
    // the 50/30/20 hash gate must route a nontrivial share to each mode
    val byMode = rows.groupBy(_.getAs[String]("mode"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byMode.keySet == Set("plain", "psm", "spm"), byMode.toString)
    assert(byMode("psm") > byMode("spm"), s"gate shares inverted: $byMode")
  }

  test("q264 containment is a proper directional overlap: symmetric " +
      "intersections, ppm bounded, no self-pairs") {
    val rows = ExtQueries.sourceContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    val common = rows.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b")) -> r.getAs[Long]("n_common")).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a != b, "self-pairs must not appear")
      assert(r.getAs[Long]("containment_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_common") <= r.getAs[Long]("n_a"))
      // |A ∩ B| is symmetric even though containment is directional
      assert(common((b, a)) == common((a, b)), s"asymmetric intersection $a/$b")
    }
  }
}
