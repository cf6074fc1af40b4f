package graft

/** The cache lifecycle the harness relies on: every heavy query registers
  * its persisted intermediates with [[CacheScope]], and a post-terminal
  * [[CacheScope.drain]] must leave the session with ZERO persisted RDDs
  * and an empty SQL cache — otherwise a 60+-query Verify/Bench session
  * strands storage memory query after query.
  */
class CacheScopeSpec extends SparkSpec {

  /** Run a registry query exactly as Verify does: materialize fully,
    * then drain; assert nothing stays persisted.
    */
  private def drainedAfter(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.write.format("noop").mode("overwrite").save() // terminal action
    CacheScope.drain(spark)
    val live = spark.sparkContext.getPersistentRDDs
    assert(live.isEmpty,
      s"$name left ${live.size} persisted RDDs after drain: " +
        live.values.map(_.name).mkString(", "))
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$name left entries in the SQL cache after drain")
  }

  test("MinHash LSH (multi-persist candidate pipeline) drains clean") {
    drainedAfter("q27_minhash_lsh")
  }

  test("PrefixSum-backed packing drains clean") {
    drainedAfter("q49_pack_sequences")
  }

  test("incremental rollup (persisted fact) drains clean") {
    drainedAfter("q53_incremental_rollup")
  }

  test("connected components (localCheckpoint blocks) drains clean") {
    drainedAfter("q55_dup_clusters")
  }

  test("drained query re-runs correctly (no stale CacheManager entry)") {
    // multiset compare (sorted seq, not toSet): a stale-cache bug that
    // duplicated or dropped repeated rows must not slip through
    val a = SparkEntry.queries("q27_minhash_lsh")(spark, sf)
      .collect().toSeq.map(_.toString).sorted
    CacheScope.drain(spark)
    val b = SparkEntry.queries("q27_minhash_lsh")(spark, sf)
      .collect().toSeq.map(_.toString).sorted
    CacheScope.drain(spark)
    assert(a == b)
  }
}
