package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.LayerIO

/** Incremental + idempotency contract of the medallion entry points:
  * batch 1 loads half the feed, batch 2 the rest; a third run with no new
  * data must change nothing anywhere (the reference docs' "Idempotent
  * Processing" declaration, bronze_silver_gold/readme.md:68-70).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("two incremental batches then a no-op re-run: counts conserved, idempotent") {
    val paths = Pipeline.LayerPaths(Files.createTempDirectory("medallion_run").toString)
    val li = Tables.lineitem(spark, sf)
    val batch1 = li.filter($"l_orderkey" % 2 === 0)
    val batch2 = li.filter($"l_orderkey" % 2 =!= 0)

    // batch 1
    Pipeline.runBronze(spark, batch1, paths, "load_1", "2026-01-01 00:00:00")
    val n1 = Pipeline.runSilver(spark, paths)
    Pipeline.runGold(spark, paths, sf)
    assert(n1 > 0)
    val factAfter1 = LayerIO.readLayer(spark, paths.fact).count()
    assert(factAfter1 == n1)

    // batch 2 — only the new rows are processed (watermark)
    Pipeline.runBronze(spark, batch2, paths, "load_2", "2026-01-02 00:00:00")
    val n2 = Pipeline.runSilver(spark, paths)
    Pipeline.runGold(spark, paths, sf)
    val silverAfter2 = LayerIO.readLayer(spark, paths.silver).count()
    val factAfter2 = LayerIO.readLayer(spark, paths.fact).count()
    assert(n2 > 0 && n2 < li.count())
    assert(silverAfter2 == factAfter2)

    // silver = deduped pass rows of the full feed
    val expected = operators.Silver.dedupLatest(
      operators.Silver.quarantineSplit(operators.Silver.applyDqRules(
        operators.Silver.cleanseLineitem(li)))._1,
      Seq("l_orderkey", "l_linenumber"), Seq($"ship_date".desc))
      .count()
    assert(silverAfter2 == expected)

    // no-op third run: nothing above the watermark, nothing changes
    assert(Pipeline.runSilver(spark, paths) == 0L)
    Pipeline.runGold(spark, paths, sf)
    assert(LayerIO.readLayer(spark, paths.fact).count() == factAfter2)
    val rollup1 = LayerIO.readLayer(spark, paths.rollup)
    assert(rollup1.agg(sum($"n_lines")).as[Long].collect()(0) == factAfter2)

    // referential integrity end-state
    val fact = LayerIO.readLayer(spark, paths.fact)
    assert(fact.filter($"member_sk".isNull || $"provider_sk".isNull ||
      $"service_date_key".isNull).count() == 0)
  }
}
