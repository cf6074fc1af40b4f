package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class HistogramSketchSpec extends SparkSpec {
  import spark.implicits._

  lazy val cents = Tables.load(spark, sf, "orders")
    .select($"o_orderkey",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents"))

  private lazy val (lo, hi) = {
    val r = cents.agg(min("cents"), max("cents")).head()
    (r.getLong(0), r.getLong(1))
  }
  private val B = 256

  test("histogram merges by counter addition: split-build == whole-build") {
    val a = HistogramSketch.sketch(
      cents.filter($"o_orderkey" % 2 === 0), "cents", B, lo, hi)
    val b = HistogramSketch.sketch(
      cents.filter($"o_orderkey" % 2 === 1), "cents", B, lo, hi)
    val merged = a.unionByName(b).groupBy("bin").agg(sum("cnt").as("cnt"))
    val whole = HistogramSketch.sketch(cents, "cents", B, lo, hi)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0)
  }

  test("ksStat from merged shard sketches equals ksStat from whole-build sketches") {
    // drift monitoring at sketch cost only works if the compared
    // sketches can come from independently-built shards
    val sideA = cents.filter($"cents" % 3 =!= 0)
    val sideB = cents.filter($"cents" % 3 === 0)
    def shardedSketch(df: org.apache.spark.sql.DataFrame) = {
      val s1 = HistogramSketch.sketch(df.filter($"o_orderkey" % 2 === 0), "cents", B, lo, hi)
      val s2 = HistogramSketch.sketch(df.filter($"o_orderkey" % 2 === 1), "cents", B, lo, hi)
      s1.unionByName(s2).groupBy("bin").agg(sum("cnt").as("cnt"))
    }
    val viaShards = HistogramSketch.ksStat(shardedSketch(sideA), shardedSketch(sideB))
      .as[(Long, Long, Long, java.math.BigDecimal)].head()
    val whole = HistogramSketch.ksStat(
      HistogramSketch.sketch(sideA, "cents", B, lo, hi),
      HistogramSketch.sketch(sideB, "cents", B, lo, hi))
      .as[(Long, Long, Long, java.math.BigDecimal)].head()
    assert(viaShards == whole)
    assert(whole._3 > 0, "the mod-3 split has genuine distribution drift")
  }

  test("quantile estimates land within one bin width of the exact percentiles") {
    val est = HistogramSketch.quantiles(
      HistogramSketch.sketch(cents, "cents", B, lo, hi),
      Seq(500, 900, 990), B, lo, hi)
    val exact = cents.agg(ExactPercentiles
        .percentiles($"cents".cast("double"), Seq(0.5, 0.9, 0.99)).as("p"))
      .select(explode(array(
        struct(lit(500L).as("q_permille"), $"p" (0).as("exact")),
        struct(lit(900L).as("q_permille"), $"p" (1).as("exact")),
        struct(lit(990L).as("q_permille"), $"p" (2).as("exact")))))
      .select($"col.q_permille", $"col.exact")
    val bad = est.join(exact, "q_permille")
      .filter(abs($"est_hi".cast("double") - $"exact") > $"bin_width".cast("double"))
    assert(bad.count() == 0, "estimates must sit within one bin of exact")
    assert(est.count() == 3)
  }

  test("est_hi is the bin's TRUE upper edge (ceiling, not floor)") {
    // lo=0 hi=9 bins=3: bin of v is v·3 div 10, so bin 0 holds 0..3 —
    // its upper edge is 3. The floor form ((b+1)·span) div bins − 1
    // reported 2, a value the bin's own occupants exceed.
    val vals = (0L to 9L).toDF("v")
    val est = HistogramSketch.quantiles(
      HistogramSketch.sketch(vals, "v", 3, 0L, 9L), Seq(400), 3, 0L, 9L)
    // rank ⌈0.4·10⌉ = 4 is covered by bin 0's cumulative count of 4
    assert(est.select($"est_hi").as[Long].head() == 3L)
  }

  test("ksStat cross-products survive corpus-mass counts past 2^63") {
    // cuma·nb = 4e9·5e9 = 2e19 overflows BIGINT; the distance itself
    // (7.5e18) fits — the decimal intermediate must keep it exact
    val skA = Seq((0L, 4000000000L), (1L, 1000000000L)).toDF("bin", "cnt")
    val skB = Seq((0L, 2500000000L), (1L, 2500000000L)).toDF("bin", "cnt")
    val r = HistogramSketch.ksStat(skA, skB)
      .as[(Long, Long, Long, java.math.BigDecimal)].head()
    assert(r._1 == 5000000000L && r._2 == 5000000000L)
    assert(r._3 == 7500000000000000000L,
      s"d_num wrapped: ${r._3}")
    // d_ppm = 7.5e18 · 1e6 div (5e9 · 5e9) = 300000
    assert(r._4.longValueExact() == 300000L)
  }

  test("quantile rank comparison survives corpus-mass totals past 2^63/1000") {
    // n = 2e16 rows: q·n = 990·2e16 ≈ 2e19 wraps in BIGINT, flipping
    // the rank filter's sign and electing bin 0 for every quantile
    val sk = Seq((0L, 5000000000000000L), (1L, 5000000000000000L),
      (2L, 5000000000000000L), (3L, 5000000000000000L)).toDF("bin", "cnt")
    val est = HistogramSketch.quantiles(sk, Seq(500, 990), 4, 0L, 3L)
      .select($"q_permille", $"est_hi").as[(Long, Long)].collect().toMap
    assert(est(500L) == 1L, s"p50 elected the wrong bin: ${est(500L)}")
    assert(est(990L) == 3L, s"p99 elected the wrong bin: ${est(990L)}")
  }

  test("NULL input values are rejected loudly, not silently rank-shifted") {
    // a NULL value mints a NULL bin that would sort before bin 0 and
    // shift every cumulative rank; both consumers must refuse it
    val withNull = Seq(Some(1L), None, Some(5L)).toDF("v")
    val sk = HistogramSketch.sketch(withNull, "v", 4, 0L, 9L)
    val eq = intercept[IllegalArgumentException] {
      HistogramSketch.quantiles(sk, Seq(500), 4, 0L, 9L).collect()
    }
    assert(eq.getMessage.contains("NULL bin"), eq.getMessage)
    val clean = Seq(2L, 3L).toDF("v")
    val ek = intercept[IllegalArgumentException] {
      HistogramSketch.ksStat(sk,
        HistogramSketch.sketch(clean, "v", 4, 0L, 9L)).collect()
    }
    assert(ek.getMessage.contains("NULL bin"), ek.getMessage)
  }

  test("sketch is bounded and layout-independent") {
    val s1 = HistogramSketch.sketch(cents, "cents", B, lo, hi)
    assert(s1.count() <= B)
    val s2 = HistogramSketch.sketch(cents.repartition(13), "cents", B, lo, hi)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }
}
