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

  test("sketch is bounded and layout-independent") {
    val s1 = HistogramSketch.sketch(cents, "cents", B, lo, hi)
    assert(s1.count() <= B)
    val s2 = HistogramSketch.sketch(cents.repartition(13), "cents", B, lo, hi)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }
}
