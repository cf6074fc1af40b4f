package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct keys fit in k counters") {
    val li = Tables.lineitem(spark, sf)
    val got = li.agg(HeavyHitters.heavy_hitters($"l_returnflag", 8))
      .as[Map[String, Long]].collect()(0)
    val exact = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(got == exact, "with #distinct <= k MG degenerates to exact counts")
  }

  test("guarantee: a key with frequency > n/(k+1) always survives; counts under-estimate") {
    // 60% hot key + uniform tail, shuffled deterministically
    val rows = (Seq.fill(600)("HOT") ++ (1 to 400).map(i => s"k${i % 40}"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("key")
    val got = df.agg(HeavyHitters.heavy_hitters($"key", 5))
      .as[Map[String, Long]].collect()(0)
    assert(got.contains("HOT"), s"hot key must survive, got $got")
    assert(got.size <= 5)
    val exact = df.groupBy("key").count().as[(String, Long)].collect().toMap
    got.foreach { case (k, v) =>
      assert(v <= exact(k), s"MG count for $k must under-estimate")
      assert(exact(k) - v <= rows.size / 6 + 1, "error bounded by n/(k+1)")
    }
  }

  test("skew profile via heavy hitters agrees with exact top key") {
    val li = Tables.lineitem(spark, sf)
    val mg = li.agg(HeavyHitters.heavy_hitters(concat(lit("s"), $"l_suppkey"), 150))
      .as[Map[String, Long]].collect()(0)
    // k=150 > 100 suppliers → exact
    val exact = li.groupBy(concat(lit("s"), $"l_suppkey").as("k")).count()
      .as[(String, Long)].collect().toMap
    assert(mg == exact)
  }
}
