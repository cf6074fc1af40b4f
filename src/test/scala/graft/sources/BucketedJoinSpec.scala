package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.Skew

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val or = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    for (t <- Seq("li_bkt", "or_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    LayerIO.writeBucketed(li, "li_bkt", Seq("l_orderkey"), 8)
    LayerIO.writeBucketed(or, "or_bkt", Seq("o_orderkey"), 8)
    val joined = spark.table("li_bkt")
      .join(spark.table("or_bkt"), $"l_orderkey" === $"o_orderkey")
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == li.join(or, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L << 20)
  }

  test("salted join equals plain join; salt spreads a hot key") {
    val facts = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey", "l_quantity")
    val dim = Tables.supplier(spark, sf).withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = facts.join(dim, "l_suppkey")
    val salted = Skew.saltedJoin(facts, dim, "l_suppkey", saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.select(sum($"l_quantity")).as[Double].collect()(0) ==
      plain.select(sum($"l_quantity")).as[Double].collect()(0))
    // each dim key appears under every salt value in the replicated side
    val profile = Skew.keySkewProfile(facts, "l_suppkey", 3)
    assert(profile.count() == 3)
  }

  test("auto-derived salt factor spreads a 90%-hot-key input evenly") {
    // 90k rows on one hot key, 10k spread over 100 cold keys — the shape
    // that melts one reducer in an unsalted shuffle join
    val skewed = spark.range(100000).select(
      when($"id" < 90000, lit(7L)).otherwise($"id" % 100).as("k"),
      ($"id" * 31 % 1009).as("m1"), ($"id" % 13).as("m2"))
    val profile = Skew.keySkewProfile(skewed, "k", 5)
    val top = profile.orderBy($"count".desc).select("share").as[Double].head()
    assert(top > 0.85 && top <= 0.95, s"hot key share should be ~0.9, got $top")

    val partitions = 32
    val factor = Skew.suggestedSaltFactor(profile, partitions)
    // 0.9 share × 32 partitions → ceil = 29 sub-keys
    assert(factor == math.ceil(top * partitions).toInt, s"factor $factor")

    // post-salt spread of the hot key: max bucket < 2× the mean bucket
    val buckets = skewed.filter($"k" === 7L)
      .withColumn("salt", Skew.saltExpr(skewed, "k", factor))
      .groupBy("salt").count()
      .select("count").as[Long].collect()
    assert(buckets.length == factor, "hot key must reach every sub-key")
    val mean = buckets.sum.toDouble / buckets.length
    assert(buckets.max < 2 * mean,
      s"post-salt spread must be < 2x mean: max=${buckets.max} mean=$mean")

    // and the salted join still equals the plain join
    val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "v")
    val plain = skewed.join(dim, "k").count()
    assert(Skew.saltedJoin(skewed, dim, "k", factor).count() == plain)
  }
}
