package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactPercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the built-in percentile aggregate, per group") {
    val df = spark.range(20001)
      .select(($"id" % 7).as("g"),
        (($"id" * 2654435761L % 1000000L).cast("double") / 100.0).as("x"))
      .repartition(8)
    val got = df.groupBy($"g")
      .agg(ExactPercentiles.percentiles($"x", Seq(0.0, 0.5, 0.9, 0.99, 1.0)).as("ps"))
      .select($"g", $"ps")
      .as[(Long, Seq[Double])].collect().toMap
    val want = df.groupBy($"g")
      .agg(expr("percentile(x, array(0.0D, 0.5D, 0.9D, 0.99D, 1.0D))").as("ps"))
      .select($"g", $"ps")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, ps) =>
      assert(ps == want(g), s"group $g: $ps != ${want(g)}")
    }
  }

  test("single-value group and exact-index percentiles need no interpolation") {
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "x")
    val got = df.groupBy($"g")
      .agg(ExactPercentiles.percentiles($"x", Seq(0.5)).as("ps"))
      .select($"g", $"ps"(0)).as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 5.0, "b" -> 2.0))
  }
}
