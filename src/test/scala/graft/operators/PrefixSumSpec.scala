package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame,
      order: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("run",
      sum($"v").over(Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"v")

  test("exclusiveRunningTotal is bit-identical to the global window") {
    val df = spark.range(10000)
      .select($"id", ($"id" * 7919 % 101).cast("bigint").as("v"))
      .repartition(16) // scatter the input: result must not depend on layout
    val got = PrefixSum.exclusiveRunningTotal(df, Seq($"id"), $"v", "run")
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    val want = naive(df, Seq($"id"))
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("tied leading order values: ties broken by trailing columns, still exact") {
    // leading key has heavy ties (100 rows per value) — bucketing keys on
    // the leading column only, ordering uses the full total order
    val df = spark.range(5000)
      .select(($"id" / 100).cast("bigint").as("grp"), $"id",
        lit(3L).as("v"))
      .repartition(8)
    val got = PrefixSum.exclusiveRunningTotal(df, Seq($"grp", $"id"), $"v", "run")
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    val want = naive(df, Seq($"grp", $"id"))
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("digit-string order keys stay lexicographically exact (no numeric bucketing)") {
    // "10" < "9" as strings but 9.0 < 10.0 as doubles: bucketing a
    // string key by its double cast would place quantile boundaries in
    // numeric order and silently corrupt the offsets — string keys must
    // degrade to one bucket and match the window bit-for-bit
    val df = spark.range(200)
      .select(($"id" + 1).cast("string").as("k"), $"id", lit(2L).as("v"))
      .repartition(8)
    val got = PrefixSum.exclusiveRunningTotal(df, Seq($"k"), $"v", "run")
      .select($"k", $"run").as[(String, Long)].collect().toMap
    val want = naive(df, Seq($"k"))
      .select($"k", $"run").as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("edge cases: empty input, single row, null order keys") {
    val empty = spark.range(0).select($"id", lit(1L).as("v"))
    assert(PrefixSum.exclusiveRunningTotal(empty, Seq($"id"), $"v", "run")
      .count() == 0)
    val one = spark.range(1).select($"id", lit(7L).as("v"))
    assert(PrefixSum.exclusiveRunningTotal(one, Seq($"id"), $"v", "run")
      .select("run").as[Long].collect().toSeq == Seq(0L))
    // null order keys sort first (Spark's null-first ascending), and the
    // bucketed form must agree with the global window on that too
    val withNulls = spark.range(100)
      .select(when($"id" % 10 === 0, lit(null)).otherwise($"id").as("k"),
        $"id", lit(2L).as("v"))
      .repartition(5)
    val got = PrefixSum.exclusiveRunningTotal(withNulls, Seq($"k", $"id"), $"v", "run")
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    val want = withNulls.withColumn("run",
        sum($"v").over(org.apache.spark.sql.expressions.Window
          .orderBy($"k", $"id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)) - $"v")
      .select($"id", $"run").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("no single-partition exchange in the plan") {
    val df = spark.range(10000).select($"id", lit(1L).as("v"))
    val out = PrefixSum.exclusiveRunningTotal(df, Seq($"id"), $"v", "run")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix sum must not funnel data through one task:\n$plan")
  }

  test("groupedExclusiveRunningTotals matches per-group global windows, " +
      "both measures") {
    val df = spark.range(20000)
      .select(($"id" % 7).cast("string").as("grp"), $"id",
        ($"id" * 7919 % 101).cast("bigint").as("v"),
        ($"id" * 104729 % 997).cast("bigint").as("u"))
      .repartition(16)
    val got = PrefixSum.groupedExclusiveRunningTotals(df,
        Seq("grp"), Seq($"id"), Seq(($"v", "rv"), ($"u", "ru")))
      .select($"id", $"rv", $"ru").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val w = Window.partitionBy($"grp").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rv", sum($"v").over(w) - $"v")
      .withColumn("ru", sum($"u").over(w) - $"u")
      .select($"id", $"rv", $"ru").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
  }

  test("groupedExclusiveRunningTotals keeps NULL group keys (null-safe join back)") {
    // a NULL group key is a real group to the windows and aggregates;
    // the offsets join back must be null-safe or every NULL-key row
    // silently vanishes from the output
    val df = Seq((Some("a"), 1L, 10L), (Some("a"), 2L, 20L),
        (None, 1L, 5L), (None, 2L, 7L), (None, 3L, 11L))
      .toDF("grp", "ord", "v")
    val out = PrefixSum.groupedExclusiveRunningTotals(df,
      Seq("grp"), Seq($"ord"), Seq(($"v", "run")))
    assert(out.count() == 5, "NULL-key rows must not be dropped")
    val nullRuns = out.filter($"grp".isNull).orderBy("ord")
      .select("run").as[Long].collect().toSeq
    assert(nullRuns == Seq(0L, 5L, 12L))
    val aRuns = out.filter($"grp" === "a").orderBy("ord")
      .select("run").as[Long].collect().toSeq
    assert(aRuns == Seq(0L, 10L))
  }

  test("NaN order keys land in the last bucket, matching their sort position") {
    // Spark sorts NaN greater than every double, but `NaN > bound` is
    // false — unpinned, NaN rows bucketed first while sorting last,
    // corrupting their own prefix and every later bucket's offset
    val rows = (1 to 2000).map(i => (i.toDouble, 1L)) :+ (Double.NaN, 100L)
    val df = rows.toDF("ord", "v").repartition(8)
    val got = PrefixSum.exclusiveRunningTotal(df, Seq($"ord"), $"v", "run")
    // the NaN row sorts LAST: its exclusive prefix is the sum of all
    // 2000 real rows
    assert(got.filter(isnan($"ord")).select("run").as[Long].collect().toSeq
      == Seq(2000L))
    // and the real rows' prefixes are unaffected by the NaN value
    assert(got.filter($"ord" === 2000.0).select("run").as[Long]
      .collect().toSeq == Seq(1999L))
    val total = got.filter(!isnan($"ord")).agg(max($"run")).as[Long].head()
    assert(total == 1999L)
  }

  test("groupedExclusiveRunningTotals never funnels a group into one task") {
    val df = spark.range(20000)
      .select(($"id" % 3).cast("string").as("grp"), $"id", lit(1L).as("v"))
      .repartition(16)
    val out = PrefixSum.groupedExclusiveRunningTotals(df,
      Seq("grp"), Seq($"id"), Seq(($"v", "run")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"grouped prefix must not funnel data through one task:\n$plan")
    // window partitions must include the bucket, not just the group
    assert(plan.contains("__ps_bucket"),
      s"expected bucketed window partitioning:\n$plan")
  }
}
