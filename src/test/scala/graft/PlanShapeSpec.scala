package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan regression tests: the properties that make these queries
  * scale (pushdown reaching the parquet scan, dimension joins broadcast,
  * no redundant exchanges) are asserted so a refactor can't silently
  * regress them. These are the checks `.explain` review would do by eye.
  */
class PlanShapeSpec extends SparkSpec {

  /** Final AQE plan as text (string-matching descends through query
    * stages, which TreeNode.children does not).
    */
  private def executed(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    p.toString
  }

  private def count(plan: String, marker: String): Int =
    plan.sliding(marker.length).count(_ == marker)

  test("flagship: dimension joins are broadcast, no sort-merge join") {
    val plan = executed(Queries.flagship(spark, sf))
    assert(count(plan, "BroadcastHashJoin") >= 3,
      s"expected >=3 broadcast joins, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "small-dim joins must not shuffle the fact side")
    // dedup rank-1 must use the one-pass WindowGroupLimit optimization
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("watermark incremental read pushes nothing to the driver (no collect)") {
    // the watermark is a one-row broadcast join, not a collected literal:
    // the plan must contain a broadcast join and the query stays lazy
    val plan = executed(CoreQueries.watermarkIncremental(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"watermark must join as broadcast, plan:\n$plan")
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
      s"scan must prune to the projected columns:\n$scan")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 40)
      .select("l_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"predicate must appear in PushedFilters:\n$scan")
  }

  test("fact build: all four dim joins broadcast (fact side never shuffles)") {
    val fact = operators.Gold.factLines(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      operators.Gold.dimMember(Tables.customer(spark, sf)),
      operators.Gold.dimProvider(Tables.supplier(spark, sf)),
      operators.Gold.dimDate(spark, "1992-01-01", "2002-12-31"))
    val plan = executed(fact)
    val bhj = count(plan, "BroadcastHashJoin")
    assert(bhj == 4, s"expected exactly 4 broadcast joins, got $bhj:\n$plan")
    // the only exchanges allowed are broadcasts — no fact-side shuffle
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"fact build must not shuffle:\n$plan")
  }
}
