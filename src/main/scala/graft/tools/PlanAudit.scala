package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical

/** Plan hygiene sweep over the whole query registry: flags every query
  * whose optimized plan contains a partition-less Window (the "No
  * Partition Defined" single-task funnel) or a non-broadcast cartesian
  * product. Usage: runMain graft.tools.PlanAudit <sfDir> [queryFilter]
  *
  * A flagged query is not automatically wrong — a window over a
  * provably bounded aggregate (≤ dozens of rows) is the documented
  * exception — but every flag must be explainable; this sweep is how
  * the exceptions stay enumerated instead of accumulating silently.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    var flagged = 0
    qs.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val globalWindows = plan.collect {
          case w: logical.Window if w.partitionSpec.isEmpty => w
        }
        val cartesian = plan.collect {
          case j: logical.Join
              if j.condition.isEmpty && j.hint.leftHint.isEmpty &&
                j.hint.rightHint.isEmpty => j
        }
        val joinKeyWindows = PlanAudit.joinKeyedWindows(plan)
        if (globalWindows.nonEmpty || cartesian.nonEmpty ||
            joinKeyWindows.nonEmpty) {
          flagged += 1
          println(s"FLAG $name globalWindows=${globalWindows.size} " +
            s"cartesian=${cartesian.size} " +
            s"joinKeyWindows=${joinKeyWindows.size}")
        }
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}")
      } finally graft.CacheScope.drain(spark)
    }
    println(s"AUDIT done: ${qs.size} queries, $flagged flagged")
    spark.stop()
  }

  /** Windows whose partition key sizes scale with the DATA, not a
    * bounded domain: partitioned windows whose input subtree reaches a
    * Join or Union without passing through an Aggregate. That is the
    * r07 PageRank shape — `Window.partitionBy(src)` over a joined/
    * symmetrized edge table hash-funnels every edge of a power-law hub
    * into one task — generalized: an un-aggregated join/union output
    * has per-key multiplicities bounded only by the data. An Aggregate
    * below the window caps the partition at one row per (agg-key ∩
    * partition-key) group, which the enumerated exceptions then justify
    * as domain-bounded. Used by PlanHygieneSpec; exceptions must be
    * allowlisted there with a bounded-input justification.
    */
  def joinKeyedWindows(plan: logical.LogicalPlan): Seq[logical.Window] = {
    def rawJoinBelow(p: logical.LogicalPlan): Boolean = p match {
      case _: logical.Aggregate => false
      case _: logical.Join | _: logical.Union => true
      case other => other.children.exists(rawJoinBelow)
    }
    plan.collect {
      case w: logical.Window
          if w.partitionSpec.nonEmpty && rawJoinBelow(w.child) => w
    }
  }
}
