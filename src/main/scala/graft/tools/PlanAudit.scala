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
        if (globalWindows.nonEmpty || cartesian.nonEmpty) {
          flagged += 1
          println(s"FLAG $name globalWindows=${globalWindows.size} " +
            s"cartesian=${cartesian.size}")
        }
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}")
      } finally graft.CacheScope.drain(spark)
    }
    println(s"AUDIT done: ${qs.size} queries, $flagged flagged")
    spark.stop()
  }
}
