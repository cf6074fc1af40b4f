package graft

import org.apache.spark.sql.catalyst.plans.logical

/** Registry-wide plan hygiene: no query may introduce a partition-less
  * Window (single-task funnel) or an unhinted cartesian join unless it
  * is on the enumerated bounded-input allowlist. `tools.PlanAudit` is
  * the ad-hoc form of this sweep; this spec freezes its findings so a
  * new query that funnels data-scaled rows through one task fails CI.
  */
class PlanHygieneSpec extends SparkSpec {

  /** Queries whose global window provably runs over a BOUNDED row set
    * (sketch bins / replicate means / decile tables), or whose
    * cartesian is a broadcast scalar — each justified in its scaladoc.
    */
  private val allowedGlobalWindow = Set(
    "q122_histogram_quantiles", // 256 sketch bins
    "q123_pareto_frontier",     // bounded bucket frontier table
    "q127_cusum_changepoint",   // per-month aggregate (bounded months)
    "q145_sketch_ks_drift",     // sketch bins
    "q157_decision_stump",      // 3 windows over 256-bin histograms
    "q180_poisson_bootstrap",   // 64 replicate means
    "q198_decile_lift",         // 10-row decile table
    "q215_seasonal_decompose",  // bounded months table (years × 12)
    "q230_degree_distribution", // CCDF over the distinct-degree table
    "q239_deseasonalized_growth" // embeds q215's bounded months window
  )
  private val allowedCartesian = Set(
    "q110_pmi_collocations",    // broadcast scalar total
    "q89_join_matrix"           // declared bounded dimension matrix
  )

  test("no unapproved global windows or cartesian joins in any query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.optimizedPlan
          val gw = plan.collect {
            case w: logical.Window if w.partitionSpec.isEmpty => w
          }.nonEmpty
          val cj = plan.collect {
            case j: logical.Join
                if j.condition.isEmpty && j.hint.leftHint.isEmpty &&
                  j.hint.rightHint.isEmpty => j
          }.nonEmpty
          val bad =
            (if (gw && !allowedGlobalWindow(name)) Seq(s"$name:globalWindow")
             else Nil) ++
            (if (cj && !allowedCartesian(name)) Seq(s"$name:cartesian")
             else Nil)
          bad
        } catch {
          case e: Throwable => Seq(s"$name:ERR:${e.getClass.getSimpleName}")
        } finally CacheScope.drain(spark)
    }
    assert(offenders.isEmpty, offenders.mkString(", "))
  }
}
