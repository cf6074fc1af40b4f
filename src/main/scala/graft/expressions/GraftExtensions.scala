package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: WordShingles lowercases its input internally, so a
  * `lower(...)` feeding it is redundant work per row — strip it. A small
  * but genuine rule in the normalize-away-idempotent-prework family; it
  * also documents the full Catalyst extension stack this library uses
  * (Expression with codegen → Rule[LogicalPlan] → SparkSessionExtensions
  * injection).
  */
object EliminateRedundantLowerUnderShingles extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case WordShingles(Lower(child), n, d) => WordShingles(child, n, d)
    }
}

/** Optimizer rule: Unicode normalization is idempotent per form —
  * `NFC(NFC(x)) = NFC(x)` (Unicode Standard, ch. 3 C14) — so nested
  * same-form normalizations collapse to one. Composed pipelines hit
  * this shape naturally (a cleansing stage normalizes defensively on
  * input AND output); the rule removes the per-row double work.
  * Different forms do NOT collapse (NFC∘NFD ≠ NFC) and are left alone.
  */
object CollapseIdempotentNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalize(inner @ UnicodeNormalize(_, f1), f2) if f1 == f2 =>
        inner
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EliminateRedundantLowerUnderShingles)
    e.injectOptimizerRule(_ => CollapseIdempotentNormalize)
  }
}
