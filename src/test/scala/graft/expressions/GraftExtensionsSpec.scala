package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextAnalysis

class GraftExtensionsSpec extends SparkSpec {

  test("redundant lower() under word_shingles is optimized away, results unchanged") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ EliminateRedundantLowerUnderShingles
    val docs = Tables.documents(spark, sf)
    val withLower = docs.select(
      TextAnalysis.textShingles(lower(col("text")), 5).as("sh"))
    val optimized = withLower.queryExecution.optimizedPlan.toString
    assert(optimized.contains("word_shingles"), optimized)
    assert(!optimized.toLowerCase.contains("lower("),
      s"lower() must be eliminated under word_shingles:\n$optimized")
    val without = docs.select(TextAnalysis.textShingles(col("text"), 5).as("sh"))
    assert(withLower.exceptAll(without).isEmpty,
      "the rewrite must not change results")
  }

  test("GraftExtensions registers the rule via SparkSessionExtensions") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts) // must inject without error
    // buildOptimizerRules is private[sql]; injection succeeding plus the
    // behavior test above covers the wiring
  }
}
