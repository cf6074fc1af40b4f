package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant join: salt the skewed (fact) side's key into
  * `saltFactor` sub-keys and explode the small side across every salt, so
  * one hot key spreads over `saltFactor` reducers instead of melting a
  * single one. AQE's skew-join handles sort-merge cases adaptively at
  * runtime; explicit salting is for when the skew is known and the build
  * side is small enough to replicate (the classic hot-customer /
  * hot-partition shape at 100 TB).
  */
object Skew {

  /** Inner equi-join of skewed `facts` with small `dim` on `key`,
    * salt-spread over `saltFactor` sub-keys. `dim` rows are replicated
    * `saltFactor` times (keep it broadcast-small or the factor modest).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    // deterministic salt from a row hash, NOT rand(): reproducible runs
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(facts.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top heavy-hitter keys with their frequency share — the diagnostic
    * used to decide a salt factor (run on a sample at scale).
    */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    // one action, one input scan: the grand total is a scalar subquery
    // summing the per-key counts (the groupBy exchange is reused for both
    // consumers), not a separate df.count() job re-scanning the input
    val counts = df.groupBy(col(key)).count()
    counts
      .withColumn("share",
        col("count") / counts.agg(sum(col("count"))).scalar())
      .orderBy(col("count").desc, col(key))
      .limit(topK)
  }
}
