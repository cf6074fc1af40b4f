package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing. Random `sample()`/`sampleBy()`
  * draws depend on partition layout and seed plumbing — unreproducible
  * across runs, engines, and cluster sizes. Hash-based sampling decides
  * membership from the ROW ITSELF (a stable id hashed into a bucket), so
  * the same row is kept or dropped everywhere: results are reproducible
  * at any parallelism, auditable row-by-row, and stable across reruns of
  * a 100 TB pipeline (a rerun samples the identical subcorpus — critical
  * when downstream training data must not silently shift).
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from the salted md5 of the id's
    * string form. The salt decorrelates independent sampling decisions
    * (two different salts give two independent subsamples).
    */
  def hashBucket(id: Column, buckets: Int = 100, salt: String = ""): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % buckets).cast("int")

  /** Per-stratum deterministic subsample: keep a row iff its hash bucket
    * falls below the stratum's percentage. `ratesPct` maps stratum value →
    * keep-percentage (0-100); unlisted strata fall back to `defaultPct`.
    * One scan, no shuffle, no state — the filter composes with pushdown
    * and runs at scan speed on any corpus size.
    */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      ratesPct: Map[String, Int], defaultPct: Int = 0,
      salt: String = ""): DataFrame = {
    require(ratesPct.values.forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0,100]")
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(stratumCol === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(idCol, 100, salt))
      .filter(col("sample_bucket") < rate)
  }
}
