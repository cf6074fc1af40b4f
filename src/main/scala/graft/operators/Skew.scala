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
    *
    * @param saltFrom columns the salt is hashed from (with `key`). The
    *   salt must VARY WITHIN a key — a key-only hash would land every
    *   hot-key row in one bucket, un-spreading the join — but hashing
    *   the whole row (as a naive implementation does) makes every fact
    *   row pay for hashing wide payload strings. Default: the fact's
    *   cheap fixed-width columns (numeric/date/timestamp/boolean),
    *   which carry enough entropy to spread a hot key at a few bytes
    *   of hashing each.
    */
  /** The deterministic fact-side salt in [0, saltFactor): a hash of the
    * key plus cheap fixed-width columns (see [[saltedJoin]]'s saltFrom
    * doc), NOT rand() — runs are reproducible. Exposed so specs can
    * measure the spread the join will see.
    */
  def saltExpr(facts: DataFrame, key: String, saltFactor: Int,
      saltFrom: Seq[String] = Nil): Column = {
    import org.apache.spark.sql.types._
    val cheap =
      if (saltFrom.nonEmpty) saltFrom
      else {
        val atomic = facts.schema.fields.collect {
          case f if f.name != key && (f.dataType match {
            case _: NumericType => true
            case DateType | TimestampType | BooleanType => true
            case _ => false
          }) => f.name
        }.toSeq
        if (atomic.nonEmpty) atomic.take(3)
        else facts.columns.filterNot(_ == key).take(1).toSeq
      }
    pmod(xxhash64((key +: cheap).map(col): _*), lit(saltFactor))
  }

  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 8, saltFrom: Seq[String] = Nil): DataFrame = {
    require(saltFactor >= 1)
    val salted = facts.withColumn("__salt",
      saltExpr(facts, key, saltFactor, saltFrom))
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

  /** Salt factor implied by a [[keySkewProfile]]: spread the hottest
    * key over enough sub-keys that its per-reducer share drops to the
    * average partition's (share × partitions rounded up), clamped to
    * [1, partitions] — salting past the parallelism buys nothing and
    * multiplies the dim replication for free.
    */
  def suggestedSaltFactor(profile: DataFrame, partitions: Int): Int = {
    val rows = profile.select(col("share")).limit(1).collect()
    val maxShare = if (rows.isEmpty) 0.0 else rows(0).getDouble(0)
    math.max(1, math.min(partitions, math.ceil(maxShare * partitions).toInt))
  }
}
