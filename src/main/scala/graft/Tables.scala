package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see TESTDATA.md / FIXTURES.md §B).
  *
  * Parquet footers are the authoritative schema (no inferSchema pass, no
  * driver-side schema guessing): loading is a single deferred scan whose
  * column pruning / predicate pushdown is decided by Catalyst at the point
  * of use. Mirrors the reference's layer reads
  * (/root/reference/bronze/bronze_rx_claims_load.py:91,
  * /root/reference/silver/silver_rx_claims_load.py:191) re-expressed over
  * the driver fixtures.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  /** `events.ts` arrives in fixture-generation-dependent physical types:
    * parquet TIMESTAMP(NANOS) (rejected by Spark's vectorized reader —
    * [PARQUET_TYPE_ILLEGAL] — so it is read as long nanos and truncated to
    * microseconds, the same ns→µs truncation DuckDB applies) or plain
    * timestamp[us] (read as TIMESTAMP_NTZ). Either way the loader
    * normalizes to session-zone TIMESTAMP so every event-time query sees
    * one type; the session zone is pinned UTC, making the NTZ cast a
    * wall-clock no-op that agrees with DuckDB's naive TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
