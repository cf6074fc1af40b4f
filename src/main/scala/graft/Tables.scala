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
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]); read nanos as long and truncate to
    * microseconds — the same ns→µs truncation DuckDB applies, so event-time
    * semantics agree with the oracle.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
