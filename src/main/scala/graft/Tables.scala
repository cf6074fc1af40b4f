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
  // Memoized per (session, path): a fresh `spark.read.parquet` re-lists
  // the directory and re-reads footers EVERY call — a driver-side
  // listing job plus scheduling gap that costs ~0.1 s per table
  // reference, which across a few-hundred-query session is tens of
  // seconds of pure catalog overhead. Reusing the resolved DataFrame
  // reuses its file index, exactly what a catalog-registered table
  // would do (the reference reads through the metastore for the same
  // reason). Keyed by session because a plan is bound to the session
  // that resolved it. The fixture dirs are immutable within a session
  // (regenerated only between driver rounds); a deployment reading
  // mutable paths should register tables in the catalog and REFRESH
  // instead — this cache is for stable-path analytical reads.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // entries for STOPPED sessions can never be used again but would pin
    // the session (DataFrame → QueryExecution → session state) for the
    // JVM's life — purge lazily so session churn (test suites spinning
    // up extension sessions, embedding apps) cannot grow the map
    // monotonically; a weak map cannot express this (the value strongly
    // references the key's session)
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"), { case (s, p) =>
      // events may carry TIMESTAMP(NANOS) (see events() below); the conf
      // must be in place when the relation is RESOLVED, and with this
      // cache that is the first load from any call site — not
      // necessarily events()
      if (name == "events") s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(p)
    })
  }

  /** Drop every memoized relation. The cache assumes stable fixture
    * paths (regenerated only between driver rounds); an embedding app
    * that rewrites a path mid-session calls this — the explicit escape
    * hatch alongside the documented catalog-REFRESH route — and the
    * next load re-lists files and re-reads footers.
    */
  def invalidate(): Unit = cache.clear()

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
    normalizeEventTs(load(s, d, "events"))
  }

  /** The `ts` normalization shared by this batch loader AND the
    * streaming reader (EventStreams.readEvents): every streaming-vs-
    * batch oracle comparison depends on both paths applying the SAME
    * expressions, so the type dispatch lives in exactly one place —
    * a new fixture physical type gets handled here or nowhere.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
