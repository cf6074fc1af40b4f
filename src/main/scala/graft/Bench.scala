package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/FS paths once (flagship at the smoke scale
    // factor) so the first measured query is not charged for session
    // bring-up and code generation
    spark.range(1000000).selectExpr("sum(id)").collect()
    // materialize through the noop sink, not count(): count() lets the
    // optimizer prune every projected column, so a bench built on it
    // times row counting instead of the query's actual expressions
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    finally CacheScope.drain(spark)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // WARMUP rep: run once untimed so the timed rep reports steady
      // state — one-shot numbers carry 2-4x JIT/codegen noise (r05's
      // q28 read as a 6x regression, half of which was cold-start),
      // making per-round diffs uninterpretable. The warmup's caches are
      // drained so the timed rep still pays its own materialization.
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      CacheScope.drain(spark, blocking = true)
      // force a collection in the UNTIMED gap: Spark's ContextCleaner
      // frees shuffle files and broadcasts only when their owners are
      // GC'd, so over a long suite the cleanup of query N fires inside
      // query N+k's timed region (measured: q134 read 11.0 s mid-suite
      // vs 4.0 s with a gap GC — the codec's own allocation pressure
      // triggered the collection that then drained 100+ queries of
      // deferred cleanup). One explicit gc + a short sleep lets the
      // reference queue and cleaner RPCs run here, where nobody is
      // being measured.
      System.gc()
      Thread.sleep(100)
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE (err field + nonzero exit), not a
      // near-zero time that reads as a speed-up
      val err = try { run(fn(spark, sfDir)); None }
        catch { case e: Throwable =>
          Option(e.getMessage).orElse(Some(e.getClass.getName)) }
      val sec = (System.nanoTime() - t0) / 1e9
      // drain OUTSIDE the timed region, and BLOCKING: an async drain
      // lets block-removal RPCs run during the next query's timed
      // region (r3/r4 showed 5-9× blowups on the cheap query after a
      // heavy one); blocking charges the teardown to the untimed gap
      CacheScope.drain(spark, blocking = true)
      System.gc()
      Thread.sleep(100)
      (name, sec, err)
    }
    // 3-decimal times keep the one-line JSON short enough for the
    // driver's bounded output-tail capture to parse it whole;
    // Locale.ROOT so a comma-decimal default locale cannot emit
    // "value":139,093 (invalid JSON → the driver loses the round)
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // ASCENDING time order (slowest LAST): the driver's bounded output
    // capture keeps the TAIL of the line (r5 lost the head's headline
    // number; r6's lexical order lost the lexical head — q01–q26 and all
    // of q100–q133). Putting the slowest queries at the end parks every
    // time worth analyzing in the region that survives; whatever gets
    // clipped is the sub-noise-fast prefix.
    val byTime = results.sortBy(_._2)
    val qs = byTime.map { case (k, v, _) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // and a compact top-15 duplicate right before the trailing total, so
    // even a far tighter capture still carries the queries worth watching
    val slowest = byTime.takeRight(15).reverse
      .map { case (k, v, _) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // keep printable ASCII only (exception messages can carry any
    // control char, all illegal in JSON), THEN truncate — so take()
    // cannot split a multi-byte char either
    def safe(e: String): String =
      e.filter(c => c >= ' ' && c < 0x7f).take(120)
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + safe(e.replaceAll("[\"\\\\]", " ")) + "\"" }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.map(_._2).sum
    // total appears at BOTH ends of the line: the driver's bounded
    // output capture can clip either side (r05 lost the head — and with
    // it the headline number), so whichever half survives carries it
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$errJson,"sf":"$sfDir","slowest":$slowest,"total_sec":${f3(total)}}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
