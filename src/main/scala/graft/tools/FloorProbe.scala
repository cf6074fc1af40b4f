package graft.tools
import org.apache.spark.sql.SparkSession

/** Decompose the per-query fixed floor: for each named query, time
  * (a) DataFrame construction (the registry fn call = plan build +
  * analysis), (b) optimization + physical planning + codegen
  * (`executedPlan` force), (c) execution through the noop sink — so
  * "attack the floor" work knows whether the ~0.4 s/query is driver
  * planning, scheduling, or task time.
  * runMain graft.tools.FloorProbe <sfDir> <q1,q2,...> [reps]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_MASTER", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        graft.CacheScope.drain(spark, blocking = true)
        graft.Bench.gapGc(); Thread.sleep(50) // Bench's gap protocol
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        // force optimization + physical planning + codegen prep of the
        // query plan itself (the noop write below wraps it in a fresh
        // command and re-plans, so this is an upper-bound attribution
        // of the driver-side cost, not a reuse)
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"FLOOR $n rep$i build=${(t1 - t0) / 1e6}%.0f ms " +
          f"plan=${(t2 - t1) / 1e6}%.0f ms exec=${(t3 - t2) / 1e6}%.0f ms " +
          f"total=${(t3 - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
