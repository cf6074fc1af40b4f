package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.TimeOne <sfDir> <query> [reps] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
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
      name.split(",").foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        // match graft.Bench's gap protocol exactly (blocking drain +
        // explicit gc + settle sleep BEFORE the timed region) — without
        // it, ContextCleaner debt from earlier reps lands inside later
        // reps' timed regions and A/B numbers drift upward across reps
        graft.CacheScope.drain(spark, blocking = true)
        System.gc()
        Thread.sleep(100)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.drain(spark, blocking = true)
        System.gc()
        Thread.sleep(100)
        println(f"TIMEONE $n rep$i $sec%.3f s")
      }
    }
    spark.stop()
  }
}
