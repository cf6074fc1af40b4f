package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.TimeOne <sfDir> <query> [reps] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      name.split(",").foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.drain(spark, blocking = true)
        println(f"TIMEONE $n rep$i $sec%.3f s")
      }
    }
    spark.stop()
  }
}
