package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val gc = sys.env.getOrElse("SPARK_GRAFT_GC", "1") == "1"
    // optional explicit list (comma-separated) overriding the range
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val from = sys.env.getOrElse("SPARK_GRAFT_FROM", "q100")
    val to = sys.env.getOrElse("SPARK_GRAFT_TO", "q140")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.map(_.contains(n))
        .getOrElse(n >= from && n <= to) }
    var total = 0.0
    names.foreach { case (n, fn) =>
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      CacheScope.drain(spark, blocking = true)
      if (gc) { System.gc(); Thread.sleep(100) }
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch { case e: Throwable => println(s"ERR $n ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.drain(spark, blocking = true)
      if (gc) { System.gc(); Thread.sleep(100) }
      total += sec
      println(f"MINI $n%-32s $sec%.3f")
    }
    println(f"MINITOTAL gc=$gc n=${names.size} $total%.3f")
    spark.stop()
  }
}
