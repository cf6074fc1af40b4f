package graft
import org.apache.spark.sql.SparkSession
object SoloBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env("SPARK_GRAFT_SOLO").split(",")
    val spark = SparkSession.builder().master("local[32]")
      // mirror graft.Bench's data-sized reducer count so solo numbers
      // are comparable to driver numbers
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
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      run(fn(spark, sfDir)); CacheScope.drain(spark, blocking = true)
      System.gc(); Thread.sleep(100) // graft.Bench's gap protocol
      val t0 = System.nanoTime(); run(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.drain(spark, blocking = true)
      println(f"SOLO $n%-32s $sec%.3f")
    }
    spark.stop()
  }
}
