package graft
import org.apache.spark.sql.SparkSession
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env("SPARK_GRAFT_GOLD_DIR")
    val names = sys.env("SPARK_GRAFT_SOLO").split(",")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.coalesce(1).write.mode("overwrite").json(s"$outDir/$n")
      CacheScope.drain(spark, blocking = true)
      println(s"DUMPED $n")
    }
    spark.stop()
  }
}
