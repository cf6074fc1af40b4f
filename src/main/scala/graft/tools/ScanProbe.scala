package graft.tools
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-task fixed-cost probe: times bare scans and the q172 rollup on a
  * given layout, printing wall / task-run / task-cpu / task count — the
  * numbers that attribute a diag CPU reading to per-task overhead vs
  * per-row work. runMain graft.tools.ScanProbe <dir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_MASTER", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runMs = new AtomicLong; val cpuMs = new AtomicLong
    val nTasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        nTasks.incrementAndGet()
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def probe(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        graft.Bench.gapGc(); Thread.sleep(50) // Bench's gap protocol
        org.apache.spark.graftspark.drainListenerBus(spark.sparkContext)
        runMs.set(0); cpuMs.set(0); nTasks.set(0)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftspark.drainListenerBus(spark.sparkContext)
        println(f"PROBE $name rep$i wall=$sec%.3f run=${runMs.get / 1e3}%.2f cpu=${cpuMs.get / 1e3}%.2f tasks=${nTasks.get}")
      }
    val li = dir + "/lineitem.parquet"
    probe("count_star")(spark.read.parquet(li).groupBy().count())
    probe("scan_2col")(spark.read.parquet(li)
      .select(col("l_shipdate"), col("l_extendedprice")))
    probe("rollup_decimal")(spark.read.parquet(li)
      .groupBy(col("l_shipdate").cast("date").as("dt"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("decimal(38,0)").as("rev_c")))
    // the EXACT production expression (Cents.cents, not a private
    // copy): the probe is the basis of the BIGINT-vs-DECIMAL cost
    // claim, so it must pay the same per-row cost the shipped queries
    // do — and keep paying it if the cents contract ever changes
    probe("rollup_bigint")(spark.read.parquet(li)
      .groupBy(col("l_shipdate").cast("date").as("dt"))
      .agg(sum(graft.functions.Cents.cents(col("l_extendedprice")))
        .as("rev_c")))
    spark.stop()
  }
}
