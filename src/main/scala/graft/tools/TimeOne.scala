package graft.tools
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.TimeOne <sfDir> <query> [reps]
  * Prints wall time plus task-attributed run/cpu seconds per rep — the
  * same counters graft.Bench's diag reports, so a driver-diag anomaly
  * (e.g. r12's q172 reading 121 task-CPU-s) can be reproduced or ruled
  * out on the same code without a full suite run.
  * SPARK_GRAFT_STAGES=1 additionally prints one line per completed stage
  * (tasks, run/cpu ms, name) on the LAST rep — the stage-count diet view.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val showStages = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
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
    val runMs = new AtomicLong; val cpuMs = new AtomicLong
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (showStages) {
          val s = e.stageInfo
          val run = Option(s.taskMetrics).map(_.executorRunTime).getOrElse(0L)
          val cpu = Option(s.taskMetrics)
            .map(_.executorCpuTime / 1000000L).getOrElse(0L)
          stageLog.add(f"TIMEONE-STAGE ${s.stageId}%4d tasks=${s.numTasks}%4d " +
            f"run=${run}%6d ms cpu=${cpu}%6d ms  ${s.name.takeWhile(_ != '\n')}")
        }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      name.split(",").foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        // match graft.Bench's gap protocol exactly (blocking drain +
        // SHARED Bench.gapGc — a cycle-completion wait, not a fixed
        // sleep — BEFORE the timed region): without it, ContextCleaner
        // debt and still-marking concurrent GC cycles from earlier
        // reps land inside later reps' timed regions and A/B numbers
        // measured here diverge from the suite's protocol
        graft.CacheScope.drain(spark, blocking = true)
        graft.Bench.gapGc()
        Thread.sleep(50)
        org.apache.spark.graftspark.drainListenerBus(spark.sparkContext)
        runMs.set(0); cpuMs.set(0); stageLog.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.drain(spark, blocking = true)
        org.apache.spark.graftspark.drainListenerBus(spark.sparkContext)
        println(f"TIMEONE $n rep$i $sec%.3f s run=${runMs.get / 1e3}%.2f cpu=${cpuMs.get / 1e3}%.2f")
        if (showStages && i == reps) {
          stageLog.forEach(l => println(l))
          println(s"TIMEONE-STAGE $n total ${stageLog.size} stages")
        }
      }
    }
    spark.stop()
  }
}
