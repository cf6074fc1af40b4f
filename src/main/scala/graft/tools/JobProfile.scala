package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job wall/task-time profile of one registry query:
  * `runMain graft.tools.JobProfile <sfDir> <query> [reps]`.
  *
  * Prints one line per Spark job of the FINAL rep (earlier reps warm
  * JIT/codegen/page cache, matching graft.Bench's warmup discipline):
  * job id, wall ms, number of tasks, summed executor run/cpu/GC ms,
  * shuffle bytes, and the job's first stage name — enough to attribute
  * a slow query to scheduling overhead (many short jobs), shuffle
  * volume, GC, or a genuinely hot stage, without the Spark UI.
  */
object JobProfile {
  private case class Job(var submitted: Long = 0L, var completed: Long = 0L,
    var tasks: Int = 0, var runMs: Long = 0L, var cpuMs: Long = 0L,
    var gcMs: Long = 0L, var shuffleBytes: Long = 0L, var desc: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = new ConcurrentHashMap[Int, Job]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val j = new Job(submitted = e.time,
          desc = Option(e.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse(""))
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (record) {
        Option(jobs.get(e.jobId)).foreach(_.completed = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (record) {
        val jid = stageToJob.getOrDefault(e.stageId, -1)
        val j = jobs.get(jid)
        if (j != null && e.taskMetrics != null) j.synchronized {
          j.tasks += 1
          j.runMs += e.taskMetrics.executorRunTime
          j.cpuMs += e.taskMetrics.executorCpuTime / 1000000L
          j.gcMs += e.taskMetrics.jvmGCTime
          j.shuffleBytes += e.taskMetrics.shuffleReadMetrics.totalBytesRead +
            e.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 until reps).foreach { _ =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.CacheScope.drain(spark, blocking = true)
      graft.Bench.gapGc(); Thread.sleep(50) // Bench's gap protocol
    }
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    // let the async listener bus drain BEFORE turning recording off —
    // the final stage's task/job-end events are still queued when the
    // action returns, and dropping them corrupts exactly the numbers
    // this tool exists to report (negative walls, undercounted cpu).
    // Deterministic (waits on the queues themselves, via the graftspark
    // bridge) — a fixed sleep is not a flush under load.
    org.apache.spark.graftspark.drainListenerBus(spark.sparkContext)
    record = false
    graft.CacheScope.drain(spark, blocking = true)
    import scala.jdk.CollectionConverters._
    val js = jobs.asScala.toSeq.sortBy(_._1)
    println(f"PROFILE $name total ${sec}%.3f s, ${js.size} jobs")
    var gapAccum = 0L
    js.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        if (b.submitted > a.completed) gapAccum += b.submitted - a.completed
      case _ =>
    }
    js.foreach { case (id, j) =>
      val wall = j.completed - j.submitted
      println(f"PROFILE   job $id%3d wall ${wall}%5d ms tasks ${j.tasks}%4d " +
        f"run ${j.runMs}%6d cpu ${j.cpuMs}%6d gc ${j.gcMs}%4d " +
        f"shuf ${j.shuffleBytes / 1024}%8d KiB  ${j.desc.take(60)}")
    }
    println(f"PROFILE $name driver-gap ${gapAccum} ms between jobs")
    spark.stop()
  }
}
