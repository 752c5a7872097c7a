package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement harness (guide §1): run one query repeatedly and attribute
  * its wall time — number of Spark jobs, sum of job spans, task time, and
  * the driver-side gap (wall − job spans). A lifecycle query that spends
  * its slot BETWEEN jobs (commit machinery, FS round-trips) needs a
  * different fix than one whose tasks are slow. Usage:
  *   sbt "runMain graft.ProfileQuery <query> [reps] [sfDir]"
  */
object ProfileQuery {
  private final class JobSpans extends SparkListener {
    case class J(start: Long, var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(ev: SparkListenerJobStart): Unit =
      jobs.put(ev.jobId, J(ev.time))
    override def onJobEnd(ev: SparkListenerJobEnd): Unit = {
      val j = jobs.get(ev.jobId); if (j != null) j.end = ev.time
    }
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = ev.stageInfo.taskMetrics
      if (m != null) taskMs.addAndGet(m.executorRunTime)
    }
  }

  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val l = new JobSpans
    spark.sparkContext.addSparkListener(l)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warmup (JIT + any per-sf staging)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[profile] $name warmup FAILED: ${e.getMessage}") }
      spark.catalog.clearCache()
      for (r <- 1 to reps) {
        l.jobs.clear(); l.stages.set(0); l.taskMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wallMs = (System.nanoTime() - t0) / 1e6
        // flush listener bus so job ends land
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethods.find(_.getName == "listenerBus").map(_.invoke(sc)).orNull
          if (bus != null) bus.getClass.getMethods
            .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
            .foreach(_.invoke(bus))
        } catch { case _: Throwable => () }
        import scala.jdk.CollectionConverters._
        val spans = l.jobs.values.asScala.toSeq.filter(_.end > 0)
        val jobMs = spans.map(j => j.end - j.start).sum
        println(f"[profile] $name rep $r: wall ${wallMs}%.0f ms, jobs ${spans.size}, " +
          f"job-span sum $jobMs ms, stages ${l.stages.get}, task time ${l.taskMs.get} ms, " +
          f"driver gap ${wallMs - jobMs}%.0f ms")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
