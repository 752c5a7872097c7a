package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch measurement main (guide §1): phase-level timing of x71's
  * sync-hook loop (create/bootstrap/register staged, then per run:
  * upsert+hook, delete+hook, probe, anti-join), with per-phase job count
  * and task time. Not part of the driver contract; safe to evolve freely
  * between measurements.
  */
object DriverProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) taskMs.addAndGet(m.executorRunTime)
      }
    })
    def t[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val m0 = taskMs.get()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(50) // let stage-completed events drain for attribution
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e6}%.0f ms, " +
        f"${jobs.get() - j0} jobs, task ${taskMs.get() - m0} ms")
      r
    }
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, d).select("doc_id", "source", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-probe-x71").toString
    val corpusTbl = s"$root/corpus"
    val idx = s"$root/idx"
    t("create corpus (MOR)") {
      graft.table.KeyedTable.create(s, corpusTbl, docs.filter(col("doc_id") % 5 =!= 2),
        tableName = "probe_corpus", keyFields = Seq("doc_id"),
        precombineField = "doc_id", partitionFields = Seq.empty,
        tableType = graft.model.TableType.MergeOnRead)
    }
    t("dedup index bootstrap") {
      graft.operators.DedupIndex.bootstrap(
        s, idx, graft.table.KeyedTable.read(s, corpusTbl), "doc_id", "text")
    }
    t("register sync") {
      graft.operators.SyncRegistry.register(s, corpusTbl, "dedup",
        graft.operators.SyncRegistry.DedupSpec(idx, "doc_id", "text"),
        basis = Some(graft.table.CommitLog.commits(s, corpusTbl).last.commitTime))
    }
    for (n <- 1L to 4L) {
      println(s"--- run $n ---")
      val batch = docs.filter(col("doc_id") % 10 === 7)
      t("corpus upsert (hook pulls CDC + index append)") {
        graft.table.KeyedTable.upsert(s, corpusTbl, batch
          .select((col("doc_id") + lit(n * 100000000L)).as("doc_id"),
            col("source"), col("text")))
      }
      if (n > 1) t("corpus delete (hook pulls CDC + index remove)") {
        graft.table.KeyedTable.delete(s, corpusTbl, batch
          .select((col("doc_id") + lit((n - 1) * 100000000L)).as("doc_id")))
      }
      val probe = batch.select((col("doc_id") + 700000).as("doc_id"),
        col("source"), col("text"))
      val dups = t("index probe") {
        graft.operators.DedupIndex.probe(s, idx, probe, "doc_id", "text")
      }
      t("anti-join + count") {
        probe.join(dups.select(col("b_id")).distinct(),
            col("doc_id") === col("b_id"), "left_semi")
          .select("doc_id", "source").count()
      }
    }
    s.stop()
  }
}
