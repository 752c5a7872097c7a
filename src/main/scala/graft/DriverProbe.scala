package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Scratch measurement main (guide §1): currently probing the CDC pull
  * (`readChanges`) on an unpartitioned MOR corpus — x71's hook path — for
  * filter pushdown into the base scan and per-phase cost. Not part of the
  * driver contract; safe to evolve freely between measurements.
  */
object DriverProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def t[A](label: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e6}%.0f ms, ${jobs.get() - j0} jobs")
      r
    }
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, d).select("doc_id", "source", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-probe-cdc").toString
    val corpusTbl = s"$root/corpus"
    t("create corpus (MOR, unpartitioned)") {
      graft.table.KeyedTable.create(s, corpusTbl, docs.filter(col("doc_id") % 5 =!= 2),
        tableName = "probe_corpus", keyFields = Seq("doc_id"),
        precombineField = "doc_id", partitionFields = Seq.empty,
        tableType = graft.model.TableType.MergeOnRead)
    }
    val tip0 = graft.table.CommitLog.commits(s, corpusTbl).last.commitTime
    t("upsert batch") {
      graft.table.KeyedTable.upsert(s, corpusTbl,
        docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + lit(100000000L)).as("doc_id"),
            col("source"), col("text")))
    }
    val ch = graft.table.KeyedTable.readChanges(s, corpusTbl, tip0)
    println("===== readChanges plan =====")
    ch.explain("formatted")
    t("readChanges count") { println("rows: " + ch.count()) }
    t("readChanges count again") { ch.count() }
    t("isEmpty probe dels") {
      ch.filter(col(graft.table.KeyedTable.ChangeOp) === "delete").isEmpty
    }
    t("isEmpty probe ups") {
      ch.filter(col(graft.table.KeyedTable.ChangeOp) === "upsert").isEmpty
    }
    s.stop()
  }
}
