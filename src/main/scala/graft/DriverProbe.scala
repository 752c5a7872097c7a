package graft

/** Scratch measurement main (guide §1): replicate q42b's SQL maintenance
  * loop statement-by-statement with wall timers, to locate the driver-side
  * gap the bench diagnostics show (wall >> job spans). Not part of the
  * driver contract; safe to evolve freely between measurements.
  */
object DriverProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local()
    // in-process sampler: aggregate main-thread stacks (50 ms period) so the
    // driver-side gap between jobs gets attributed to real frames
    val mainT = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampler = new Thread(() => {
      while (sampling.get()) {
        val st = mainT.getStackTrace
        // keep the deepest interesting frame run: first frame in graft/spark sql
        val key = {
          val interesting = st.filter(f =>
            f.getClassName.startsWith("graft") ||
            f.getClassName.startsWith("org.apache.spark.sql") ||
            f.getClassName.startsWith("org.apache.hadoop"))
          if (interesting.isEmpty) {
            if (st.nonEmpty) s"${st.head.getClassName}.${st.head.getMethodName}" else "<empty>"
          } else if (interesting.head.getClassName.endsWith("Shell") ||
              interesting.head.getClassName.contains("Shell$")) {
            // fork-exec hit: attribute to the first NON-shell-machinery caller
            interesting.find(f => !f.getClassName.contains("Shell") &&
                !f.getClassName.contains("FileUtil") &&
                !f.getClassName.startsWith("org.apache.hadoop.fs."))
              .map(f => s"SHELL<=${f.getClassName}.${f.getMethodName}:${f.getLineNumber}")
              .getOrElse("SHELL<=?")
          } else {
            val f = interesting.head
            s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}"
          }
        }
        samples.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    sys.addShutdownHook {
      sampling.set(false)
      import scala.jdk.CollectionConverters._
      println("== main-thread sample histogram ==")
      samples.asScala.toSeq.sortBy(-_._2.get).take(40)
        .foreach { case (k, c) => println(f"[samp] ${c.get}%6d  $k") }
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    import graft.model.{BootstrapConfig, TableType}
    import graft.table.KeyedTable
    val tbl = java.nio.file.Files.createTempDirectory("graft-probe42b").toString + "/tbl"
    val orders = Tables.orders(s, d).withColumn("o_month",
      org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("o_orderdate"), "yyyy-MM"))
    val src = s"$tbl-src"
    orders.write.mode("overwrite").parquet(src)
    t("bootstrap") {
      KeyedTable.bootstrap(s, BootstrapConfig(
        dataFilePath = src, tablePath = tbl, tableName = "probe42b_orders",
        keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
        partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead))
    }
    s.sql("DROP TABLE IF EXISTS graft_probe42b")
    s.sql(s"CREATE TABLE graft_probe42b USING graft LOCATION '$tbl'")
    for (n <- 1 to 4) {
      println(s"--- run $n ---")
      t("INSERT") {
        s.sql(
          s"""INSERT INTO graft_probe42b
             |SELECT o_orderkey + ${n * 100000000L}, o_custkey, 'M$n' AS o_orderstatus,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) + 5 AS DOUBLE) AS o_totalprice,
             |  o_orderdate, o_orderpriority, o_month,
             |  _hoodie_commit_time, _hoodie_record_key, _hoodie_partition_path
             |FROM graft_probe42b
             |WHERE o_orderkey % 13 = 0 AND o_month = '1995-01'
             |  AND o_orderkey < 100000000""".stripMargin)
      }
      t("compact_if_needed") {
        s.sql(s"CALL graft.system.compact_if_needed(table => '$tbl')").collect()
      }
      t("SELECT+count") {
        s.sql(
          s"""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM graft_probe42b WHERE o_orderstatus = 'M$n'
             |ORDER BY o_orderkey""".stripMargin).count()
      }
    }
    s.stop()
  }
}
