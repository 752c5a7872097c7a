package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}
import graft.table.KeyedTable

/** `spark.readStream.format("graft")`: the streaming CDC source must match
  * the batch `readChanges` twin row-for-row over the same interval, tail
  * new commits across micro-batches, and resume from its checkpoint.
  */
class GraftChangeSourceSpec extends SparkTestBase {

  private def bootstrapMor(dir: String, name: String): (String, String) = {
    val tbl = s"$dir/tbl"
    val in = s"$dir/in"
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    val boot = KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = name,
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead))
    (tbl, boot.commitTime)
  }

  private def changeRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_orderkey"), col("o_orderstatus"), col(KeyedTable.ChangeOp))
      .collect().map(_.toString).sorted.toSeq

  test("streaming CDC read matches batch readChanges and tails new commits") {
    val (tbl, c0) = bootstrapMor(tmpDir("stream-cdc"), "stream_cdc")
    val ckpt = tmpDir("stream-cdc-ckpt")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq

    // two committed changes before the stream starts: an upsert + a delete
    KeyedTable.upsert(spark, tbl, base
      .filter(col("o_orderkey") % 10 === 0).select(dataCols: _*)
      .withColumn("o_orderstatus", lit("S1")))
    KeyedTable.delete(spark, tbl, base
      .filter(col("o_orderkey") % 97 === 0).select("o_orderkey", "o_month"))

    // foreachBatch sink: supports checkpoint RECOVERY (the memory sink does
    // not), which the restart leg below depends on
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def sinkTo(buf: java.util.concurrent.ConcurrentLinkedQueue[String]) =
      spark.readStream.format("graft").option("startAt", c0).load(tbl)
        .select(col("o_orderkey"), col("o_orderstatus"), col(KeyedTable.ChangeOp))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => buf.add(r.toString)); ()
        }
        .start()

    val q = sinkTo(got)
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val batch = changeRows(KeyedTable.readChanges(spark, tbl, c0))
      assert(got.asScala.toSeq.sorted === batch && batch.nonEmpty)
      assert(batch.exists(_.contains("delete")))

      // a commit AFTER the stream started arrives in the next micro-batch
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % 13 === 0).select(dataCols: _*)
        .withColumn("o_orderstatus", lit("S2")))
      q.processAllAvailable()
      assert(got.asScala.count(_.contains("S2")) ===
        base.filter(col("o_orderkey") % 13 === 0).count())
    } finally q.stop()

    // restart from the checkpoint: only commits newer than the stored
    // offset arrive — no replay of what the first run already delivered
    KeyedTable.upsert(spark, tbl, base
      .filter(col("o_orderkey") % 17 === 0).select(dataCols: _*)
      .withColumn("o_orderstatus", lit("S3")))
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = sinkTo(got2)
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got2.asScala.count(_.contains("S3")) ===
        base.filter(col("o_orderkey") % 17 === 0).count())
      assert(got2.asScala.count(_.contains("S1")) === 0)
    } finally q2.stop()
  }

  test("the latest-start position is pinned in the query metadata, not recomputed on restart") {
    val (tbl, _) = bootstrapMor(tmpDir("stream-pin"), "stream_pin")
    val meta = tmpDir("stream-pin-meta")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    import graft.table.CommitLog

    // source created at tip c0 pins c0 as its start
    val s1 = new GraftChangeSource(spark.sqlContext, tbl, None, meta)
    val c0 = CommitLog.requireState(spark, tbl).latest.commitTime

    // the table advances AFTER the pin
    KeyedTable.upsert(spark, tbl, base
      .filter(col("o_orderkey") % 19 === 0).select(dataCols: _*)
      .withColumn("o_orderstatus", lit("P1")))
    val c1 = CommitLog.requireState(spark, tbl).latest.commitTime

    // a RESTARTED source (same metadata dir) re-executing batch 0 with no
    // start offset must use the PINNED c0, not a recomputed 'latest' (c1) —
    // recomputing would make the crash-replay of batch 0 silently empty.
    // (getBatch's frame is isStreaming and can't be actioned directly here,
    // so the pinned value itself is asserted, plus the metadata file.)
    val s2 = new GraftChangeSource(spark.sqlContext, tbl, None, meta)
    assert(s2.initialSince === c0)
    assert(s1.initialSince === c0)
    assert(c1 > c0)
    val fs = CommitLog.fs(spark, meta)
    val pin = new org.apache.hadoop.fs.Path(meta, "graft-initial-since")
    val in = fs.open(pin)
    val pinned = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    assert(pinned === c0)
    // and the replay's batch plan resolves with the declared columns/types
    // (nullability may legitimately differ — the engine binds by position)
    assert(s2.getBatch(None, GraftChangeOffset(c1)).schema
      .map(f => (f.name, f.dataType)) === s2.schema.map(f => (f.name, f.dataType)))
  }

  test("the capped offset cursor is persisted: a restart cannot regress past it") {
    val (tbl, c0) = bootstrapMor(tmpDir("stream-cursor"), "stream_cursor")
    val meta = tmpDir("stream-cursor-meta")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    import graft.table.CommitLog

    // three commits of backfill past c0
    (1 to 3).foreach { i =>
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % (20 + i) === 0).select(dataCols: _*)
        .withColumn("o_orderstatus", lit(s"C$i")))
    }
    val commits = CommitLog.commits(spark, tbl).map(_.commitTime).filter(_ > c0)

    // capped source plans two bounded batches: the cursor advances commit
    // by commit and is persisted beside the initial-since pin
    val s1 = new GraftChangeSource(spark.sqlContext, tbl, Some(c0), meta, Some(1))
    val o1 = s1.getOffset.get.json()
    val o2 = s1.getOffset.get.json()
    assert(o1 === commits(0) && o2 === commits(1))

    // a RESTARTED source that never receives the engine's getBatch init call
    // must resume the cap cursor from the persisted file, NOT regress to
    // initialSince and re-plan commit 1
    val s2 = new GraftChangeSource(spark.sqlContext, tbl, Some(c0), meta, Some(1))
    val o3 = s2.getOffset.get.json()
    assert(o3 === commits(2), s"restarted capped getOffset regressed to $o3")
  }

  test("maxCommitsPerTrigger drains a backfill as bounded micro-batches") {
    val (tbl, c0) = bootstrapMor(tmpDir("stream-cap"), "stream_cap")
    val ckpt = tmpDir("stream-cap-ckpt")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq

    // three separate commits after the start position
    (1 to 3).foreach { i =>
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % 10 === i).select(dataCols: _*)
        .withColumn("o_orderstatus", lit(s"C$i")))
    }
    val expect = (1 to 3).map(i => base.filter(col("o_orderkey") % 10 === i).count()).sum

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft")
      .option("startAt", c0).option("maxCommitsPerTrigger", "1").load(tbl)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count(); if (n > 0) batchSizes.add(n); ()
      }
      .start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // every change arrives, split across >= 3 non-empty micro-batches
      // (one commit per trigger), never one table-sized batch
      assert(batchSizes.asScala.sum === expect)
      assert(batchSizes.size >= 3)
    } finally q.stop()
  }

  test("mid-stream RENAME/DROP fails the stream loudly; a restart resumes under the new schema") {
    val (tbl, c0) = bootstrapMor(tmpDir("stream-evolve"), "stream_evolve")
    val ckpt = tmpDir("stream-evolve-ckpt")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    import scala.jdk.CollectionConverters._

    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft").option("startAt", c0).load(tbl)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.toString)); ()
      }
      .start()
    try {
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % 10 === 0).select(dataCols: _*)
        .withColumn("o_orderstatus", lit("E1")))
      q.processAllAvailable()
      assert(got.asScala.exists(_.contains("E1")))

      // a T39 rename lands while the stream runs: the NEXT micro-batch must
      // fail loudly (positional binding against the analysis-time schema
      // would misalign on a drop — the contract is fail, never misbind)
      KeyedTable.renameColumn(spark, tbl, "o_orderstatus", "status")
      val renamed = KeyedTable.read(spark, tbl)
      KeyedTable.upsert(spark, tbl, renamed
        .filter(col("o_orderkey") % 10 === 3)
        .select(renamed.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
        .withColumn("status", lit("E2")))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("changed while the stream was running")))
    } finally q.stop()

    // restart from the same checkpoint: the query picks up the NEW schema,
    // does not replay the already-committed E1 batch, and delivers the
    // pre-failure interval (the rename + E2 commits) under the new name
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = spark.readStream.format("graft").option("startAt", c0).load(tbl)
      .select(col("o_orderkey"), col("status"), col(KeyedTable.ChangeOp))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got2.add(r.toString)); ()
      }
      .start()
    try {
      q2.processAllAvailable()
      assert(got2.asScala.count(_.contains("E2")) ===
        base.filter(col("o_orderkey") % 10 === 3).count())
      assert(got2.asScala.count(_.contains("E1")) === 0)

      // a mid-stream DROP fails the restarted stream just as loudly
      KeyedTable.dropColumns(spark, tbl, Seq("o_orderpriority"))
      val ex2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex2).exists(_.contains("changed while the stream was running")))
    } finally q2.stop()
  }

  test("onSchemaChange=allowRename: the stream keeps running across a rename " +
      "(old names, correct values); a DROP still fails") {
    val (tbl, c0) = bootstrapMor(tmpDir("stream-tolerant"), "stream_tolerant")
    val ckpt = tmpDir("stream-tolerant-ckpt")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    import scala.jdk.CollectionConverters._

    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft")
      .option("startAt", c0).option("onSchemaChange", "allowRename").load(tbl)
      .select(col("o_orderkey"), col("o_orderstatus"), col(KeyedTable.ChangeOp))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.toString)); ()
      }
      .start()
    try {
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % 10 === 0).select(dataCols: _*)
        .withColumn("o_orderstatus", lit("R1")))
      q.processAllAvailable()
      assert(got.asScala.exists(_.contains("R1")))

      // rename mid-stream: the stream KEEPS RUNNING, serving the OLD name
      // (the query's select above) with the values written under the NEW one
      KeyedTable.renameColumn(spark, tbl, "o_orderstatus", "status")
      val renamed = KeyedTable.read(spark, tbl)
      KeyedTable.upsert(spark, tbl, renamed
        .filter(col("o_orderkey") % 10 === 4)
        .select(renamed.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
        .withColumn("status", lit("R2")))
      q.processAllAvailable()
      assert(got.asScala.count(_.contains("R2")) ===
        base.filter(col("o_orderkey") % 10 === 4).count())

      // a DROP changes the type sequence: still fails loudly
      KeyedTable.dropColumns(spark, tbl, Seq("o_orderpriority"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("changed while the stream was running")))
    } finally q.stop()
  }

  test("onSchemaChange=allowRename: a same-type DROP+ADD in one statement still fails " +
      "(physical identity gates the tolerance, not the DataType sequence)") {
    val (tbl, c0) = bootstrapMor(tmpDir("stream-dropadd"), "stream_dropadd")
    val ckpt = tmpDir("stream-dropadd-ckpt")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    import scala.jdk.CollectionConverters._

    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft")
      .option("startAt", c0).option("onSchemaChange", "allowRename").load(tbl)
      .select(col("o_orderkey"), col("o_orderpriority"), col(KeyedTable.ChangeOp))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.toString)); ()
      }
      .start()
    try {
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % 10 === 0).select(dataCols: _*)
        .withColumn("o_orderstatus", lit("D1")))
      q.processAllAvailable()
      assert(got.asScala.nonEmpty)

      // ONE atomic alter: drop the last data column (string) and add another
      // string — the per-position DataType sequence is IDENTICAL, but the
      // new column is a fresh physical column; binding it positionally would
      // serve its values under the dropped column's name. Must fail.
      KeyedTable.alterSchema(spark, tbl,
        adds = Seq(org.apache.spark.sql.types.StructField(
          "note", org.apache.spark.sql.types.StringType, nullable = true)),
        drops = Seq("o_orderpriority"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("changed while the stream was running")))
    } finally q.stop()
  }

  test("without startAt the stream begins at the current tip (latest)") {
    val (tbl, _) = bootstrapMor(tmpDir("stream-latest"), "stream_latest")
    val ckpt = tmpDir("stream-latest-ckpt")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq

    val q = spark.readStream.format("graft").load(tbl)
      .writeStream.format("memory").queryName("graft_latest_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_latest_out").count() === 0) // nothing before start
      KeyedTable.upsert(spark, tbl, base
        .filter(col("o_orderkey") % 11 === 0).select(dataCols: _*)
        .withColumn("o_orderstatus", lit("L1")))
      q.processAllAvailable()
      assert(spark.table("graft_latest_out").count() ===
        base.filter(col("o_orderkey") % 11 === 0).count())
    } finally q.stop()
  }
}
