package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}
import graft.table.{CommitLog, KeyedTable}

/** `df.writeStream.format("graft")`: each micro-batch is one engine commit;
  * replayed batches are skipped via the sink's batch-id marker.
  */
class GraftStreamSinkSpec extends SparkTestBase {

  private def bootstrapMor(dir: String, name: String): (String, String) = {
    val tbl = s"$dir/tbl"
    val in = s"$dir/in"
    spark.read.parquet(sf("orders")).limit(600)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    val boot = KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = name,
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead))
    (tbl, boot.commitTime)
  }

  test("writeStream round trip: CDC source → graft sink replicates a table") {
    val dir = tmpDir("sink-rt")
    val (src, c0) = bootstrapMor(dir, "sink_rt_src")
    val dst = s"$dir/dst"
    val ckpt = tmpDir("sink-rt-ckpt")
    val base = KeyedTable.read(spark, src)
    val dataCols = base.columns.filterNot(_.startsWith("_")).toSeq

    // changes land on the source before AND after the stream starts
    KeyedTable.upsert(spark, src, base
      .filter(col("o_orderkey") % 4 === 0).select(dataCols.map(col): _*)
      .withColumn("o_orderstatus", lit("R1")))

    // the destination is created by the sink's FIRST batch (key config from
    // write options, like df.write.format("graft")); upsert-only feed so
    // destination state converges to source state
    val q = spark.readStream.format("graft").option("startAt", c0).load(src)
      .filter(col(KeyedTable.ChangeOp) === "upsert")
      .select(dataCols.map(col): _*)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("keyFields", "o_orderkey")
      .option("precombineField", "o_orderdate")
      .option("partitionFields", "o_month")
      .option("tableType", "merge_on_read")
      .start(dst)
    try {
      q.processAllAvailable()
      val got1 = KeyedTable.read(spark, dst)
      assert(got1.count() === base.filter(col("o_orderkey") % 4 === 0).count())
      assert(got1.filter(col("o_orderstatus") =!= "R1").count() === 0)

      KeyedTable.upsert(spark, src, base
        .filter(col("o_orderkey") % 7 === 0).select(dataCols.map(col): _*)
        .withColumn("o_orderstatus", lit("R2")))
      q.processAllAvailable()
      val got2 = KeyedTable.read(spark, dst)
      assert(got2.filter(col("o_orderstatus") === "R2").count() ===
        base.filter(col("o_orderkey") % 7 === 0).count())
      // one engine commit per non-empty micro-batch: create + one upsert
      val ops = CommitLog.commits(spark, dst).map(_.operation)
      assert(ops.head === "bootstrap")
    } finally q.stop()
  }

  test("partitionBy vs partitionFields: case difference is no contradiction; real one refused") {
    val provider = new graft.sources.GraftDataSource
    val ctx = spark.sqlContext
    val path = s"${tmpDir("sink-pb")}/tbl"
    import org.apache.spark.sql.streaming.OutputMode
    // same column under Spark's default case-insensitive resolution → accepted
    provider.createSink(ctx, Map("path" -> path, "partitionFields" -> "o_month"),
      Seq("O_Month"), OutputMode.Append)
    // genuinely different columns → the loud contradiction refusal
    val e = intercept[graft.model.GraftException] {
      provider.createSink(ctx, Map("path" -> path, "partitionFields" -> "o_month"),
        Seq("o_region"), OutputMode.Append)
    }
    assert(e.getMessage.contains("contradicts"))
  }

  test("writeStream.partitionBy alone declares the created table's partitioning") {
    val dst = s"${tmpDir("sink-pb-create")}/tbl"
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val stream = MemoryStream[(Long, Long, String)]
    val q = stream.toDF().toDF("id", "ver", "m").writeStream.format("graft")
      .option("checkpointLocation", tmpDir("sink-pb-create-ckpt"))
      .option("keyFields", "id")
      .option("precombineField", "ver")
      .partitionBy("m") // no partitionFields option — partitionBy governs
      .start(dst)
    try {
      stream.addData((1L, 1L, "a"), (2L, 1L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    val st = CommitLog.requireState(spark, dst)
    assert(st.latest.partitionFields === Seq("m"))
    assert(st.nativePartitions.sorted === Seq("m=a", "m=b"))
    assert(KeyedTable.read(spark, dst).count() === 2)
  }

  test("replayed batch ids are skipped; compactEvery folds deltas") {
    val dir = tmpDir("sink-replay")
    val (tbl, _) = bootstrapMor(dir, "sink_replay")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).toSeq
    val params = Map(
      "path" -> tbl, "checkpointLocation" -> tmpDir("sink-replay-ckpt"))
    val sink = new GraftStreamSink(spark, params, tbl, compactEvery = 2)

    // batches are materialized up front: compaction at batch 1 rewrites the
    // base files a lazily-captured frame would still point at
    val b0 = base.filter(col("o_orderkey") % 5 === 0).select(dataCols.map(col): _*)
      .withColumn("o_orderstatus", lit("B0")).localCheckpoint()
    val b1 = base.filter(col("o_orderkey") % 3 === 0).select(dataCols.map(col): _*)
      .withColumn("o_orderstatus", lit("B1")).localCheckpoint()
    val n0 = b0.count()
    val n1 = b1.count()

    sink.addBatch(0, b0)
    val commitsAfter0 = CommitLog.commits(spark, tbl).size
    assert(KeyedTable.read(spark, tbl).filter(col("o_orderstatus") === "B0").count() === n0)

    // the same batch id again (a restart replay): NO new commit, same state
    sink.addBatch(0, b0.withColumn("o_orderstatus", lit("EVIL")))
    assert(CommitLog.commits(spark, tbl).size === commitsAfter0)
    assert(KeyedTable.read(spark, tbl).filter(col("o_orderstatus") === "EVIL").count() === 0)

    // next id applies, and (batchId+1) % compactEvery == 0 triggers compact
    sink.addBatch(1, b1)
    assert(KeyedTable.read(spark, tbl).filter(col("o_orderstatus") === "B1").count() === n1)
    assert(graft.table.Deltas.liveCommits(spark, tbl).isEmpty) // compacted
    assert(CommitLog.commits(spark, tbl).last.operation === "compact")
  }

  test("crash-replayed APPEND batch is skipped via the commit-embedded batch id (exactly-once)") {
    val dir = tmpDir("sink-eo")
    val (tbl, _) = bootstrapMor(dir, "sink_eo")
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).toSeq
    val ckpt = tmpDir("sink-eo-ckpt")
    val params = Map(
      "path" -> tbl, "checkpointLocation" -> ckpt, "op" -> "insert")
    val batch = base.filter(col("o_orderkey") % 6 === 0)
      .select(dataCols.map(col): _*)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000) // fresh keys: an insert, not a merge
      .localCheckpoint()
    val n = batch.count()
    val before = KeyedTable.read(spark, tbl).count()

    new GraftStreamSink(spark, params, tbl, compactEvery = 0).addBatch(0, batch)
    assert(KeyedTable.read(spark, tbl).count() === before + n)
    // the commit itself records the sink identity + batch id
    val c = CommitLog.commits(spark, tbl).last
    assert(c.operation === "insert")
    assert(c.streamBatchId === Some(0L))
    assert(c.streamSink === Some(new org.apache.hadoop.fs.Path(ckpt).toString))

    // simulate the crash window: commit landed, checkpoint marker did NOT
    val marker = new org.apache.hadoop.fs.Path(ckpt, "graft-sink-last-batch")
    val fs = CommitLog.fs(spark, ckpt)
    assert(fs.delete(marker, false))

    // a restarted sink (fresh instance) replays batch 0: an append op would
    // land duplicates — the timeline record must skip it instead
    val commitsBefore = CommitLog.commits(spark, tbl).size
    new GraftStreamSink(spark, params, tbl, compactEvery = 0).addBatch(0, batch)
    assert(CommitLog.commits(spark, tbl).size === commitsBefore)
    assert(KeyedTable.read(spark, tbl).count() === before + n) // exactly once

    // the NEXT batch id still applies normally on the restarted sink
    val b1 = batch.withColumn("o_orderkey", col("o_orderkey") + 1000000).localCheckpoint()
    new GraftStreamSink(spark, params, tbl, compactEvery = 0).addBatch(1, b1)
    assert(KeyedTable.read(spark, tbl).count() === before + 2 * n)
  }
}
