package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}
import graft.table.{CommitLog, KeyedTable}

/** Streaming TABLE addressing: `writeStream.toTable("t")` and
  * `spark.readStream.table("t")` on session-catalog graft tables resolve
  * the identifier to its LOCATION through the V1 streaming fallback
  * ([[graft.sources.GraftCatalogBackedTable]]) and route into the existing
  * path-addressed sink/source — micro-batch = one engine commit, unchanged.
  */
class StreamTableAddressingSpec extends SparkTestBase {

  private def bootstrapMor(dir: String, name: String): String = {
    val tbl = s"$dir/tbl"
    val in = s"$dir/in"
    spark.read.parquet(sf("orders")).limit(400)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = name,
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead))
    tbl
  }

  test("writeStream.toTable lands micro-batches as engine commits on the table's location") {
    val dir = tmpDir("totable")
    val dst = bootstrapMor(dir, "totable_dst")
    spark.sql("DROP TABLE IF EXISTS st_totable_t")
    spark.sql(s"CREATE TABLE st_totable_t USING graft LOCATION '$dst'")
    val ckpt = tmpDir("totable-ckpt")
    val base = KeyedTable.read(spark, dst)
    val dataCols = base.columns.filterNot(_.startsWith("_")).toSeq

    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.Row
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(base.select(dataCols.map(col): _*).schema)
    val stream = MemoryStream[Row](enc, sqlCtx)
    val update = base.filter(col("o_orderkey") % 3 === 0)
      .select(dataCols.map(col): _*)
      .withColumn("o_orderstatus", lit("T1"))
      .select(dataCols.map(col): _*)
    val q = stream.toDF().writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .toTable("st_totable_t")
    try {
      stream.addData(update.collect().toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("st_totable_t")
      assert(got.filter(col("o_orderstatus") === "T1").count() ===
        base.filter(col("o_orderkey") % 3 === 0).count())
      // one engine commit for the one non-empty micro-batch
      val ops = CommitLog.commits(spark, dst).map(_.operation)
      assert(ops === Seq("bootstrap", "delta_commit"))
    } finally q.stop()
  }

  test("writeStream.toTable CREATES a missing session-catalog graft table " +
      "(catalog entry from Spark, engine table from the first batch)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.sql("DROP TABLE IF EXISTS st_totable_new")
    val ckpt = tmpDir("totable-new-ckpt")
    val stream = MemoryStream[(Long, Long, String)]
    val q = stream.toDF().toDF("id", "ver", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("keyFields", "id")
      .option("precombineField", "ver")
      .toTable("st_totable_new")
    try {
      stream.addData((1L, 1L, "a"), (2L, 1L, "b"))
      q.processAllAvailable()
      val got = spark.table("st_totable_new")
      assert(got.count() === 2)
      assert(got.filter(col("id") === 1).head().getAs[String]("v") === "a")
      // and it is a REAL engine table: upserts through the batch path land
      stream.addData((1L, 2L, "a2"))
      q.processAllAvailable()
      assert(spark.table("st_totable_new").filter(col("id") === 1)
        .head().getAs[String]("v") === "a2")
      assert(spark.table("st_totable_new").count() === 2)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS st_totable_new")
    }
  }

  test("readStream.table tails the table's CDC feed (changes after stream start)") {
    val dir = tmpDir("readtable")
    val src = bootstrapMor(dir, "readtable_src")
    spark.sql("DROP TABLE IF EXISTS st_readtable_t")
    spark.sql(s"CREATE TABLE st_readtable_t USING graft LOCATION '$src'")
    val out = s"$dir/out"
    val ckpt = tmpDir("readtable-ckpt")
    val df = spark.readStream.table("st_readtable_t")
    // the table-addressed stream serves the SAME change-feed schema as the
    // path-addressed one: data columns plus the CDC meta columns
    assert(df.columns.contains(KeyedTable.ChangeOp))
    val q = df.writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .start()
    try {
      val base = KeyedTable.read(spark, src)
      val dataCols = base.columns.filterNot(_.startsWith("_")).toSeq
      val upd = base.filter(col("o_orderkey") % 5 === 0)
        .select(dataCols.map(col): _*)
        .withColumn("o_orderstatus", lit("C1"))
        .select(dataCols.map(col): _*)
      KeyedTable.upsert(spark, src, upd)
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.filter(col(KeyedTable.ChangeOp) === "upsert").count() ===
        base.filter(col("o_orderkey") % 5 === 0).count())
    } finally q.stop()
  }

  test("readStream.table honors reader options (startAt backfills history)") {
    val dir = tmpDir("readtable-opt")
    val src = bootstrapMor(dir, "readtable_opt_src")
    val c0 = CommitLog.commits(spark, src).head.commitTime
    // one upsert BEFORE the stream exists — only a startAt backfill sees it
    val base = KeyedTable.read(spark, src)
    val dataCols = base.columns.filterNot(_.startsWith("_")).toSeq
    val nUpd = base.filter(col("o_orderkey") % 6 === 0).count()
    KeyedTable.upsert(spark, src, base.filter(col("o_orderkey") % 6 === 0)
      .select(dataCols.map(col): _*).withColumn("o_orderstatus", lit("H1"))
      .select(dataCols.map(col): _*))
    spark.sql("DROP TABLE IF EXISTS st_readtable_opt_t")
    spark.sql(s"CREATE TABLE st_readtable_opt_t USING graft LOCATION '$src'")
    val out = s"$dir/out"
    val ckpt = tmpDir("readtable-opt-ckpt")
    val q = spark.readStream.option("startAt", c0)
      .table("st_readtable_opt_t")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .start()
    try {
      q.processAllAvailable()
      // startAt = bootstrap instant (exclusive) backfills the pre-stream upsert
      val got = spark.read.parquet(out)
      assert(got.filter(col(KeyedTable.ChangeOp) === "upsert").count() === nUpd)
    } finally q.stop()
  }
}
