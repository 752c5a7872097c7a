package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, BootstrapType, GraftException, TableType, WriteOperation}

class DropPartitionsSpec extends SparkTestBase {

  private def ordersWithMonth(outDir: String): String = {
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  private def boot(table: String, tt: TableType = TableType.CopyOnWrite,
      bt: BootstrapType = BootstrapType.FullRecord,
      parts: Seq[String] = Seq("o_month")) = {
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = ordersWithMonth(tmpDir("in")), tablePath = table, tableName = "orders_t",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = parts, tableType = tt, bootstrapType = bt))
  }

  test("drop removes the partitions from reads and state; archive holds the pre-image") {
    val table = tmpDir("tbl"); boot(table)
    val total = KeyedTable.read(spark, table).count()
    val dropped = KeyedTable.read(spark, table)
      .filter(col("o_month").isin("1995-01", "1995-02")).count()
    assert(dropped > 0)

    KeyedTable.dropPartitions(spark, table, Seq("o_month=1995-01", "o_month=1995-02"))
    val after = KeyedTable.read(spark, table)
    assert(after.count() === total - dropped)
    assert(after.filter(col("o_month").isin("1995-01", "1995-02")).count() === 0)
    val st = CommitLog.requireState(spark, table)
    assert(!st.partitionModes.contains("o_month=1995-01"))
    assert(st.latest.operation === "delete_partition")
    val fs = CommitLog.fs(spark, table)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Archive.dataDir(table, st.latest.commitTime), "o_month=1995-01")))
  }

  test("readAsOf before the drop still serves the dropped partitions; rollback restores them") {
    val table = tmpDir("tbl"); boot(table)
    val before = CommitLog.requireState(spark, table).latest.commitTime
    val want = KeyedTable.read(spark, table).filter(col("o_month") === "1995-03").count()
    assert(want > 0)
    KeyedTable.dropPartitions(spark, table, Seq("o_month=1995-03"))

    assert(KeyedTable.readAsOf(spark, table, before)
      .filter(col("o_month") === "1995-03").count() === want)

    KeyedTable.rollback(spark, table, before)
    assert(KeyedTable.read(spark, table).filter(col("o_month") === "1995-03").count() === want)
    assert(CommitLog.requireState(spark, table).partitionModes.contains("o_month=1995-03"))
  }

  test("readChanges surfaces every dropped row as a delete; TableSync converges") {
    val tmp = tmpDir("sync"); val src = s"$tmp/src"; val dst = s"$tmp/dst"
    val b = boot(src)
    boot(dst)
    val want = KeyedTable.read(spark, src).filter(col("o_month") === "1995-04").count()
    assert(want > 0)
    KeyedTable.dropPartitions(spark, src, Seq("o_month=1995-04"))

    val ch = KeyedTable.readChanges(spark, src, b.commitTime)
    assert(ch.filter(col(KeyedTable.ChangeOp) === "delete").count() === want)

    TableSync.sync(spark, src, dst, b.commitTime)
    assert(KeyedTable.read(spark, dst).filter(col("o_month") === "1995-04").count() === 0)
    assert(KeyedTable.read(spark, dst).count() === KeyedTable.read(spark, src).count())
  }

  test("a later write re-creates a dropped partition") {
    val table = tmpDir("tbl"); boot(table)
    val base = KeyedTable.read(spark, table)
    val rows = base.filter(col("o_month") === "1995-05")
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*).limit(5)
      .collect()
    KeyedTable.dropPartitions(spark, table, Seq("o_month=1995-05"))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq),
      base.select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*).schema)
    KeyedTable.append(spark, table, batch, WriteOperation.BulkInsert)
    assert(KeyedTable.read(spark, table).filter(col("o_month") === "1995-05").count() === 5)
    assert(CommitLog.requireState(spark, table).partitionModes("o_month=1995-05") === "native")
  }

  test("refusals: unknown, metadata-only, and delta-touched partitions") {
    val table = tmpDir("tbl"); boot(table)
    intercept[GraftException](KeyedTable.dropPartitions(spark, table, Seq("o_month=2099-01")))

    val metaT = tmpDir("meta"); boot(metaT, bt = BootstrapType.MetadataOnly)
    val someP = CommitLog.requireState(spark, metaT).metadataOnlyPartitions.head
    intercept[GraftException](KeyedTable.dropPartitions(spark, metaT, Seq(someP)))

    val morT = tmpDir("mor"); boot(morT, tt = TableType.MergeOnRead)
    val b = KeyedTable.read(spark, morT)
    val upd = b.filter(col("o_month") === "1995-06").limit(2)
      .select(b.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit("D"))
    KeyedTable.upsert(spark, morT, upd) // live delta on 1995-06
    intercept[GraftException](KeyedTable.dropPartitions(spark, morT, Seq("o_month=1995-06")))
    KeyedTable.compact(spark, morT)
    KeyedTable.dropPartitions(spark, morT, Seq("o_month=1995-06")) // now fine
    assert(KeyedTable.read(spark, morT).filter(col("o_month") === "1995-06").count() === 0)
  }

  test("clusterSort preserves content and tightens leading-column file ranges") {
    // unpartitioned: the range partitioning spans the whole key space, so
    // each file covers a narrow o_custkey band (a month-partitioned fixture
    // this small yields one file per partition — nothing to skip within)
    val table = tmpDir("tbl"); boot(table, parts = Nil)
    val before = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
    KeyedTable.clusterSort(spark, table, Seq("o_custkey"), maxRecordsPerFile = 200)
    val after = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
    assert(after.toSeq === before.toSeq)

    // sorted layout → a selective range on the sort column skips most files
    StatsIndex.build(spark, table, Seq("o_custkey"))
    val pr = StatsIndex.prune(spark, table, "o_custkey", Some(100L), Some(120L))
    assert(pr.totalFiles > 4 && pr.skippedFiles > pr.totalFiles / 2,
      s"sorted+indexed range kept ${pr.kept.size}/${pr.totalFiles}")
  }
}
