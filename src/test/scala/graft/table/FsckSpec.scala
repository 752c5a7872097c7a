package graft.table

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}

class FsckSpec extends SparkTestBase {

  private def boot(tableType: TableType = TableType.CopyOnWrite): String = {
    val in = tmpDir("in")
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "orders_t",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = tableType))
    table
  }

  private def fsOf(table: String) = CommitLog.fs(spark, table)

  test("fsck on a healthy table reports clean and repairs nothing") {
    val table = boot()
    val before = KeyedTable.read(spark, table).count()
    val report = KeyedTable.fsck(spark, table)
    assert(report.clean)
    assert(KeyedTable.read(spark, table).count() === before)
  }

  test("fsck removes orphan staging and uncommitted delta dirs") {
    val table = boot(TableType.MergeOnRead)
    val fs = fsOf(table)
    val before = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect()

    // (a) a staging dir from a writer killed before its swap
    val staging = new Path(s"$table/${CommitLog.LogDirName}/staging-99990101000000")
    fs.mkdirs(staging)
    // (b) a delta dir whose commit JSON never landed
    val base = KeyedTable.read(spark, table)
    val batch = base.filter(col("o_orderkey") === 17L)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit("GHOST"))
    KeyedTable.upsert(spark, table, batch) // real delta commit...
    val ghostCt = Deltas.liveCommits(spark, table).last
    fs.delete(new Path(s"$table/${CommitLog.LogDirName}/$ghostCt.commit.json"), false)

    val dryRun = KeyedTable.fsck(spark, table, repair = false)
    assert(dryRun.orphanStaging === Seq("staging-99990101000000"))
    assert(dryRun.orphanDeltas === Seq(ghostCt))
    assert(fs.exists(staging)) // report-only mode touched nothing

    val report = KeyedTable.fsck(spark, table)
    assert(report.orphanStaging === Seq("staging-99990101000000"))
    assert(report.orphanDeltas === Seq(ghostCt))
    assert(!fs.exists(staging))
    assert(!fs.exists(Deltas.dir(table, ghostCt)))
    // the uncommitted delta's row is gone from the snapshot
    assert(KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect()
      .toSeq === before.toSeq)
    assert(KeyedTable.fsck(spark, table).clean)
  }

  test("fsck restores the pre-images of an aborted rewrite, half-swapped or not") {
    val table = boot()
    val fs = fsOf(table)
    val before = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month", "o_orderstatus").orderBy("o_orderkey").collect()

    // simulate a rewrite that died mid-swap: two partitions stashed in the
    // archive under an uncommitted ct; one of them already replaced by a
    // half-written swap, the other's swap never happened (dir missing)
    val parts = CommitLog.requireState(spark, table).nativePartitions.take(2)
    val ct = "99990202000000"
    parts.foreach { p =>
      Archive.stash(fs, table, ct, PathCodec.escape(p),
        new Path(s"$table/${PathCodec.escape(p)}"))
    }
    // half-swapped replacement for the first partition: junk data
    val junk = new Path(s"$table/${PathCodec.escape(parts.head)}")
    fs.mkdirs(junk)
    fs.create(new Path(junk, "part-junk.parquet"), true).close()

    val report = KeyedTable.fsck(spark, table)
    assert(report.abortedRewrites === Seq(ct))
    assert(!Archive.exists(fs, table, ct))
    val after = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month", "o_orderstatus").orderBy("o_orderkey").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("fsck removes a partition the aborted rewrite created (no pre-image to restore)") {
    val table = boot()
    val fs = fsOf(table)
    val before = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month").orderBy("o_orderkey").collect()

    // rewrite marked its archive, swapped a brand-new partition in (nothing
    // stashed — the partition did not exist before), then died pre-commit
    val ct = "99990303000000"
    Archive.mark(fs, table, ct)
    val created = new Path(s"$table/o_month=2099-12")
    fs.mkdirs(created)
    fs.create(new Path(created, "part-aborted.parquet"), true).close()

    val report = KeyedTable.fsck(spark, table)
    assert(report.abortedRewrites === Seq(ct))
    assert(!fs.exists(created)) // uncommitted data must not survive repair
    assert(!Archive.exists(fs, table, ct))
    assert(KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month").orderBy("o_orderkey").collect()
      .toSeq === before.toSeq)
  }

  test("compactIfNeeded: quiet below thresholds, fires on commit count and on byte ratio") {
    val table = boot(TableType.MergeOnRead)
    assert(KeyedTable.compactIfNeeded(spark, table).isEmpty) // no deltas at all

    val base = KeyedTable.read(spark, table)
    // materialized: compaction below replaces the files this plan reads
    val batch = spark.createDataFrame(
      base.filter(col("o_orderkey") % 100 === 0)
        .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
        .withColumn("o_orderstatus", lit("C"))
        .collect().toSeq.asJava,
      base.select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
        .withColumn("o_orderstatus", lit("C")).schema)
    val batchCount = batch.count()
    KeyedTable.upsert(spark, table, batch)

    // one small delta: below both a loose ratio and a loose commit bound
    assert(KeyedTable.compactIfNeeded(spark, table,
      maxDeltaRatio = 0.9, maxDeltaCommits = 10).isEmpty)
    assert(Deltas.liveCommits(spark, table).nonEmpty)

    // commit-count trigger
    val byCount = KeyedTable.compactIfNeeded(spark, table,
      maxDeltaRatio = 0.9, maxDeltaCommits = 1)
    assert(byCount.nonEmpty && byCount.get.nonEmpty)
    assert(Deltas.liveCommits(spark, table).isEmpty)
    val compacted = KeyedTable.read(spark, table)
      .filter(col("o_orderstatus") === "C").count()
    assert(compacted === batchCount)

    // byte-ratio trigger
    KeyedTable.upsert(spark, table, batch.withColumn("o_orderstatus", lit("D")))
    val byRatio = KeyedTable.compactIfNeeded(spark, table,
      maxDeltaRatio = 0.0000001, maxDeltaCommits = 100)
    assert(byRatio.nonEmpty)
    assert(Deltas.liveCommits(spark, table).isEmpty)
  }

  test("compact.auto property: delta chains fold inline once they cross the " +
      "commit-count threshold; quiet below it and for non-delta publishes") {
    val table = boot(TableType.MergeOnRead)
    TableProperties.set(spark, table, Map(
      TableProperties.CompactAuto -> "true",
      TableProperties.CompactAutoDeltas -> "2",
      TableProperties.CompactAutoRatio -> "0.9")) // ratio loose: count triggers
    val base = KeyedTable.read(spark, table)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    // materialized ONCE: the auto compaction below swaps the files the
    // lazy `base` plan would otherwise re-read
    val snap = spark.createDataFrame(
      base.filter(col("o_orderkey") % 100 === 0).select(dataCols: _*)
        .collect().toSeq.asJava,
      base.select(dataCols: _*).schema)
    def batch(tag: String) = snap.withColumn("o_orderstatus", lit(tag))

    // first delta: below the 2-commit bound — no auto compaction
    KeyedTable.upsert(spark, table, batch("A"))
    assert(Deltas.liveCommits(spark, table).size === 1)
    assert(!CommitLog.commits(spark, table).exists(_.operation == "compact"))

    // second delta crosses the bound: the publish hook folds both
    KeyedTable.upsert(spark, table, batch("B"))
    assert(Deltas.liveCommits(spark, table).isEmpty)
    assert(CommitLog.commits(spark, table).count(_.operation == "compact") === 1)
    assert(KeyedTable.read(spark, table)
      .filter(col("o_orderstatus") === "B").count() === batch("B").count())

    // the maintenance journal recorded BOTH outcomes (below-threshold and
    // the fold), newest wins
    val entry = MaintenanceLog.read(spark, table)
      .find(_.service == TableProperties.CompactAuto)
    assert(entry.exists(e => e.outcome == "ok" && e.detail.startsWith("compacted=[")),
      s"journal: $entry")

    // unset → chains accumulate again (manual control restored)
    TableProperties.unset(spark, table, Seq(TableProperties.CompactAuto))
    KeyedTable.upsert(spark, table, batch("C"))
    KeyedTable.upsert(spark, table, batch("D"))
    assert(Deltas.liveCommits(spark, table).size === 2)
  }

  test("crashed create: fsck restores the moved-aside table; stale siblings sweep") {
    val table = boot()
    val fs = fsOf(table)
    val before = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect()

    // crash window: create() moved the old table aside and promoted its
    // staging, but died before the bootstrap commit landed — the live path
    // holds data with NO commit log, the pre-image sits in `.replaced-<ct>`
    val replaced = new Path(s"$table.replaced-99990101000000000")
    assert(fs.rename(new Path(table), replaced))
    fs.mkdirs(new Path(table))
    fs.createNewFile(new Path(table, "part-00000.parquet"))

    val report = KeyedTable.fsck(spark, table)
    assert(report.createSiblings.exists(_.contains("replaced")))
    assert(!fs.exists(replaced))
    val after = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect()
    assert(after === before)

    // stale siblings of FINISHED or earlier-crashed creates on a healthy
    // table (a staging from a death before the swap; a replaced pre-image
    // whose create committed) are swept, and the table is untouched
    val staleStaging = new Path(s"$table.staging-create-99990101000000001")
    val staleReplaced = new Path(s"$table.replaced-99990101000000002")
    fs.mkdirs(staleStaging)
    fs.mkdirs(staleReplaced)
    val report2 = KeyedTable.fsck(spark, table)
    assert(report2.createSiblings.size === 2)
    assert(!fs.exists(staleStaging) && !fs.exists(staleReplaced))
    assert(KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect() === before)
    assert(KeyedTable.fsck(spark, table).clean)
  }

  test("create over an existing table survives: old table moves aside, commit lands, siblings gone") {
    val table = boot()
    val fs = fsOf(table)
    val rows = KeyedTable.read(spark, table)
    val dataCols = rows.columns.filterNot(_.startsWith("_")).map(col).toSeq
    val smaller = rows.select(dataCols: _*).filter(col("o_orderkey") % 2 === 0)
    val expect = smaller.count()
    KeyedTable.create(spark, table, smaller, "orders_t",
      Seq("o_orderkey"), "o_orderdate", Seq("o_month"))
    assert(KeyedTable.read(spark, table).count() === expect)
    // no sibling litter after a successful overwrite-create
    val parent = new Path(table).getParent
    val leftovers = fs.listStatus(parent).map(_.getPath.getName)
      .filter(n => n.startsWith(s"${new Path(table).getName}.staging-create-") ||
        n.startsWith(s"${new Path(table).getName}.replaced-"))
    assert(leftovers.isEmpty)
  }
}
