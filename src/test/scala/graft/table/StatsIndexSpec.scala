package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, GraftException}

class StatsIndexSpec extends SparkTestBase {

  private def ordersWithMonth(outDir: String): String = {
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  private def cfg(input: String, table: String, parts: Seq[String] = Seq("o_month")) =
    BootstrapConfig(
      dataFilePath = input, tablePath = table, tableName = "orders_t",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = parts)

  private def boot(parts: Seq[String] = Seq("o_month")): String = {
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(ordersWithMonth(tmpDir("in")), table, parts))
    table
  }

  test("sidecar rows: one per (file, column); min/max match the data exactly") {
    val table = boot()
    StatsIndex.build(spark, table, Seq("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"))
    val fs = CommitLog.fs(spark, table)
    val files = StatsIndex.listBaseFiles(fs, table)
    val ct = StatsIndex.latestIndex(spark, table).get
    val sc = spark.read.parquet(StatsIndex.statsDir(table, ct).toString)
    assert(sc.count() === files.size.toLong * 4)
    assert(sc.filter(!col("has_stats")).count() === 0)

    // footer mins/maxes must agree with a full scan, per file and globally
    val truth = spark.read.parquet(files: _*)
      .agg(min("o_orderkey"), max("o_orderkey"), min("o_totalprice"), max("o_totalprice"),
        min("o_orderstatus"), max("o_orderstatus")).head()
    val idx = sc.filter(col("column") === "o_orderkey")
      .agg(min(col("min_val").cast("long")), max(col("max_val").cast("long"))).head()
    assert(idx.getLong(0) === truth.getLong(0) && idx.getLong(1) === truth.getLong(1))
    val idxP = sc.filter(col("column") === "o_totalprice")
      .agg(min(col("min_val").cast("double")), max(col("max_val").cast("double"))).head()
    assert(idxP.getDouble(0) === truth.getDouble(2) && idxP.getDouble(1) === truth.getDouble(3))
    val idxS = sc.filter(col("column") === "o_orderstatus")
      .agg(min("min_val"), max("max_val")).head()
    assert(idxS.getString(0) === truth.getString(4) && idxS.getString(1) === truth.getString(5))
  }

  test("timestamp stats round-trip through the string encoding (NTZ micros)") {
    val table = boot()
    StatsIndex.build(spark, table, Seq("o_orderdate"))
    val ct = StatsIndex.latestIndex(spark, table).get
    val sc = spark.read.parquet(StatsIndex.statsDir(table, ct).toString)
      .filter(col("column") === "o_orderdate")
    val dt = spark.read.parquet(sf("orders")).schema("o_orderdate").dataType
    val idx = sc.agg(min(col("min_val").cast(dt)), max(col("max_val").cast(dt))).head()
    val truth = KeyedTable.read(spark, table).agg(min("o_orderdate"), max("o_orderdate")).head()
    assert(idx.get(0) === truth.get(0) && idx.get(1) === truth.get(1))
  }

  test("readBetween prunes files after z-order clustering and matches the filtered snapshot") {
    val table = boot()
    // many small files so there is something to skip, laid out by o_custkey
    KeyedTable.clusterZ(spark, table, Seq("o_custkey"), maxRecordsPerFile = 200)
    StatsIndex.build(spark, table, Seq("o_custkey"))
    val pr = StatsIndex.prune(spark, table, "o_custkey", Some(100L), Some(120L))
    assert(pr.indexedAt.nonEmpty)
    assert(pr.totalFiles > 4, s"expected many files, got ${pr.totalFiles}")
    assert(pr.skippedFiles > 0, s"z-ordered + indexed range read skipped nothing (${pr.totalFiles} files)")

    val got = KeyedTable.readBetween(spark, table, "o_custkey", Some(100L), Some(120L))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
    val want = KeyedTable.read(spark, table)
      .filter(col("o_custkey").between(100L, 120L))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("multi-column ranges prune more than either column alone and stay exact") {
    val table = boot()
    // Morton layout over both columns: every file gets a bounded range on each
    KeyedTable.clusterZ(spark, table, Seq("o_custkey", "o_totalprice"), maxRecordsPerFile = 200)
    StatsIndex.build(spark, table, Seq("o_custkey", "o_totalprice"))
    val rCust: (String, Option[Any], Option[Any]) = ("o_custkey", Some(100L), Some(400L))
    val rPrice: (String, Option[Any], Option[Any]) = ("o_totalprice", Some(50000.0), Some(100000.0))
    val a = StatsIndex.prune(spark, table, Seq(rCust))
    val b = StatsIndex.prune(spark, table, Seq(rPrice))
    val both = StatsIndex.prune(spark, table, Seq(rCust, rPrice))
    assert(a.skippedFiles > 0 && b.skippedFiles > 0)
    assert(both.skippedFiles >= math.max(a.skippedFiles, b.skippedFiles))
    assert(both.kept.toSet === (a.kept.toSet intersect b.kept.toSet))

    val got = KeyedTable.readWhere(spark, table, Seq(rCust, rPrice))
      .select("o_orderkey").orderBy("o_orderkey").collect()
    val want = KeyedTable.read(spark, table)
      .filter(col("o_custkey").between(100L, 400L) &&
        col("o_totalprice").between(50000.0, 100000.0))
      .select("o_orderkey").orderBy("o_orderkey").collect()
    assert(got.toSeq === want.toSeq && got.nonEmpty)
  }

  test("live MOR deltas: untouched partitions stay stats-pruned, touched ones merge") {
    val table = tmpDir("tbl-hybrid")
    KeyedTable.bootstrap(spark, cfg(ordersWithMonth(tmpDir("in")), table)
      .copy(tableType = graft.model.TableType.MergeOnRead))
    StatsIndex.build(spark, table, Seq("o_totalprice"))
    val base = KeyedTable.read(spark, table)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    val month = base.select("o_month").orderBy("o_month").head().getString(0)
    // the delta touches ONLY `month`, writing a sentinel beyond every base value
    val nUpd = base.filter(col("o_month") === month && col("o_orderkey") % 3 === 0).count()
    KeyedTable.upsert(spark, table,
      base.filter(col("o_month") === month && col("o_orderkey") % 3 === 0)
        .select(dataCols: _*).withColumn("o_totalprice", lit(9999999.5)))
    assert(Deltas.committedLive(spark, table, CommitLog.requireState(spark, table)).nonEmpty)

    // the sentinel bound proves BOTH halves: the index skips every base file
    // (no base row reaches it), yet the fresh delta rows are found — only
    // the touched-partition merge path can have produced them
    val pr = StatsIndex.prune(spark, table, Seq(("o_totalprice", Some(9999999.0), None)))
    assert(pr.skippedFiles > 0 && pr.kept.isEmpty)
    val got = KeyedTable.readBetween(spark, table, "o_totalprice", Some(9999999.0), None)
    assert(got.count() === nUpd && nUpd > 0)

    // and a general range equals the filtered snapshot exactly (both halves
    // contribute: untouched pruned scans + the merged touched partition)
    val expect = KeyedTable.read(spark, table)
      .filter(col("o_totalprice") >= 100000.0 && col("o_totalprice") <= 200000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val hybrid = KeyedTable.readBetween(spark, table, "o_totalprice",
        Some(100000.0), Some(200000.0))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(hybrid === expect && expect.nonEmpty)
  }

  test("files appended after the index are never skipped; rebuild covers them") {
    val table = boot()
    StatsIndex.build(spark, table, Seq("o_custkey"))
    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(5)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("o_custkey", lit(999999L)) // outside every indexed range
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    val got = KeyedTable.readBetween(spark, table, "o_custkey", Some(999999L), None)
    assert(got.count() === 5) // unindexed files kept → new rows visible
    // a low range keeps the unindexed appended files too (no proof they miss)
    val prLow = StatsIndex.prune(spark, table, "o_custkey", Some(1L), Some(100L))

    StatsIndex.build(spark, table, Seq("o_custkey"))
    val prLow2 = StatsIndex.prune(spark, table, "o_custkey", Some(1L), Some(100L))
    assert(prLow2.skippedFiles > prLow.skippedFiles) // appended files now provably out of range
    assert(KeyedTable.readBetween(spark, table, "o_custkey", Some(999999L), None).count() === 5)
  }

  test("all-null columns are skippable; open bounds exclude nulls like SQL ranges") {
    val in = tmpDir("in")
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("maybe", when(col("o_month") === "1995-01", col("o_custkey")))
      .write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table))
    StatsIndex.build(spark, table, Seq("maybe"))
    val pr = StatsIndex.prune(spark, table, "maybe", None, None)
    assert(pr.skippedFiles > 0, "files of all-null partitions should be skipped")
    val got = KeyedTable.readBetween(spark, table, "maybe", None, None).count()
    val want = KeyedTable.read(spark, table).filter(col("maybe").isNotNull).count()
    assert(got === want)
  }

  test("rollback undoes an index_stats commit and drops its sidecar") {
    val table = boot()
    val before = CommitLog.requireState(spark, table).latest.commitTime
    val ct = StatsIndex.build(spark, table, Seq("o_custkey"))
    assert(StatsIndex.latestIndex(spark, table) === Some(ct))
    KeyedTable.rollback(spark, table, before)
    assert(StatsIndex.latestIndex(spark, table) === None)
    assert(!CommitLog.fs(spark, table).exists(StatsIndex.statsDir(table, ct)))
    // and a pruned read still answers correctly with no index
    assert(KeyedTable.readBetween(spark, table, "o_custkey", Some(1L), None).count() ===
      KeyedTable.read(spark, table).filter(col("o_custkey") >= 1L).count())
  }

  test("partition columns and unsupported types are rejected") {
    val table = boot()
    intercept[GraftException](StatsIndex.build(spark, table, Seq("o_month")))
    intercept[GraftException](StatsIndex.build(spark, table, Seq("nope")))
  }

  test("incremental rebuild: same columns carry over, sidecar covers every live file") {
    val table = boot()
    StatsIndex.build(spark, table, Seq("o_custkey"))
    val c1 = StatsIndex.latestIndex(spark, table).get
    val before = spark.read.parquet(StatsIndex.statsDir(table, c1).toString)
      .orderBy("file").collect().map(r => (r.getString(0), r.getString(3), r.getString(4)))

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(4)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    StatsIndex.build(spark, table, Seq("o_custkey"))
    val c2 = StatsIndex.latestIndex(spark, table).get
    val after = spark.read.parquet(StatsIndex.statsDir(table, c2).toString)
    val fs = CommitLog.fs(spark, table)
    val live = StatsIndex.listBaseFiles(fs, table)
    // complete coverage of the grown table...
    assert(after.select("file").distinct().count() === live.size)
    // ...and the carried rows are bit-identical to the first build
    val carried = after.orderBy("file").collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4)))
      .filter(t => before.exists(_._1 == t._1))
    assert(carried.toSeq === before.toSeq)
  }

  test("rebuilding replaces the sidecar; only the newest survives") {
    val table = boot()
    val c1 = StatsIndex.build(spark, table, Seq("o_custkey"))
    val c2 = StatsIndex.build(spark, table, Seq("o_custkey", "o_totalprice"))
    val fs = CommitLog.fs(spark, table)
    assert(!fs.exists(StatsIndex.statsDir(table, c1)))
    assert(fs.exists(StatsIndex.statsDir(table, c2)))
    assert(StatsIndex.indexedColumns(spark, table) === Seq("o_custkey", "o_totalprice"))
  }

  test("index.auto: every publish refreshes the sidecar — pruning survives writes " +
      "with NO manual build") {
    val table = boot()
    StatsIndex.build(spark, table, Seq("o_custkey"))
    TableProperties.set(spark, table, Map(TableProperties.IndexAuto -> "true"))
    val fs = CommitLog.fs(spark, table)
    val filesBefore = StatsIndex.listBaseFiles(fs, table).toSet

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(5)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("o_custkey", lit(999999L)) // provably outside every low range
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    // the publish itself refreshed the index: complete live coverage...
    val live = StatsIndex.listBaseFiles(fs, table)
    val appended = live.toSet -- filesBefore
    assert(appended.nonEmpty)
    val ct = StatsIndex.latestIndex(spark, table).get
    val sc = spark.read.parquet(StatsIndex.statsDir(table, ct).toString)
    assert(sc.select("file").distinct().count() === live.size)
    // ...and a low-range read OPENS NONE of the appended files (an unseen
    // file would have to be kept) while staying exact
    val pr = StatsIndex.prune(spark, table, "o_custkey", Some(1L), Some(100L))
    assert(pr.kept.toSet.intersect(appended).isEmpty)
    assert(KeyedTable.readBetween(spark, table, "o_custkey", Some(999999L), None).count() === 5)

    // bounded publish overhead: a second identical-coverage check stamps no
    // new instant (the refresh early-exits when no base files changed)
    val before = StatsIndex.latestIndex(spark, table)
    assert(StatsIndex.refresh(spark, table) === before)
  }

  test("index.auto on MOR: delta commits early-exit; compaction re-covers the new base files") {
    val in = ordersWithMonth(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "orders_t",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = graft.model.TableType.MergeOnRead))
    StatsIndex.build(spark, table, Seq("o_custkey"))
    TableProperties.set(spark, table, Map(TableProperties.IndexAuto -> "true"))
    val idxAfterBuild = StatsIndex.latestIndex(spark, table)

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(3)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_custkey", lit(888888L))
    KeyedTable.upsert(spark, table, batch)
    // a MOR delta adds no base files: the refresh stamped NO new instant
    assert(StatsIndex.latestIndex(spark, table) === idxAfterBuild)
    // ...and hybrid reads stay correct under the live delta
    assert(KeyedTable.readBetween(spark, table, "o_custkey", Some(888888L), None).count() === 3)

    KeyedTable.compact(spark, table)
    // compaction rewrote base files; the auto-refresh re-covered them
    val fs = CommitLog.fs(spark, table)
    val live = StatsIndex.listBaseFiles(fs, table)
    val ct = StatsIndex.latestIndex(spark, table).get
    assert(ct > idxAfterBuild.get)
    val sc = spark.read.parquet(StatsIndex.statsDir(table, ct).toString)
    assert(sc.select("file").distinct().count() === live.size)
    assert(KeyedTable.readBetween(spark, table, "o_custkey", Some(888888L), None).count() === 3)
  }

  test("index.auto auto-CREATE: declared stats/bloom columns build at the first " +
      "publish — a fresh table is self-indexing with no manual build ever") {
    val table = boot()
    TableProperties.set(spark, table, Map(
      TableProperties.IndexAuto -> "true",
      TableProperties.IndexStatsColumns -> "o_custkey",
      TableProperties.IndexBloomColumns -> "_hoodie_record_key, o_orderpriority"))
    assert(StatsIndex.latestIndex(spark, table).isEmpty)

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(2)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("o_custkey", lit(999999L))
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    // the publish created all three declared sidecars...
    assert(StatsIndex.indexedColumns(spark, table) === Seq("o_custkey"))
    assert(BloomIndex.latestIndex(spark, table).isDefined) // record-key bloom
    assert(BloomIndex.latestIndex(spark, table, "o_orderpriority").isDefined)
    // ...with full live coverage, and reads prune through them correctly
    val fs = CommitLog.fs(spark, table)
    val live = StatsIndex.listBaseFiles(fs, table)
    val sc = spark.read.parquet(
      StatsIndex.statsDir(table, StatsIndex.latestIndex(spark, table).get).toString)
    assert(sc.select("file").distinct().count() === live.size)
    assert(KeyedTable.readBetween(spark, table, "o_custkey", Some(999999L), None).count() === 2)
    assert(BloomIndex.readByKeys(spark, table, Seq("900000", "900001")).count() === 2)
  }

  test("index.auto follows a T39 rename of the indexed column") {
    val table = boot()
    StatsIndex.build(spark, table, Seq("o_custkey"))
    TableProperties.set(spark, table, Map(TableProperties.IndexAuto -> "true"))
    KeyedTable.renameColumn(spark, table, "o_custkey", "cust")

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(4)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("cust", lit(999999L))
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    // the refresh resolved the stored physical column through the rename
    val fs = CommitLog.fs(spark, table)
    val live = StatsIndex.listBaseFiles(fs, table)
    val ct = StatsIndex.latestIndex(spark, table).get
    val sc = spark.read.parquet(StatsIndex.statsDir(table, ct).toString)
    assert(sc.select("file").distinct().count() === live.size)
    assert(KeyedTable.readBetween(spark, table, "cust", Some(999999L), None).count() === 4)
  }
}
