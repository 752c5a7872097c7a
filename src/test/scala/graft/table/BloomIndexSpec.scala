package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}

class BloomIndexSpec extends SparkTestBase {

  private def ordersWithMonth(outDir: String): String = {
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  private def boot(tableType: TableType = TableType.CopyOnWrite): String = {
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = ordersWithMonth(tmpDir("in")), tablePath = table, tableName = "orders_t",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = tableType))
    table
  }

  test("point lookup: bloom prunes most files and the answer matches a full filter") {
    val table = boot()
    BloomIndex.build(spark, table)
    val keys = Seq("17", "400", "1200")
    val pr = BloomIndex.candidateFiles(spark, table, keys)
    assert(pr.indexedAt.nonEmpty)
    assert(pr.totalFiles > 10)
    // 3 keys live in ≤3 files; fpp 1% keeps false positives to a handful
    assert(pr.kept.size < pr.totalFiles / 2,
      s"kept ${pr.kept.size} of ${pr.totalFiles} — bloom pruned almost nothing")

    val got = BloomIndex.readByKeys(spark, table, keys)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
    val want = KeyedTable.read(spark, table)
      .filter(col("o_orderkey").isin(17L, 400L, 1200L))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect()
    assert(got.toSeq === want.toSeq && got.nonEmpty)
  }

  test("missing keys: empty result, not an error; absent index keeps all files") {
    val table = boot()
    val prNoIdx = BloomIndex.candidateFiles(spark, table, Seq("999999999"))
    assert(prNoIdx.skippedFiles === 0 && prNoIdx.indexedAt.isEmpty)
    BloomIndex.build(spark, table)
    assert(BloomIndex.readByKeys(spark, table, Seq("999999999")).count() === 0)
  }

  test("files appended after the index stay visible to lookups") {
    val table = boot()
    BloomIndex.build(spark, table)
    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(2)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)
    val got = BloomIndex.readByKeys(spark, table, Seq("900001", "900002", "900003"))
    assert(got.count() === batch.filter(col("o_orderkey").isin(900001L, 900002L, 900003L)).count())
    assert(got.count() > 0)
  }

  test("incremental rebuild: unchanged files' blooms carry over byte-identical, new files scanned") {
    val table = boot()
    val ct1 = BloomIndex.build(spark, table)
    def sidecar(ct: String) = spark.read.parquet(BloomIndex.bloomDir(table, ct).toString)
      .select("file", "key_count", "bloom").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    val side1 = sidecar(ct1)

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(3)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("o_month", lit("2098-01"))
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    val ct2 = BloomIndex.build(spark, table)
    val side2 = sidecar(ct2)
    // every pre-append file's row is the carried original, not a rescan
    side1.foreach { case (f, v) => assert(side2(f) === v, f) }
    assert(side2.size > side1.size) // the appended file got its own bloom
    // and lookups against the refreshed index prune + answer correctly
    val pr = BloomIndex.candidateFiles(spark, table, Seq("900001"))
    assert(pr.skippedFiles > 0)
    assert(BloomIndex.readByKeys(spark, table, Seq("900001")).count() ===
      batch.filter(col("o_orderkey") === 900001L).count())
  }

  test("global upsert with a bloom index: moves resolve identically to the unindexed path") {
    val tNoIdx = boot()
    val tIdx = boot()
    BloomIndex.build(spark, tIdx)
    assert(BloomIndex.latestIndex(spark, tIdx).nonEmpty)

    // move three keys to a new month and update a fourth in place
    def batch(t: String) = {
      val b = KeyedTable.read(spark, t)
      b.filter(col("o_orderkey").isin(17L, 400L, 1200L, 3000L))
        .select(b.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
        .withColumn("o_month",
          when(col("o_orderkey") === 3000L, col("o_month")).otherwise(lit("2099-01")))
        .withColumn("o_orderstatus", lit("Z"))
    }
    KeyedTable.upsertGlobal(spark, tNoIdx, batch(tNoIdx))
    KeyedTable.upsertGlobal(spark, tIdx, batch(tIdx))

    def state(t: String) = KeyedTable.read(spark, t)
      .select("o_orderkey", "o_month", "o_orderstatus")
      .orderBy("o_orderkey", "o_month").collect().toSeq
    assert(state(tIdx) === state(tNoIdx))
    // the moved keys live ONLY in the new partition
    val moved = KeyedTable.read(spark, tIdx).filter(col("o_orderkey") === 17L).collect()
    assert(moved.length === 1 && moved.head.getAs[String]("o_month") === "2099-01")
  }

  test("MOR live deltas: touched partitions merge, untouched keys stay bloom-pruned") {
    val table = boot(TableType.MergeOnRead)
    BloomIndex.build(spark, table)
    val base = KeyedTable.read(spark, table)
    val upd = base.filter(col("o_orderkey") === 17L)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit("Q"))
    KeyedTable.upsert(spark, table, upd) // delta commit, not compacted
    // the updated key resolves through the touched-partition merge
    val got = BloomIndex.readByKeys(spark, table, Seq("17"))
    assert(got.count() === 1 && got.head().getAs[String]("o_orderstatus") === "Q")
    // a key in an UNTOUCHED partition resolves through the pruned file path
    // and still matches the merged-snapshot truth
    val touchedMonth = upd.select("o_month").head().getString(0)
    val other = base.filter(col("o_month") =!= touchedMonth)
      .select("o_orderkey").head().getLong(0)
    val got2 = BloomIndex.readByKeys(spark, table, Seq(other.toString))
    val want2 = KeyedTable.read(spark, table)
      .filter(col("o_orderkey") === other).collect().toSeq
    assert(got2.collect().toSeq === want2 && want2.size === 1)
  }

  test("secondary index on a non-key column: per-column independence and pruned lookups") {
    val table = boot()
    BloomIndex.build(spark, table) // record key
    BloomIndex.build(spark, table, logicalColumn = "o_custkey") // secondary
    // both survive the per-column cleaner
    assert(BloomIndex.latestIndex(spark, table).nonEmpty)
    assert(BloomIndex.latestIndex(spark, table, "o_custkey").nonEmpty)

    val some = KeyedTable.read(spark, table).filter(col("o_custkey") === 55L)
    val want = some.count()
    val pr = BloomIndex.candidateFiles(spark, table, Seq("55"), "o_custkey")
    assert(pr.indexedAt.nonEmpty && pr.skippedFiles > 0)
    val got = BloomIndex.readByValues(spark, table, "o_custkey", Seq("55"))
    assert(got.count() === want)
    // probing an unindexed column prunes nothing but still answers
    val prNone = BloomIndex.candidateFiles(spark, table, Seq("F"), "o_orderstatus")
    assert(prNone.indexedAt.isEmpty && prNone.skippedFiles === 0)
    assert(BloomIndex.readByValues(spark, table, "o_orderstatus", Seq("F")).count() ===
      KeyedTable.read(spark, table).filter(col("o_orderstatus") === "F").count())
    // a rebuild of the key index must not clean the secondary sidecar
    BloomIndex.build(spark, table)
    assert(BloomIndex.latestIndex(spark, table, "o_custkey").nonEmpty)
    intercept[graft.model.GraftException](BloomIndex.build(spark, table, logicalColumn = "o_month"))
  }

  test("rollback drops the bloom sidecar with its commit") {
    val table = boot()
    val before = CommitLog.requireState(spark, table).latest.commitTime
    val ct = BloomIndex.build(spark, table)
    KeyedTable.rollback(spark, table, before)
    assert(BloomIndex.latestIndex(spark, table) === None)
    assert(!CommitLog.fs(spark, table).exists(BloomIndex.bloomDir(table, ct)))
  }

  test("rebuild replaces the sidecar; only the newest survives") {
    val table = boot()
    val c1 = BloomIndex.build(spark, table)
    val c2 = BloomIndex.build(spark, table, fpp = 0.05)
    val fs = CommitLog.fs(spark, table)
    assert(!fs.exists(BloomIndex.bloomDir(table, c1)) && fs.exists(BloomIndex.bloomDir(table, c2)))
  }

  test("point predicates prune through the bloom on the generic read path: " +
      "readWhere equality (and SQL WHERE =) opens only bloom-positive files") {
    val table = boot()
    // secondary bloom only — NO stats index, and custkey is unclustered so
    // min/max ranges could not have pruned anyway
    BloomIndex.build(spark, table, logicalColumn = "o_custkey")
    val v = KeyedTable.read(spark, table).select("o_custkey").head().getLong(0)
    val df = KeyedTable.readWhere(spark, table, Seq(("o_custkey", Some(v), Some(v))))
    val total = StatsIndex.listBaseFiles(CommitLog.fs(spark, table), table).size
    assert(df.inputFiles.length < total,
      s"equality read opened all $total files — bloom never pruned")
    val want = KeyedTable.read(spark, table).filter(col("o_custkey") === v).count()
    assert(df.count() === want && want > 0)
    // the SQL surface rides the same path (pushed EqualTo → readWhere)
    assert(spark.read.format("graft").load(table)
      .filter(col("o_custkey") === v).count() === want)
  }

  test("IN-list predicates prune through the bloom on the generic/SQL read path") {
    val table = boot()
    BloomIndex.build(spark, table, logicalColumn = "o_orderkey")
    val df = KeyedTable.readWhere(spark, table,
      Seq.empty, Seq(("o_orderkey", Seq(17L, 400L, 1200L))))
    val total = StatsIndex.listBaseFiles(CommitLog.fs(spark, table), table).size
    assert(df.inputFiles.length < total,
      s"IN-list read opened all $total files — bloom never pruned")
    val want = KeyedTable.read(spark, table)
      .filter(col("o_orderkey").isin(17L, 400L, 1200L)).count()
    assert(df.count() === want && want > 0)
    // the SQL surface lowers a pushed In onto the same probe
    assert(spark.read.format("graft").load(table)
      .filter(col("o_orderkey").isin(17L, 400L, 1200L)).count() === want)
  }

  test("index.auto: every publish refreshes the bloom — point lookups keep pruning " +
      "with NO manual build, at the index's original fpp") {
    val table = boot()
    BloomIndex.build(spark, table, fpp = 0.02)
    TableProperties.set(spark, table, Map(TableProperties.IndexAuto -> "true"))
    val fs = CommitLog.fs(spark, table)
    val filesBefore = StatsIndex.listBaseFiles(fs, table).toSet

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(3)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("o_month", lit("2098-01"))
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    // the publish refreshed the sidecar: complete live coverage at the
    // SAME fpp (a carried refresh, not a default-fpp rebuild)
    val live = StatsIndex.listBaseFiles(fs, table)
    assert(live.toSet != filesBefore)
    val ct = BloomIndex.latestIndex(spark, table).get
    val sc = spark.read.parquet(BloomIndex.bloomDir(table, ct).toString)
    assert(sc.select("file").distinct().count() === live.size)
    assert(sc.select("fpp").distinct().collect().map(_.getDouble(0)).toSeq === Seq(0.02))
    // a lookup of an appended key opens the appended file (not a full scan
    // fallback) and prunes the bulk of the untouched files
    val pr = BloomIndex.candidateFiles(spark, table, Seq("900001"))
    assert(pr.indexedAt === Some(ct))
    assert(pr.skippedFiles > 0)
    assert(BloomIndex.readByKeys(spark, table, Seq("900001")).count() === 1)
  }

  test("index.auto refreshes secondary-column blooms too") {
    val table = boot()
    BloomIndex.build(spark, table, logicalColumn = "o_orderpriority")
    TableProperties.set(spark, table, Map(TableProperties.IndexAuto -> "true"))

    val base = KeyedTable.read(spark, table)
    val batch = base.orderBy("o_orderkey").limit(2)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderkey", col("o_orderkey") + 900000L)
      .withColumn("o_orderpriority", lit("9-SENTINEL"))
    KeyedTable.append(spark, table, batch, graft.model.WriteOperation.BulkInsert)

    val fs = CommitLog.fs(spark, table)
    val live = StatsIndex.listBaseFiles(fs, table)
    val ct = BloomIndex.latestIndex(spark, table, "o_orderpriority").get
    val sc = spark.read.parquet(BloomIndex.bloomDir(table, ct).toString)
    assert(sc.select("file").distinct().count() === live.size)
    // a lookup of the sentinel only present in the appended file prunes the rest
    val pr = BloomIndex.candidateFiles(spark, table, Seq("9-SENTINEL"), "o_orderpriority")
    assert(pr.skippedFiles > 0)
    assert(BloomIndex.readByValues(spark, table, "o_orderpriority", Seq("9-SENTINEL")).count() === 2)
  }
}
