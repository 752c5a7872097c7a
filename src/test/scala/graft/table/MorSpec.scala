package graft.table

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model._

/** MERGE_ON_READ deltas, delete, compaction, clustering, incremental reads. */
class MorSpec extends SparkTestBase {
  import spark.implicits._

  private def ordersIn(outDir: String): String = {
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  private def cfg(input: String, table: String) = BootstrapConfig(
    dataFilePath = input, tablePath = table, tableName = "orders_t",
    keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
    partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead)

  private def updatesFor(table: String, keys: Seq[Long], status: String) = {
    val base = KeyedTable.read(spark, table)
    base.filter(col("o_orderkey").isin(keys: _*))
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit(status))
  }

  test("MOR upsert lands as a delta, no base rewrite; read merges; precombine wins in-batch") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table))

    val k = KeyedTable.read(spark, table).agg(min("o_orderkey")).head().getLong(0)
    val month = KeyedTable.read(spark, table).filter(col("o_orderkey") === k)
      .select("o_month").head().getString(0)
    val baseFiles = new File(s"$table/o_month=$month").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq

    // two in-batch versions: greater precombine must win
    val base = KeyedTable.read(spark, table)
    val dataCols = base.columns.filterNot(_.startsWith("_"))
    val upd = base.filter(col("o_orderkey") === k).select(dataCols.map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit("OLD"))
      .unionByName(base.filter(col("o_orderkey") === k).select(dataCols.map(col).toSeq: _*)
        .withColumn("o_orderstatus", lit("NEWER"))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY")))
    // keep o_month unchanged so the update hits the same partition
    val touched = KeyedTable.upsert(spark, table, upd)
    assert(touched === Seq(s"o_month=$month"))

    // base files untouched — the write was a pure delta
    val after = new File(s"$table/o_month=$month").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq
    assert(after === baseFiles)
    assert(Deltas.liveCommits(spark, table).size === 1)

    val merged = KeyedTable.read(spark, table)
    assert(merged.count() === 1500) // replaced, not appended
    assert(merged.filter(col("o_orderkey") === k).head()
      .getAs[String]("o_orderstatus") === "NEWER")
    assert(CommitLog.commits(spark, table).map(_.operation) === Seq("bootstrap", "delta_commit"))
  }

  test("MOR delete tombstones a key; compact folds deltas and drops them") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table))
    val rows = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month").orderBy("o_orderkey").limit(2).collect()
    val (k1, m1) = (rows(0).getLong(0), rows(0).getString(1))
    val (k2, _) = (rows(1).getLong(0), rows(1).getString(1))

    KeyedTable.upsert(spark, table, updatesFor(table, Seq(k2), "U"))
    KeyedTable.delete(spark, table, Seq((k1, m1)).toDF("o_orderkey", "o_month"))
    assert(Deltas.liveCommits(spark, table).size === 2)

    val merged = KeyedTable.read(spark, table)
    assert(merged.count() === 1499)
    assert(merged.filter(col("o_orderkey") === k1).count() === 0)
    assert(merged.filter(col("o_orderkey") === k2).head().getAs[String]("o_orderstatus") === "U")

    val compacted = KeyedTable.compact(spark, table)
    assert(compacted.nonEmpty)
    assert(Deltas.liveCommits(spark, table).isEmpty)
    val after = KeyedTable.read(spark, table)
    assert(after.count() === 1499)
    assert(after.filter(col("o_orderkey") === k1).count() === 0)
    assert(after.filter(col("o_orderkey") === k2).head().getAs[String]("o_orderstatus") === "U")
    // compaction is idempotent / a no-op when no deltas remain
    assert(KeyedTable.compact(spark, table).isEmpty)
  }

  test("MOR delta into a brand-new partition appears in reads and survives compaction") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table))
    val base = KeyedTable.read(spark, table)
    val dataCols = base.columns.filterNot(_.startsWith("_"))
    val upd = base.orderBy("o_orderkey").limit(1).select(dataCols.map(col).toSeq: _*)
      .withColumn("o_orderkey", lit(777777L))
      .withColumn("o_month", lit("2099-01"))
    KeyedTable.upsert(spark, table, upd)
    assert(KeyedTable.read(spark, table).filter(col("o_month") === "2099-01").count() === 1)
    KeyedTable.compact(spark, table)
    assert(new File(s"$table/o_month=2099-01").exists())
    assert(KeyedTable.read(spark, table).filter(col("o_month") === "2099-01").count() === 1)
  }

  test("COW delete rewrites only touched partitions") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val r = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month").orderBy("o_orderkey").head()
    val (k, m) = (r.getLong(0), r.getString(1))
    val touched = KeyedTable.delete(spark, table, Seq((k, m)).toDF("o_orderkey", "o_month"))
    assert(touched === Seq(s"o_month=$m"))
    val after = KeyedTable.read(spark, table)
    assert(after.count() === 1499)
    assert(after.filter(col("o_orderkey") === k).count() === 0)
  }

  test("incremental read returns exactly rows committed after the given instant") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))

    assert(KeyedTable.readIncremental(spark, table, boot.commitTime).count() === 0)
    assert(KeyedTable.readIncremental(spark, table, "0").count() === 1500)

    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(3).as[Long].collect().toSeq
    KeyedTable.upsert(spark, table, updatesFor(table, ks, "INC"))
    val inc = KeyedTable.readIncremental(spark, table, boot.commitTime)
    assert(inc.count() === 3)
    assert(inc.select("o_orderstatus").distinct().as[String].collect().toSeq === Seq("INC"))
    // COW rewrite kept original commit times for untouched rows in the same partition
    assert(KeyedTable.read(spark, table).count() === 1500)
  }

  test("incremental read on MOR sees un-compacted deltas; compaction adds nothing new") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table))
    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(2).as[Long].collect().toSeq
    KeyedTable.upsert(spark, table, updatesFor(table, ks, "D1"))
    assert(KeyedTable.readIncremental(spark, table, boot.commitTime).count() === 2)
    val preCompact = CommitLog.commits(spark, table).last.commitTime
    KeyedTable.compact(spark, table)
    // winners keep their delta commit times → still visible since boot, none since compact trigger
    assert(KeyedTable.readIncremental(spark, table, boot.commitTime).count() === 2)
    assert(KeyedTable.readIncremental(spark, table, preCompact).count() === 0)
  }

  test("cluster sorts files by sort key and bounds records per file") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val before = KeyedTable.read(spark, table).count()
    KeyedTable.cluster(spark, table, sortCols = Seq("o_orderkey"), maxRecordsPerFile = 50L)
    val after = KeyedTable.read(spark, table)
    assert(after.count() === before) // content-preserving
    // every data file respects the record bound
    val dirs = new File(table).listFiles().filter(d => d.isDirectory && d.getName.startsWith("o_month="))
    val oversized = dirs.flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.getAbsolutePath).count()).filter(_ > 50L)
    assert(oversized.isEmpty)
    assert(CommitLog.commits(spark, table).last.operation === "cluster")
  }

  test("z-order clustering bounds per-file ranges on BOTH columns, linear sort only on its leading one") {
    val in = tmpDir("in")
    spark.read.parquet(sf("orders")).write.mode("overwrite").parquet(in)
    def build(): String = {
      val t = tmpDir("tbl")
      KeyedTable.bootstrap(spark, BootstrapConfig(
        dataFilePath = in, tablePath = t, tableName = "z",
        keyFields = Seq("o_orderkey"), precombineField = "o_orderdate"))
      t
    }
    def avgSpread(t: String, c: String): Double = {
      val files = new File(t).listFiles().filter(_.getName.endsWith(".parquet"))
      val spreads = files.map { f =>
        val mm = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
        mm.getDouble(1) - mm.getDouble(0)
      }
      spreads.sum / spreads.length
    }
    val g = spark.read.parquet(in).agg(
      (max(col("o_custkey")) - min(col("o_custkey"))).cast("double"),
      (max(col("o_totalprice")) - min(col("o_totalprice"))).cast("double")).head()
    val (gCust, gPrice) = (g.getDouble(0), g.getDouble(1))

    val tz = build()
    KeyedTable.clusterZ(spark, tz, Seq("o_custkey", "o_totalprice"), maxRecordsPerFile = 150)
    val tl = build()
    KeyedTable.cluster(spark, tl, Seq("o_custkey"), maxRecordsPerFile = 150)

    assert(KeyedTable.read(spark, tz).count() === 1500) // content preserved
    assert(KeyedTable.read(spark, tl).count() === 1500)
    // z-order: BOTH columns bounded below their global spread (a curve
    // segment of length f spans up to ~2·sqrt(f) per axis, not sqrt(f))
    assert(avgSpread(tz, "o_custkey") < 0.75 * gCust)
    assert(avgSpread(tz, "o_totalprice") < 0.75 * gPrice)
    // linear: leading column tightly bounded, the trailing one essentially
    // unbounded — the comparative claim IS the point of z-ordering
    assert(avgSpread(tl, "o_custkey") < 0.25 * gCust)
    assert(avgSpread(tl, "o_totalprice") > avgSpread(tz, "o_totalprice") * 1.5)
  }

  test("rollback undoes uncompacted delta commits; restores across archived rewrites") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table))
    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(2).as[Long].collect().toSeq

    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(0)), "R1"))
    val afterFirst = CommitLog.commits(spark, table).last.commitTime
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(1)), "R2"))

    // roll back the second delta only
    val undone = KeyedTable.rollback(spark, table, afterFirst)
    assert(undone.size === 1)
    val mid = KeyedTable.read(spark, table)
    assert(mid.filter(col("o_orderkey") === ks(0)).head().getAs[String]("o_orderstatus") === "R1")
    assert(mid.filter(col("o_orderkey") === ks(1) && col("o_orderstatus") === "R2").count() === 0)
    assert(Deltas.liveCommits(spark, table).size === 1)

    // compaction is an ARCHIVED rewrite — rolling back across it restores the
    // pre-image partitions and re-exposes the absorbed delta, which the same
    // rollback then undoes too
    KeyedTable.compact(spark, table)
    val undone2 = KeyedTable.rollback(spark, table, boot.commitTime)
    assert(undone2.size === 2) // compact + the remaining delta commit
    val restored = KeyedTable.read(spark, table)
    assert(restored.count() === 1500)
    assert(restored.filter(col("o_orderstatus").isin("R1", "R2")).count() === 0)
    assert(Deltas.liveCommits(spark, table).isEmpty)
    assert(CommitLog.commits(spark, table).map(_.operation) === Seq("bootstrap"))

    // append-type commits interleave rows into shared files (no pre-image) —
    // rollback across them must refuse
    val batch = updatesFor(table, Seq(ks(0)), "AP")
    KeyedTable.append(spark, table, batch, WriteOperation.BulkInsert)
    val e = intercept[GraftException] { KeyedTable.rollback(spark, table, boot.commitTime) }
    assert(e.getMessage.contains("Cannot roll back past commit"))
    // rollback to the current tip is a no-op
    assert(KeyedTable.rollback(spark, table,
      CommitLog.commits(spark, table).last.commitTime).isEmpty)
  }

  test("readAsOf reconstructs historical snapshots across COW rewrites, MOR deltas, and compaction") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table))
    val originalSum = KeyedTable.read(spark, table)
      .agg(sum(col("o_orderkey"))).head().getLong(0)
    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(3).as[Long].collect().toSeq

    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(0)), "T1"))
    val afterT1 = CommitLog.commits(spark, table).last.commitTime
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(1)), "T2"))
    KeyedTable.compact(spark, table)
    val m = KeyedTable.read(spark, table).filter(col("o_orderkey") === ks(2))
      .select("o_month").head().getString(0)
    KeyedTable.delete(spark, table, Seq((ks(2), m)).toDF("o_orderkey", "o_month"))

    // live tip: T1+T2 applied, ks(2) deleted
    assert(KeyedTable.read(spark, table).count() === 1499)

    // as of bootstrap: pristine
    val atBoot = KeyedTable.readAsOf(spark, table, boot.commitTime)
    assert(atBoot.count() === 1500)
    assert(atBoot.agg(sum(col("o_orderkey"))).head().getLong(0) === originalSum)
    assert(atBoot.filter(col("o_orderstatus").isin("T1", "T2")).count() === 0)

    // as of first delta: T1 applied, T2 not, ks(2) present
    val atT1 = KeyedTable.readAsOf(spark, table, afterT1)
    assert(atT1.count() === 1500)
    assert(atT1.filter(col("o_orderkey") === ks(0)).head().getAs[String]("o_orderstatus") === "T1")
    assert(atT1.filter(col("o_orderstatus") === "T2").count() === 0)
    assert(atT1.filter(col("o_orderkey") === ks(2)).count() === 1)

    // unknown instant before first commit
    val e = intercept[GraftException] { KeyedTable.readAsOf(spark, table, "0") }
    assert(e.getMessage.contains("No commit at or before"))
  }

  test("readAsOf fails explicitly when the archive was cleaned past the instant") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(1).as[Long].collect().toSeq
    KeyedTable.upsert(spark, table, updatesFor(table, ks, "C1"))
    KeyedTable.cleanArchive(spark, table, retainLast = 0)
    val e = intercept[GraftException] { KeyedTable.readAsOf(spark, table, boot.commitTime) }
    assert(e.getMessage.contains("archive retention exceeded"))
  }

  test("readChanges surfaces upserts and deletes with op column on MOR, across compaction") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table))
    val rows = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month").orderBy("o_orderkey").limit(3).collect()
    val (k1, k2, k3) = (rows(0).getLong(0), rows(1).getLong(0), rows(2).getLong(0))
    val m3 = rows(2).getString(1)

    KeyedTable.upsert(spark, table, updatesFor(table, Seq(k1, k2), "CH"))
    KeyedTable.delete(spark, table, Seq((k3, m3)).toDF("o_orderkey", "o_month"))

    def changeMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderkey"), col(KeyedTable.ChangeOp))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val pre = KeyedTable.readChanges(spark, table, boot.commitTime)
    assert(changeMap(pre) === Map(k1 -> "upsert", k2 -> "upsert", k3 -> "delete"))
    // tombstones found in the compaction archive after compact
    KeyedTable.compact(spark, table)
    val post = KeyedTable.readChanges(spark, table, boot.commitTime)
    assert(changeMap(post) === Map(k1 -> "upsert", k2 -> "upsert", k3 -> "delete"))
  }

  test("readChanges reconstructs COW delete before-images from the archive") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val r = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month", "o_orderstatus").orderBy("o_orderkey").head()
    val (k, m, status) = (r.getLong(0), r.getString(1), r.getString(2))
    KeyedTable.delete(spark, table, Seq((k, m)).toDF("o_orderkey", "o_month"))

    val ch = KeyedTable.readChanges(spark, table, boot.commitTime)
      .filter(col(KeyedTable.ChangeOp) === "delete").collect()
    assert(ch.length === 1)
    assert(ch.head.getAs[Long]("o_orderkey") === k)
    // COW deletes carry the full before-image, not just the key
    assert(ch.head.getAs[String]("o_orderstatus") === status)
  }

  test("upsertGlobal moves a row whose partition value changed (COW and MOR)") {
    val in = ordersIn(tmpDir("in"))
    for (tt <- Seq(TableType.CopyOnWrite, TableType.MergeOnRead)) {
      val table = tmpDir("tbl")
      KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = tt))
      val base = KeyedTable.read(spark, table)
      val k = base.agg(min("o_orderkey")).head().getLong(0)
      val dataCols = base.columns.filterNot(_.startsWith("_"))
      val movedUpd = base.filter(col("o_orderkey") === k)
        .select(dataCols.map(col).toSeq: _*)
        .withColumn("o_month", lit("2030-05"))
        .withColumn("o_orderstatus", lit("GM"))

      KeyedTable.upsertGlobal(spark, table, movedUpd)
      val after = KeyedTable.read(spark, table)
      assert(after.count() === 1500, tt.name) // moved, not duplicated
      val kRows = after.filter(col("o_orderkey") === k)
        .select("o_month", "o_orderstatus").collect()
      assert(kRows.length === 1, tt.name)
      assert(kRows.head.getString(0) === "2030-05", tt.name)
      assert(kRows.head.getString(1) === "GM", tt.name)
    }
  }

  test("readAsOf before a column-adding upsert returns the old schema") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val base = KeyedTable.read(spark, table)
    val k = base.agg(min("o_orderkey")).head().getLong(0)
    val dataCols = base.columns.filterNot(_.startsWith("_"))
    KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") === k)
      .select(dataCols.map(col).toSeq: _*)
      .withColumn("o_new_col", lit("added")))

    assert(KeyedTable.read(spark, table).columns.contains("o_new_col"))
    val old = KeyedTable.readAsOf(spark, table, boot.commitTime)
    assert(!old.columns.contains("o_new_col")) // schema as of the instant
    assert(old.count() === 1500)
  }

  test("TableSync incrementally replicates a source table into a destination") {
    val in = ordersIn(tmpDir("in"))
    val (src, dst) = (tmpDir("src"), tmpDir("dst"))
    val bootSrc = KeyedTable.bootstrap(spark, cfg(in, src))
    KeyedTable.bootstrap(spark, cfg(in, dst).copy(tableType = TableType.CopyOnWrite))

    def stateOf(t: String) = KeyedTable.read(spark, t)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey").collect().toSeq

    // round 1: upsert + delete on src, sync
    val ks = KeyedTable.read(spark, src).select("o_orderkey", "o_month")
      .orderBy("o_orderkey").limit(3).collect()
    KeyedTable.upsert(spark, src, updatesFor(src, Seq(ks(0).getLong(0)), "S1"))
    KeyedTable.delete(spark, src,
      Seq((ks(1).getLong(0), ks(1).getString(1))).toDF("o_orderkey", "o_month"))
    val w1 = TableSync.sync(spark, src, dst, bootSrc.commitTime)
    assert(stateOf(dst) === stateOf(src))

    // round 2: more changes after the watermark, incremental sync composes
    KeyedTable.upsert(spark, src, updatesFor(src, Seq(ks(2).getLong(0)), "S2"))
    val w2 = TableSync.sync(spark, src, dst, w1)
    assert(w2 > w1)
    assert(stateOf(dst) === stateOf(src))
    // no-op sync is a no-op
    assert(TableSync.sync(spark, src, dst, w2) === w2)
  }

  test("append newer than a live tombstone wins the merge (commit-time resolution)") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table))
    val r = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_month").orderBy("o_orderkey").head()
    val (k, m) = (r.getLong(0), r.getString(1))

    KeyedTable.delete(spark, table, Seq((k, m)).toDF("o_orderkey", "o_month"))
    assert(KeyedTable.read(spark, table).filter(col("o_orderkey") === k).count() === 0)

    // bulk-insert the row back AFTER the tombstone: newer base beats older delta
    val reborn = spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .filter(col("o_orderkey") === k)
      .withColumn("o_orderstatus", lit("REBORN"))
    KeyedTable.append(spark, table, reborn, WriteOperation.BulkInsert)
    val after = KeyedTable.read(spark, table).filter(col("o_orderkey") === k).collect()
    assert(after.length === 1)
    assert(after.head.getAs[String]("o_orderstatus") === "REBORN")
    // and compaction preserves the resolution
    KeyedTable.compact(spark, table)
    assert(KeyedTable.read(spark, table)
      .filter(col("o_orderkey") === k).head().getAs[String]("o_orderstatus") === "REBORN")
  }

  test("readChanges surfaces the old-partition removal of a global-upsert move") {
    val in = ordersIn(tmpDir("in"))
    for (tt <- Seq(TableType.CopyOnWrite, TableType.MergeOnRead)) {
      val table = tmpDir("tbl")
      val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = tt))
      val base = KeyedTable.read(spark, table)
      val k = base.agg(min("o_orderkey")).head().getLong(0)
      val p1 = base.filter(col("o_orderkey") === k).head().getAs[String]("o_month")
      val dataCols = base.columns.filterNot(_.startsWith("_"))
      KeyedTable.upsertGlobal(spark, table, base.filter(col("o_orderkey") === k)
        .select(dataCols.map(col).toSeq: _*)
        .withColumn("o_month", lit("2031-08"))
        .withColumn("o_orderstatus", lit("MV")))

      val ch = KeyedTable.readChanges(spark, table, boot.commitTime)
        .filter(col("o_orderkey") === k)
        .select("o_month", KeyedTable.ChangeOp).collect()
        .map(r => r.getString(0) -> r.getString(1)).toSet
      assert(ch === Set(p1 -> "delete", "2031-08" -> "upsert"), tt.name)
    }
  }

  test("TableSync replicates a global-upsert partition move without divergence") {
    val in = ordersIn(tmpDir("in"))
    val (src, dst) = (tmpDir("src"), tmpDir("dst"))
    val boot = KeyedTable.bootstrap(spark, cfg(in, src).copy(tableType = TableType.CopyOnWrite))
    KeyedTable.bootstrap(spark, cfg(in, dst).copy(tableType = TableType.CopyOnWrite))
    val base = KeyedTable.read(spark, src)
    val k = base.agg(min("o_orderkey")).head().getLong(0)
    val dataCols = base.columns.filterNot(_.startsWith("_"))
    KeyedTable.upsertGlobal(spark, src, base.filter(col("o_orderkey") === k)
      .select(dataCols.map(col).toSeq: _*)
      .withColumn("o_month", lit("2032-01")))
    TableSync.sync(spark, src, dst, boot.commitTime)
    def state(t: String) = KeyedTable.read(spark, t)
      .select("o_orderkey", "o_month").orderBy("o_orderkey", "o_month").collect().toSeq
    assert(state(dst) === state(src))
    assert(KeyedTable.read(spark, dst).filter(col("o_orderkey") === k).count() === 1)
  }

  test("readChanges works on an unpartitioned COW table (delete before-images)") {
    val in = tmpDir("in")
    spark.read.parquet(sf("orders")).write.mode("overwrite").parquet(in)
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "np",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate"))
    val k = KeyedTable.read(spark, table).agg(min("o_orderkey")).head().getLong(0)
    KeyedTable.delete(spark, table, Seq(k).toDF("o_orderkey"))
    val ch = KeyedTable.readChanges(spark, table, boot.commitTime).collect()
    assert(ch.length === 1)
    assert(ch.head.getAs[Long]("o_orderkey") === k)
    assert(ch.head.getAs[String](KeyedTable.ChangeOp) === "delete")
  }

  test("MOR end-to-end matches the equivalent COW table state") {
    val in = ordersIn(tmpDir("in"))
    val (tMor, tCow) = (tmpDir("mor"), tmpDir("cow"))
    KeyedTable.bootstrap(spark, cfg(in, tMor))
    KeyedTable.bootstrap(spark, cfg(in, tCow).copy(tableType = TableType.CopyOnWrite))
    val ks = KeyedTable.read(spark, tCow).select("o_orderkey")
      .orderBy(desc("o_orderkey")).limit(5).as[Long].collect().toSeq
    for (t <- Seq(tMor, tCow)) {
      KeyedTable.upsert(spark, t, updatesFor(t, ks.take(3), "EQ"))
      val dr = KeyedTable.read(spark, t).filter(col("o_orderkey") === ks(4))
        .select("o_orderkey", "o_month")
      KeyedTable.delete(spark, t, dr)
    }
    KeyedTable.compact(spark, tMor)
    def dump(t: String) = KeyedTable.read(spark, t)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy("o_orderkey").collect().toSeq
    assert(dump(tMor) === dump(tCow))
  }

  test("savepoint pins readAsOf through aggressive cleaning; delete unpins; restore rolls back") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val pristine = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq

    KeyedTable.savepoint(spark, table, boot.commitTime)
    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(4).as[Long].collect().toSeq
    // three rewrites + zero-retention cleans: without the pin these would
    // evict the bootstrap pre-images (exactly the scenario above)
    ks.take(3).zipWithIndex.foreach { case (k, i) =>
      KeyedTable.upsert(spark, table, updatesFor(table, Seq(k), s"S$i"))
      KeyedTable.cleanArchive(spark, table, retainLast = 0)
    }
    val asOf = KeyedTable.readAsOf(spark, table, boot.commitTime)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq
    assert(asOf === pristine)

    // restore = guarded rollback to the savepoint; unpinned instants refuse
    val e = intercept[GraftException] { KeyedTable.restore(spark, table, "19700101000000000") }
    assert(e.getMessage.contains("not a savepoint"))
    KeyedTable.restore(spark, table, boot.commitTime)
    assert(KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq === pristine)

    // unpin → aggressive clean evicts → readAsOf now fails, savepoint refuses
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(3)), "SX"))
    KeyedTable.deleteSavepoint(spark, table, boot.commitTime)
    KeyedTable.cleanArchive(spark, table, retainLast = 0)
    val e2 = intercept[GraftException] { KeyedTable.readAsOf(spark, table, boot.commitTime) }
    assert(e2.getMessage.contains("archive retention exceeded"))
    val e3 = intercept[GraftException] { KeyedTable.savepoint(spark, table, boot.commitTime) }
    assert(e3.getMessage.contains("archive retention exceeded"))
    val e4 = intercept[GraftException] { KeyedTable.savepoint(spark, table, "nope") }
    assert(e4.getMessage.contains("no such commit"))
  }

  test("savepoint retention is precise: later rewrites of a pinned partition are cleaned") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    val boot = KeyedTable.bootstrap(spark, cfg(in, table).copy(tableType = TableType.CopyOnWrite))
    val pristine = KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq
    KeyedTable.savepoint(spark, table, boot.commitTime)

    // two keys in the SAME partition and one in another
    val rows = KeyedTable.read(spark, table).groupBy("o_month")
      .agg(collect_list("o_orderkey").as("ks")).orderBy(desc("o_month"))
      .as[(String, Seq[Long])].collect()
    val (mA, ksA) = rows.find(_._2.size >= 2).get
    val kOther = rows.find(_._1 != mA).get._2.head

    val c1 = KeyedTable.upsert(spark, table, updatesFor(table, Seq(ksA(0)), "S0"))
    val cts = CommitLog.commits(spark, table).map(_.commitTime)
    val ct1 = cts.last
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ksA(1)), "S1")) // same partition again
    val ct2 = CommitLog.commits(spark, table).map(_.commitTime).last
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(kOther), "S2")) // different partition
    val ct3 = CommitLog.commits(spark, table).map(_.commitTime).last
    assert(c1 === Seq(s"o_month=$mA"))

    val fs = CommitLog.fs(spark, table)
    val cleaned = KeyedTable.cleanArchive(spark, table, retainLast = 0)
    // ct1 pins mA's pre-image (first rewrite after S), ct3 pins the other
    // partition's; ct2 — a SECOND rewrite of mA — is cleanable despite the
    // live savepoint
    assert(cleaned === Seq(ct2))
    assert(Archive.exists(fs, table, ct1))
    assert(!Archive.exists(fs, table, ct2))
    assert(Archive.exists(fs, table, ct3))

    // readAsOf(S) still serves the exact savepointed state
    assert(KeyedTable.readAsOf(spark, table, boot.commitTime)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq === pristine)

    // restore works against the precise retention set (ct2's archive is gone)
    KeyedTable.restore(spark, table, boot.commitTime)
    assert(KeyedTable.read(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq === pristine)
    assert(CommitLog.commits(spark, table).map(_.commitTime) === Seq(boot.commitTime))
  }

  test("savepoint pins the post-savepoint compaction that absorbed pre-savepoint deltas") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table)) // MOR
    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(3).as[Long].collect().toSeq

    // delta commit ≤ S, then savepoint, then a compaction that absorbs it
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(0)), "PRE"))
    val sp = CommitLog.commits(spark, table).map(_.commitTime).last
    KeyedTable.savepoint(spark, table, sp)
    KeyedTable.compact(spark, table)
    val ctCompact = CommitLog.commits(spark, table).map(_.commitTime).last

    // a later delta + compaction holds only post-S deltas → cleanable
    KeyedTable.upsert(spark, table, updatesFor(table, Seq(ks(1)), "POST"))
    KeyedTable.compact(spark, table)
    val ctCompact2 = CommitLog.commits(spark, table).map(_.commitTime).last

    val fs = CommitLog.fs(spark, table)
    KeyedTable.cleanArchive(spark, table, retainLast = 0)
    assert(Archive.exists(fs, table, ctCompact)) // pinned: holds the PRE delta
    val _ = ctCompact2 // may or may not be pinned (first rewrite of ITS partition)
    val asOf = KeyedTable.readAsOf(spark, table, sp)
    assert(asOf.filter(col("o_orderkey") === ks(0)).head().getAs[String]("o_orderstatus") === "PRE")
    assert(asOf.filter(col("o_orderkey") === ks(1)).head().getAs[String]("o_orderstatus") !== "POST")
  }

  test("read-optimized serves the last-compacted state; equals snapshot after compaction") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table))
    val pristine = KeyedTable.readOptimized(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq

    val ks = KeyedTable.read(spark, table).select("o_orderkey")
      .orderBy("o_orderkey").limit(3).as[Long].collect().toSeq
    KeyedTable.upsert(spark, table, updatesFor(table, ks, "HIDDEN"))
    // the delta is live: snapshot sees it, RO does not
    assert(KeyedTable.read(spark, table)
      .filter(col("o_orderstatus") === "HIDDEN").count() === 3)
    val ro = KeyedTable.readOptimized(spark, table)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq
    assert(ro === pristine)

    KeyedTable.compact(spark, table)
    val roAfter = KeyedTable.readOptimized(spark, table)
      .select(col("o_orderkey"), col("o_orderstatus")).orderBy("o_orderkey").collect().toSeq
    val snapAfter = KeyedTable.read(spark, table)
      .select(col("o_orderkey"), col("o_orderstatus")).orderBy("o_orderkey").collect().toSeq
    assert(roAfter === snapAfter)
    assert(roAfter.count(_.getString(1) == "HIDDEN") === 3)
  }
}
