package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, TableType}
import graft.table.{CommitLog, KeyedTable}

class ChangeStreamSpec extends SparkTestBase {

  private def boot(table: String, tt: TableType = TableType.CopyOnWrite) = {
    val in = tmpDir("in")
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = table, tableName = "orders_t",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = tt))
  }

  private def dataCols(t: String) = {
    val b = KeyedTable.read(spark, t)
    b.columns.filterNot(_.startsWith("_")).map(col).toSeq
  }

  test("first pull with no checkpoint initializes at the tip and delivers nothing") {
    val table = tmpDir("tbl"); val cp = tmpDir("cp")
    boot(table)
    var called = false
    val r = ChangeStream.pull(spark, table, cp) { (_, _) => called = true }
    assert(r.isEmpty && !called)
    val fs = CommitLog.fs(spark, cp)
    assert(ChangeStream.readWatermark(fs, cp) ===
      Some(CommitLog.requireState(spark, table).latest.commitTime))
  }

  test("initialize writes the watermark WITHOUT consuming; re-initialize is a " +
      "no-op; a pending interval survives for the next pull") {
    val table = tmpDir("tbl"); val cp = tmpDir("cp")
    boot(table)
    ChangeStream.initialize(spark, table, cp, identity = Some("consumer-a"))
    val fs = CommitLog.fs(spark, cp)
    val tip0 = CommitLog.requireState(spark, table).latest.commitTime
    assert(ChangeStream.readWatermark(fs, cp) === Some(tip0))
    // table moves on; a registrar-style re-initialize must NOT eat the
    // pending interval (that is pull's job)
    val base = KeyedTable.read(spark, table)
    KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") <= 50)
      .select(dataCols(table): _*).withColumn("o_orderstatus", lit("I1")))
    ChangeStream.initialize(spark, table, cp, identity = Some("consumer-a"))
    assert(ChangeStream.readWatermark(fs, cp) === Some(tip0), "re-init moved the watermark")
    var delivered = 0L
    val r = ChangeStream.pull(spark, table, cp, identity = Some("consumer-a")) {
      (df, _) => delivered = df.count()
    }
    assert(r.nonEmpty && delivered > 0, "the interval was eaten before the pull")
    // identity validation applies to initialize too
    intercept[graft.model.GraftException] {
      ChangeStream.initialize(spark, table, cp, identity = Some("consumer-b"))
    }
  }

  test("pull delivers each interval once; empty pulls after catch-up") {
    val table = tmpDir("tbl"); val cp = tmpDir("cp")
    boot(table)
    ChangeStream.pull(spark, table, cp)((_, _) => ()) // init at tip

    val base = KeyedTable.read(spark, table)
    KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") <= 100)
      .select(dataCols(table): _*).withColumn("o_orderstatus", lit("S1")))
    KeyedTable.delete(spark, table, KeyedTable.read(spark, table)
      .filter(col("o_orderkey") % 101 === 0).select("o_orderkey", "o_month"))

    var ops = Map.empty[String, Long]
    val r = ChangeStream.pull(spark, table, cp) { (df, _) =>
      ops = df.groupBy(KeyedTable.ChangeOp).count()
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    }
    assert(r.nonEmpty)
    assert(ops.getOrElse("upsert", 0L) > 0 && ops.getOrElse("delete", 0L) > 0)
    assert(ChangeStream.pull(spark, table, cp)((_, _) => fail("re-delivered")) === None)
  }

  test("a handler failure leaves the watermark untouched; retry re-delivers the interval") {
    val table = tmpDir("tbl"); val cp = tmpDir("cp")
    boot(table)
    ChangeStream.pull(spark, table, cp)((_, _) => ())
    val base = KeyedTable.read(spark, table)
    KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") === 7)
      .select(dataCols(table): _*).withColumn("o_orderstatus", lit("S2")))

    intercept[RuntimeException] {
      ChangeStream.pull(spark, table, cp)((_, _) => throw new RuntimeException("consumer crash"))
    }
    var rows = 0L
    val r = ChangeStream.pull(spark, table, cp)((df, _) => rows = df.count())
    assert(r.nonEmpty && rows === 1L)
  }

  test("startAt streams from an explicit instant (beginning of history)") {
    val table = tmpDir("tbl"); val cp = tmpDir("cp")
    val b = boot(table)
    val base = KeyedTable.read(spark, table)
    KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") === 7)
      .select(dataCols(table): _*).withColumn("o_orderstatus", lit("S3")))
    var rows = 0L
    // from the bootstrap commit: only the post-bootstrap upsert is a change
    val r = ChangeStream.pull(spark, table, cp, startAt = Some(b.commitTime)) {
      (df, _) => rows = df.count()
    }
    assert(r.nonEmpty && r.get.sinceExclusive === b.commitTime && rows === 1L)
  }

  test("syncTo replicates a MOR source into a COW copy across multiple rounds") {
    val tmp = tmpDir("sync"); val src = s"$tmp/src"; val dst = s"$tmp/dst"; val cp = s"$tmp/cp"
    val bootSrc = boot(src, TableType.MergeOnRead)
    boot(dst)

    // round 1: update + delete on the source, then sync
    val base = KeyedTable.read(spark, src)
    KeyedTable.upsert(spark, src, base.filter(col("o_orderkey") % 10 === 0)
      .select(dataCols(src): _*).withColumn("o_orderstatus", lit("R1")))
    assert(ChangeStream.syncTo(spark, src, dst, cp, startAt = Some(bootSrc.commitTime)).nonEmpty)

    // round 2: another mutation, checkpoint carries the watermark forward
    KeyedTable.delete(spark, src, KeyedTable.read(spark, src)
      .filter(col("o_orderkey") % 97 === 0).select("o_orderkey", "o_month"))
    assert(ChangeStream.syncTo(spark, src, dst, cp).nonEmpty)
    assert(ChangeStream.syncTo(spark, src, dst, cp) === None) // caught up

    def state(t: String) = KeyedTable.read(spark, t)
      .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").collect().toSeq
    assert(state(dst) === state(src))
  }

  test("a checkpoint stamped under a superseded identity rendering ADOPTS the " +
      "canonical one in place - previously-pulled intervals are never skipped") {
    val tmp = tmpDir("adopt"); val src = s"$tmp/src"; val dst = s"$tmp/dst"
    val cp = s"$tmp/cp"
    val bootSrc = boot(src, TableType.MergeOnRead)
    boot(dst)
    KeyedTable.upsert(spark, src, KeyedTable.read(spark, src)
      .filter(col("o_orderkey") % 10 === 0)
      .select(dataCols(src): _*).withColumn("o_orderstatus", lit("R1")))
    assert(ChangeStream.syncTo(spark, src, dst, cp,
      startAt = Some(bootSrc.commitTime)).nonEmpty)
    // rewrite the stamp to the pre-normalization RAW-path rendering of a
    // respelled (trailing-slash) source - the shape round-13 checkpoints
    // hold after the identity strings were path-normalized (through the
    // Hadoop FS so the checksum sidecar follows)
    val hfs = graft.table.CommitLog.fs(spark, cp)
    val idFile = new org.apache.hadoop.fs.Path(cp, "graft-change-identity")
    def stamp(v: String): Unit = {
      val out = hfs.create(idFile, true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    def stamped(): String = {
      val in = hfs.open(idFile)
      try new String(
        Array.fill(hfs.getFileStatus(idFile).getLen.toInt)(in.read().toByte),
        "UTF-8").trim
      finally in.close()
    }
    stamp(s"tablesync $src/ -> $dst")
    // next sync under the respelled source: must ADOPT (not refuse, not
    // re-deliver) and restamp canonically
    KeyedTable.delete(spark, src, KeyedTable.read(spark, src)
      .filter(col("o_orderkey") % 97 === 0).select("o_orderkey", "o_month"))
    assert(ChangeStream.syncTo(spark, src + "/", dst, cp).nonEmpty,
      "the legacy-stamped checkpoint must adopt, not refuse")
    assert(stamped() === s"tablesync $src -> $dst",
      "the stamp must upgrade to the canonical rendering")
    // a genuinely DIFFERENT consumer still refuses
    stamp("tablesync /elsewhere -> /other")
    assertThrows[graft.model.GraftException] {
      ChangeStream.syncTo(spark, src, dst, cp)
    }
  }

  test("follow drains pending commits within its poll budget") {
    val table = tmpDir("tbl"); val cp = tmpDir("cp")
    val b = boot(table)
    val base = KeyedTable.read(spark, table)
    KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") === 32)
      .select(dataCols(table): _*).withColumn("o_orderstatus", lit("F1")))
    var batches = 0
    val n = ChangeStream.follow(spark, table, cp, pollIntervalMs = 10, maxPolls = 3,
      startAt = Some(b.commitTime))((_, _) => batches += 1)
    assert(n === 1 && batches === 1)
  }
}
