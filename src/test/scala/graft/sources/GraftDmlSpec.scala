package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, GraftException}
import graft.table.{CommitLog, KeyedTable}

/** Native SQL row-level DML: DELETE FROM / UPDATE as plain statements on
  * session-catalog graft tables, lowered onto the engine's predicate DML
  * (same commit semantics as the Scala API / CALL procedures).
  */
class GraftDmlSpec extends SparkTestBase {

  private def bootstrapOrders(dir: String, name: String): String = {
    val tbl = s"$dir/tbl"
    val in = s"$dir/in"
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = name,
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month")))
    tbl
  }

  test("DELETE FROM as a plain SQL statement deletes through the engine") {
    val tbl = bootstrapOrders(tmpDir("dml-del"), "dml_del")
    spark.sql("DROP TABLE IF EXISTS dml_del_t")
    spark.sql(s"CREATE TABLE dml_del_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl).count()
      val doomed = KeyedTable.read(spark, tbl)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000).count()
      assert(doomed > 0 && doomed < before)

      spark.sql("DELETE FROM dml_del_t WHERE o_orderstatus = 'F' AND o_totalprice > 150000")

      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === before - doomed)
      assert(after.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000)
        .count() === 0)
      // it went through the ordinary keyed delete commit: operation recorded,
      // time travel still serves the pre-delete snapshot
      val st = CommitLog.requireState(spark, tbl)
      assert(st.latest.operation === "delete")
      val bootCt = st.commits.head.commitTime
      assert(KeyedTable.readAsOf(spark, tbl, bootCt).count() === before)
    } finally spark.sql("DROP TABLE IF EXISTS dml_del_t")
  }

  test("UPDATE ... SET as a plain SQL statement patches through the engine") {
    val tbl = bootstrapOrders(tmpDir("dml-upd"), "dml_upd")
    spark.sql("DROP TABLE IF EXISTS dml_upd_t")
    spark.sql(s"CREATE TABLE dml_upd_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl).count()
      val hit = KeyedTable.read(spark, tbl).filter(col("o_orderpriority") === "1-URGENT")
      val hitCount = hit.count()
      val oldSum = hit.agg(sum(col("o_totalprice"))).head().getDouble(0)
      assert(hitCount > 0)

      // assignments see the OLD row (classic UPDATE semantics), expressions
      // and multiple SETs allowed — the reference's runaway sweep shape
      spark.sql(
        """UPDATE dml_upd_t
          |SET o_orderstatus = 'X', o_totalprice = o_totalprice + 1
          |WHERE o_orderpriority = '1-URGENT'""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === before) // an update never changes cardinality
      val patched = after.filter(col("o_orderpriority") === "1-URGENT")
      assert(patched.count() === hitCount)
      assert(patched.filter(col("o_orderstatus") =!= "X").count() === 0)
      val newSum = patched.agg(sum(col("o_totalprice"))).head().getDouble(0)
      assert(math.abs(newSum - (oldSum + hitCount)) < 1e-3)
      assert(CommitLog.requireState(spark, tbl).latest.operation === "upsert")
    } finally spark.sql("DROP TABLE IF EXISTS dml_upd_t")
  }

  test("MERGE INTO: matched update + not-matched insert reproduce upsert semantics") {
    val tbl = bootstrapOrders(tmpDir("dml-merge"), "dml_merge")
    spark.sql("DROP TABLE IF EXISTS dml_m_t")
    spark.sql("DROP VIEW IF EXISTS dml_m_src")
    spark.sql(s"CREATE TABLE dml_m_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      // source: half updates to existing keys, plus brand-new keys
      before.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), lit("M").as("st"),
          (col("o_totalprice") + 10).as("price"),
          col("o_orderdate"), col("o_custkey"), col("o_orderpriority"), col("o_month"))
        .unionByName(
          before.filter(col("o_orderkey") % 7 === 0)
            .select((col("o_orderkey") + 10000000).as("o_orderkey"), lit("N").as("st"),
              col("o_totalprice").as("price"),
              col("o_orderdate"), col("o_custkey"), col("o_orderpriority"), col("o_month")))
        .createOrReplaceTempView("dml_m_src")
      val newKeys = spark.table("dml_m_src")
        .filter(col("o_orderkey") >= 10000000).count()

      spark.sql(
        """MERGE INTO dml_m_t t
          |USING dml_m_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = s.st, o_totalprice = s.price
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus,
          |  o_totalprice, o_orderdate, o_orderpriority, o_month)
          |  VALUES (s.o_orderkey, s.o_custkey, s.st, s.price, s.o_orderdate,
          |          s.o_orderpriority, s.o_month)""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === beforeCount + newKeys)
      // matched rows patched, unmatched untouched
      assert(after.filter(col("o_orderkey") % 2 === 0 && col("o_orderkey") < 10000000)
        .filter(col("o_orderstatus") =!= "M").count() === 0)
      assert(after.filter(col("o_orderkey") % 2 =!= 0 && col("o_orderkey") < 10000000)
        .filter(col("o_orderstatus") === "M").count() === 0)
      assert(after.filter(col("o_orderstatus") === "N").count() === newKeys)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m_t")
      spark.sql("DROP VIEW IF EXISTS dml_m_src")
    }
  }

  test("MERGE INTO: WHEN MATCHED DELETE and clause conditions first-match-wins") {
    val tbl = bootstrapOrders(tmpDir("dml-merge2"), "dml_merge2")
    spark.sql("DROP TABLE IF EXISTS dml_m2_t")
    spark.sql("DROP VIEW IF EXISTS dml_m2_src")
    spark.sql(s"CREATE TABLE dml_m2_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      before.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
        .createOrReplaceTempView("dml_m2_src")
      val matchedHigh = before.filter(col("o_orderkey") % 3 === 0 &&
        col("o_totalprice") > 200000).count()
      val matchedLow = before.filter(col("o_orderkey") % 3 === 0 &&
        col("o_totalprice") <= 200000).count()
      assert(matchedHigh > 0 && matchedLow > 0)

      // first clause wins where both would apply (condition on s.price)
      spark.sql(
        """MERGE INTO dml_m2_t t
          |USING dml_m2_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.price > 200000 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'L'""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === beforeCount - matchedHigh)
      assert(after.filter(col("o_orderstatus") === "L").count() === matchedLow)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m2_t")
      spark.sql("DROP VIEW IF EXISTS dml_m2_src")
    }
  }

  test("MERGE: a key deleted via one source row is not resurrected by an update via another") {
    val tbl = bootstrapOrders(tmpDir("dml-merge3"), "dml_merge3")
    spark.sql("DROP TABLE IF EXISTS dml_m3_t")
    spark.sql("DROP VIEW IF EXISTS dml_m3_src")
    spark.sql(s"CREATE TABLE dml_m3_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      val victims = before.filter(col("o_orderkey") % 50 === 0)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(victims.nonEmpty)
      // TWO source rows per victim key: one routes to the DELETE clause
      // (tag = 1), one to the UPDATE clause (tag = 0). Per-pair eligibility
      // alone would put the key in BOTH batches; the delete commits first
      // and the patch would then resurrect the key as a half-NULL row.
      before.filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), lit(1).as("tag"))
        .unionByName(before.filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey"), lit(0).as("tag")))
        .createOrReplaceTempView("dml_m3_src")

      spark.sql(
        """MERGE INTO dml_m3_t t USING dml_m3_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.tag = 1 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'R'""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      // every victim key is GONE — not resurrected, not half-NULL
      assert(after.filter(col("o_orderkey").isin(victims.toSeq: _*)).count() === 0)
      assert(after.filter(col("o_orderstatus") === "R").count() === 0)
      assert(after.count() === beforeCount - victims.size)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m3_t")
      spark.sql("DROP VIEW IF EXISTS dml_m3_src")
    }
  }

  test("MERGE UPDATE SET * and INSERT * expand by name (keys excluded from the update)") {
    val tbl = bootstrapOrders(tmpDir("dml-merge4"), "dml_merge4")
    spark.sql("DROP TABLE IF EXISTS dml_m4_t")
    spark.sql("DROP VIEW IF EXISTS dml_m4_src")
    spark.sql(s"CREATE TABLE dml_m4_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val dataCols = before.columns.filterNot(_.startsWith("_")).map(col).toSeq
      val beforeCount = before.count()
      // `*` expansion resolves over the relation's FULL output, so the
      // source must carry same-named META columns too (the engine drops
      // those assignments and stamps its own); matched half changes the
      // status, new-key half feeds INSERT *
      before.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("U*"))
        .unionByName(before.filter(col("o_orderkey") % 9 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 20000000)
          .withColumn("o_orderstatus", lit("I*")))
        .createOrReplaceTempView("dml_m4_src")
      assert(dataCols.nonEmpty) // schema sanity; metas intentionally kept
      val matched = before.filter(col("o_orderkey") % 3 === 0).count()
      val inserted = before.filter(col("o_orderkey") % 9 === 0).count()

      spark.sql(
        """MERGE INTO dml_m4_t t USING dml_m4_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.filter(col("o_orderstatus") === "U*").count() === matched)
      assert(after.filter(col("o_orderstatus") === "I*").count() === inserted)
      assert(after.count() === beforeCount + inserted)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m4_t")
      spark.sql("DROP VIEW IF EXISTS dml_m4_src")
    }
  }

  test("MERGE claims rows per (key, partition): same key in two partitions takes both clauses") {
    // the engine's key scope is per-partition — the same key may legally
    // live in two partitions; clause exclusivity must not collapse them
    val dir = tmpDir("dml-merge5")
    val tbl = s"$dir/tbl"
    val two = spark.read.parquet(sf("orders")).limit(200)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val both = two.withColumn("o_month", lit("m1"))
      .unionByName(two.withColumn("o_month", lit("m2"))
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY")))
    KeyedTable.create(spark, tbl, both, "dml_merge5",
      Seq("o_orderkey"), "o_orderdate", Seq("o_month"))
    spark.sql("DROP TABLE IF EXISTS dml_m5_t")
    spark.sql("DROP VIEW IF EXISTS dml_m5_src")
    spark.sql(s"CREATE TABLE dml_m5_t USING graft LOCATION '$tbl'")
    try {
      two.select("o_orderkey").distinct().createOrReplaceTempView("dml_m5_src")
      val nKeys = two.select("o_orderkey").distinct().count()
      spark.sql(
        """MERGE INTO dml_m5_t t USING dml_m5_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND t.o_month = 'm1' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'U2'""".stripMargin)
      val after = KeyedTable.read(spark, tbl)
      // m1 rows deleted; m2 rows of the SAME keys updated, not dropped
      assert(after.filter(col("o_month") === "m1").count() === 0)
      assert(after.filter(col("o_month") === "m2").count() === nKeys)
      assert(after.filter(col("o_month") === "m2" && col("o_orderstatus") =!= "U2")
        .count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m5_t")
      spark.sql("DROP VIEW IF EXISTS dml_m5_src")
    }
  }

  test("DELETE with an IN-subquery predicate routes through the engine") {
    val tbl = bootstrapOrders(tmpDir("dml-subq"), "dml_subq")
    spark.sql("DROP TABLE IF EXISTS dml_sq_t")
    spark.sql("DROP VIEW IF EXISTS dml_sq_keys")
    spark.sql(s"CREATE TABLE dml_sq_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl).count()
      val doomed = KeyedTable.read(spark, tbl)
        .filter(col("o_orderkey") % 40 === 0).select("o_orderkey")
      val doomedCount = doomed.count()
      doomed.createOrReplaceTempView("dml_sq_keys")
      assert(doomedCount > 0)
      spark.sql(
        "DELETE FROM dml_sq_t WHERE o_orderkey IN (SELECT o_orderkey FROM dml_sq_keys)")
      assert(KeyedTable.read(spark, tbl).count() === before - doomedCount)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_sq_t")
      spark.sql("DROP VIEW IF EXISTS dml_sq_keys")
    }
  }

  test("MERGE with all three clause kinds lands as ONE atomic commit") {
    val tbl = bootstrapOrders(tmpDir("dml-merge6"), "dml_merge6")
    spark.sql("DROP TABLE IF EXISTS dml_m6_t")
    spark.sql("DROP VIEW IF EXISTS dml_m6_src")
    spark.sql(s"CREATE TABLE dml_m6_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      val commitsBefore = CommitLog.requireState(spark, tbl).commits.size
      before.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          col("o_orderdate"), col("o_custkey"), col("o_month"))
        .unionByName(before.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 30000000).as("o_orderkey"),
            col("o_totalprice").as("price"), col("o_orderdate"),
            col("o_custkey"), col("o_month")))
        .createOrReplaceTempView("dml_m6_src")
      val nDel = before.filter(col("o_orderkey") % 4 === 0 &&
        col("o_totalprice") > 250000).count()
      val nUpd = before.filter(col("o_orderkey") % 4 === 0 &&
        col("o_totalprice") <= 250000).count()
      val nIns = before.filter(col("o_orderkey") % 11 === 0).count()
      assert(nDel > 0 && nUpd > 0 && nIns > 0)

      spark.sql(
        """MERGE INTO dml_m6_t t USING dml_m6_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.price > 250000 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'A'
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus,
          |  o_totalprice, o_orderdate, o_month)
          |  VALUES (s.o_orderkey, s.o_custkey, 'I', s.price, s.o_orderdate,
          |          s.o_month)""".stripMargin)

      // the statement is ONE engine commit — deletes, updates, and inserts
      // all under a single instant (a crash can't half-apply it)
      val st = CommitLog.requireState(spark, tbl)
      assert(st.commits.size === commitsBefore + 1)
      assert(st.latest.operation === "merge")
      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === beforeCount - nDel + nIns)
      assert(after.filter(col("o_orderstatus") === "A").count() === nUpd)
      assert(after.filter(col("o_orderstatus") === "I").count() === nIns)
      // every merged row carries the one commit instant
      assert(after.filter(col("o_orderstatus").isin("A", "I"))
        .filter(col("_hoodie_commit_time") =!= st.latest.commitTime).count() === 0)
      // time travel to the pre-merge instant serves the pristine snapshot
      val bootCt = st.commits.head.commitTime
      assert(KeyedTable.readAsOf(spark, tbl, bootCt).count() === beforeCount)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m6_t")
      spark.sql("DROP VIEW IF EXISTS dml_m6_src")
    }
  }

  test("MERGE on a MOR table is one delta commit; CDC surfaces its deletes and upserts") {
    val dir = tmpDir("dml-merge7")
    val tbl = s"$dir/tbl"
    val in = spark.read.parquet(sf("orders")).limit(500)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    KeyedTable.create(spark, tbl, in, "dml_merge7",
      Seq("o_orderkey"), "o_orderdate", Seq("o_month"),
      tableType = graft.model.TableType.MergeOnRead)
    spark.sql("DROP TABLE IF EXISTS dml_m7_t")
    spark.sql("DROP VIEW IF EXISTS dml_m7_src")
    spark.sql(s"CREATE TABLE dml_m7_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      val st0 = CommitLog.requireState(spark, tbl)
      before.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
        .createOrReplaceTempView("dml_m7_src")
      val nDel = before.filter(col("o_orderkey") % 5 === 0 &&
        col("o_totalprice") > 200000).count()
      val nUpd = before.filter(col("o_orderkey") % 5 === 0 &&
        col("o_totalprice") <= 200000).count()
      assert(nDel > 0 && nUpd > 0)

      spark.sql(
        """MERGE INTO dml_m7_t t USING dml_m7_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.price > 200000 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'""".stripMargin)

      val st = CommitLog.requireState(spark, tbl)
      assert(st.commits.size === st0.commits.size + 1)
      assert(st.latest.operation === "merge")
      // no base file was rewritten — the commit is one delta batch
      assert(st.latest.partitions.forall(_.mode == "delta"))
      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === beforeCount - nDel)
      assert(after.filter(col("o_orderstatus") === "M").count() === nUpd)
      // CDC over the merge commit: tombstones AND new images, one instant
      val changes = KeyedTable.readChanges(spark, tbl, st0.latest.commitTime)
      assert(changes.filter(col(KeyedTable.ChangeOp) === "delete").count() === nDel)
      assert(changes.filter(col(KeyedTable.ChangeOp) === "upsert").count() === nUpd)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m7_t")
      spark.sql("DROP VIEW IF EXISTS dml_m7_src")
    }
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: the CDC reconciliation sweep") {
    val tbl = bootstrapOrders(tmpDir("dml-merge8"), "dml_merge8")
    spark.sql("DROP TABLE IF EXISTS dml_m8_t")
    spark.sql("DROP VIEW IF EXISTS dml_m8_src")
    spark.sql(s"CREATE TABLE dml_m8_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      // the "feed": keys divisible by 2 are still present upstream
      before.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
        .createOrReplaceTempView("dml_m8_src")
      val inFeed = before.filter(col("o_orderkey") % 2 === 0).count()
      val leftFeedHigh = before.filter(col("o_orderkey") % 2 =!= 0 &&
        col("o_totalprice") > 300000).count()
      val leftFeedRest = beforeCount - inFeed - leftFeedHigh
      assert(inFeed > 0 && leftFeedHigh > 0 && leftFeedRest > 0)

      // rows still in the feed refresh; rows that left it: expensive ones
      // are deleted, the rest are flagged inactive — relational recompute
      // below must agree exactly
      spark.sql(
        """MERGE INTO dml_m8_t t USING dml_m8_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_totalprice = s.price + 1
          |WHEN NOT MATCHED BY SOURCE AND t.o_totalprice > 300000 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'Z'""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.count() === beforeCount - leftFeedHigh)
      assert(after.filter(col("o_orderkey") % 2 =!= 0).count() === leftFeedRest)
      assert(after.filter(col("o_orderstatus") === "Z").count() === leftFeedRest)
      assert(after.filter(col("o_orderkey") % 2 =!= 0 &&
        col("o_totalprice") > 300000).count() === 0)
      // matched side still refreshed in the same statement
      assert(after.filter(col("o_orderkey") % 2 === 0).count() === inFeed)
      // and it was ONE commit
      assert(CommitLog.requireState(spark, tbl).latest.operation === "merge")
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m8_t")
      spark.sql("DROP VIEW IF EXISTS dml_m8_src")
    }
  }

  test("MERGE clause conditions may carry IN-subqueries (resolved trees, no re-rendering)") {
    val tbl = bootstrapOrders(tmpDir("dml-merge9"), "dml_merge9")
    spark.sql("DROP TABLE IF EXISTS dml_m9_t")
    spark.sql("DROP VIEW IF EXISTS dml_m9_src")
    spark.sql("DROP VIEW IF EXISTS dml_m9_vip")
    spark.sql(s"CREATE TABLE dml_m9_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      before.filter(col("o_orderkey") % 6 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .createOrReplaceTempView("dml_m9_src")
      before.filter(col("o_orderkey") % 12 === 0).select("o_custkey").distinct()
        .createOrReplaceTempView("dml_m9_vip")
      val vip = spark.table("dml_m9_vip").collect().map(_.getLong(0)).toSet
      val expectVip = before.filter(col("o_orderkey") % 6 === 0 &&
        col("o_custkey").isin(vip.toSeq: _*)).count()
      val expectRest = before.filter(col("o_orderkey") % 6 === 0).count() - expectVip
      assert(expectVip > 0 && expectRest > 0)

      spark.sql(
        """MERGE INTO dml_m9_t t USING dml_m9_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.o_custkey IN (SELECT o_custkey FROM dml_m9_vip)
          |  THEN UPDATE SET o_orderstatus = 'V'
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'W'""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.filter(col("o_orderstatus") === "V").count() === expectVip)
      assert(after.filter(col("o_orderstatus") === "W").count() === expectRest)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m9_t")
      spark.sql("DROP VIEW IF EXISTS dml_m9_src")
      spark.sql("DROP VIEW IF EXISTS dml_m9_vip")
    }
  }

  test("MERGE UPDATE SET c = NULL writes a real NULL (full-row image, not a patch)") {
    val tbl = bootstrapOrders(tmpDir("dml-merge10"), "dml_merge10")
    spark.sql("DROP TABLE IF EXISTS dml_m10_t")
    spark.sql("DROP VIEW IF EXISTS dml_m10_src")
    spark.sql(s"CREATE TABLE dml_m10_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      before.filter(col("o_orderkey") % 8 === 0).select("o_orderkey")
        .createOrReplaceTempView("dml_m10_src")
      val hit = before.filter(col("o_orderkey") % 8 === 0).count()
      assert(hit > 0)
      assert(before.filter(col("o_orderpriority").isNull).count() === 0)

      spark.sql(
        """MERGE INTO dml_m10_t t USING dml_m10_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_orderpriority = NULL""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      assert(after.filter(col("o_orderpriority").isNull).count() === hit)
      // untouched columns of the patched rows kept their values
      assert(after.filter(col("o_orderkey") % 8 === 0 &&
        col("o_orderstatus").isNull).count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_m10_t")
      spark.sql("DROP VIEW IF EXISTS dml_m10_src")
    }
  }

  test("a merge killed before its single commit is invisible; fsck restores pre-statement") {
    val dir = tmpDir("dml-merge-crash")
    val tbl = s"$dir/tbl"
    val in = spark.read.parquet(sf("orders")).limit(400)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    KeyedTable.create(spark, tbl, in, "dml_mc",
      Seq("o_orderkey"), "o_orderdate", Seq("o_month"),
      tableType = graft.model.TableType.MergeOnRead)
    val st = graft.table.CommitLog.requireState(spark, tbl)
    val before = KeyedTable.read(spark, tbl).localCheckpoint()
    val beforeCount = before.count()

    // emulate a writer killed INSIDE mergeRows after the delta batch landed
    // but before the one commit JSON: marker up, mixed tombstone+image delta
    // on disk, no commit
    val ct = graft.table.CommitLog.newCommitTime()
    graft.table.CommitLog.beginInflight(spark, tbl, ct, "merge", Seq.empty,
      baseCommits = st.commits.map(_.commitTime))
    val dataCols = before.columns.filterNot(_.startsWith("_")).map(col).toSeq
    val images = graft.table.MetaColumns.withMeta(
        before.filter(col("o_orderkey") % 2 === 0).select(dataCols: _*)
          .withColumn("o_orderstatus", lit("GHOST")),
        Seq("o_orderkey"), Seq("o_month"), ct)
      .withColumn(graft.table.Deltas.DeletedCol, lit(false))
    val tombs = graft.table.MetaColumns.withMeta(
        before.filter(col("o_orderkey") % 2 =!= 0).select(dataCols: _*),
        Seq("o_orderkey"), Seq("o_month"), ct)
      .withColumn(graft.table.Deltas.DeletedCol, lit(true))
    graft.table.Deltas.write(images.unionByName(tombs), tbl, ct, Seq("o_month"))

    // the half-done statement is INVISIBLE to every reader (commit is truth)
    val after = KeyedTable.read(spark, tbl)
    assert(after.count() === beforeCount)
    assert(after.filter(col("o_orderstatus") === "GHOST").count() === 0)

    // fsck reports and sweeps it; state is exactly pre-statement
    val report = KeyedTable.fsck(spark, tbl, repair = false)
    assert(report.orphanDeltas.contains(ct) && report.staleInflights.contains(ct))
    KeyedTable.fsck(spark, tbl)
    assert(KeyedTable.fsck(spark, tbl, repair = false).clean)
    assert(KeyedTable.read(spark, tbl).count() === beforeCount)
    assert(graft.table.Deltas.liveCommits(spark, tbl).isEmpty)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source's new column; old rows null-fill") {
    val dir = tmpDir("dml-evo")
    val tbl = s"$dir/tbl"
    val in = spark.read.parquet(sf("orders")).limit(400)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    KeyedTable.create(spark, tbl, in, "dml_evo",
      Seq("o_orderkey"), "o_orderdate", Seq("o_month"))
    spark.sql("DROP VIEW IF EXISTS dml_evo_src")
    try {
      val before = KeyedTable.read(spark, tbl)
      val beforeCount = before.count()
      assert(!before.columns.contains("o_channel"))
      // source carries a column the table does NOT have (star expansion
      // resolves over the relation's full output, so metas ride along and
      // are dropped by the engine as in the plain star test)
      before.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("E"))
        .withColumn("o_channel", lit("web"))
        .unionByName(before.filter(col("o_orderkey") % 9 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 40000000)
          .withColumn("o_orderstatus", lit("F"))
          .withColumn("o_channel", lit("api")))
        .createOrReplaceTempView("dml_evo_src")
      val matched = before.filter(col("o_orderkey") % 3 === 0).count()
      val inserted = before.filter(col("o_orderkey") % 9 === 0).count()
      assert(matched > 0 && inserted > 0)

      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$tbl` t
           |USING dml_evo_src s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

      val after = KeyedTable.read(spark, tbl)
      // the schema evolved (add-only, appended after the data columns)...
      assert(after.columns.contains("o_channel"))
      assert(after.count() === beforeCount + inserted)
      // ...merged rows carry the source's values for it...
      assert(after.filter(col("o_orderstatus") === "E" &&
        col("o_channel") =!= "web").count() === 0)
      assert(after.filter(col("o_orderkey") >= 40000000 &&
        col("o_channel") =!= "api").count() === 0)
      assert(after.filter(col("o_orderstatus") === "E").count() === matched)
      // ...and every UNTOUCHED row (old partitions, never rewritten)
      // null-fills the new column at read time
      assert(after.filter(col("o_orderkey") % 3 =!= 0 &&
        col("o_orderkey") < 40000000 && col("o_channel").isNotNull).count() === 0)
      // the evolution landed as ONE metadata-only alter_schema commit,
      // followed by the ONE merge commit
      val ops = CommitLog.requireState(spark, tbl).commits.map(_.operation)
      assert(ops.count(_ == "alter_schema") === 1)
      assert(ops.last === "merge")
      // time travel to the pre-merge schema still works
      val bootCt = CommitLog.requireState(spark, tbl).commits.head.commitTime
      assert(KeyedTable.readAsOf(spark, tbl, bootCt).count() === beforeCount)
    } finally spark.sql("DROP VIEW IF EXISTS dml_evo_src")
  }

  test("MERGE WITH SCHEMA EVOLUTION on MOR: delta batch carries the new column; compaction keeps it") {
    val dir = tmpDir("dml-evo-mor")
    val tbl = s"$dir/tbl"
    val in = spark.read.parquet(sf("orders")).limit(300)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    KeyedTable.create(spark, tbl, in, "dml_evo_mor",
      Seq("o_orderkey"), "o_orderdate", Seq("o_month"),
      tableType = graft.model.TableType.MergeOnRead)
    spark.sql("DROP VIEW IF EXISTS dml_evm_src")
    try {
      val before = KeyedTable.read(spark, tbl)
      val hit = before.filter(col("o_orderkey") % 3 === 0).count()
      assert(hit > 0)
      before.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("gold").as("o_tier"))
        .createOrReplaceTempView("dml_evm_src")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$tbl` t
           |USING dml_evm_src s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET o_tier = s.o_tier""".stripMargin)
      // the merge landed as one DELTA batch under the evolved schema
      val st = CommitLog.requireState(spark, tbl)
      assert(st.latest.operation === "merge")
      assert(st.latest.partitions.forall(_.mode == "delta"))
      val merged = KeyedTable.read(spark, tbl)
      val mergedCount = merged.count() // materialized BEFORE compaction
      assert(merged.filter(col("o_tier") === "gold").count() === hit)
      assert(merged.filter(col("o_tier").isNull).count() === mergedCount - hit)
      // compaction folds the evolved deltas into base files, column intact
      KeyedTable.compact(spark, tbl)
      val compacted = KeyedTable.read(spark, tbl)
      assert(compacted.filter(col("o_tier") === "gold").count() === hit)
      assert(compacted.count() === mergedCount)
    } finally spark.sql("DROP VIEW IF EXISTS dml_evm_src")
  }

  test("MERGE WITH SCHEMA EVOLUTION on a session-catalog table routes through the engine") {
    val tbl = bootstrapOrders(tmpDir("dml-evo-v1"), "dml_evo_v1")
    spark.sql("DROP TABLE IF EXISTS dml_ev1_t")
    spark.sql("DROP VIEW IF EXISTS dml_ev1_src")
    spark.sql(s"CREATE TABLE dml_ev1_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      val hit = before.filter(col("o_orderkey") % 5 === 0).count()
      assert(hit > 0)
      // the session catalog's alterTable (GraftSessionCatalog) routes the
      // analyzer's AddColumn change into the engine's alter_schema commit,
      // so the evolving merge works on `USING graft` tables too
      before.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("fast").as("o_shipmode2"))
        .createOrReplaceTempView("dml_ev1_src")
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO dml_ev1_t t USING dml_ev1_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_shipmode2 = s.o_shipmode2""".stripMargin)
      val after = KeyedTable.read(spark, tbl)
      assert(after.columns.contains("o_shipmode2"))
      assert(after.filter(col("o_shipmode2") === "fast").count() === hit)
      assert(after.filter(col("o_shipmode2").isNull).count() === after.count() - hit)
      val ops = CommitLog.requireState(spark, tbl).commits.map(_.operation)
      assert(ops.count(_ == "alter_schema") === 1)
      assert(ops.last === "merge")
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_ev1_t")
      spark.sql("DROP VIEW IF EXISTS dml_ev1_src")
    }
  }

  test("strict-cardinality mode: a double-matched target row raises; default precombine-resolves") {
    val tbl = bootstrapOrders(tmpDir("dml-card"), "dml_card")
    spark.sql("DROP TABLE IF EXISTS dml_cd_t")
    spark.sql("DROP VIEW IF EXISTS dml_cd_src")
    spark.sql(s"CREATE TABLE dml_cd_t USING graft LOCATION '$tbl'")
    try {
      val before = KeyedTable.read(spark, tbl)
      // TWO source rows per key — the ANSI cardinality violation shape
      val dup = before.filter(col("o_orderkey") % 25 === 0)
        .select(col("o_orderkey"), lit("A").as("v"))
        .unionByName(before.filter(col("o_orderkey") % 25 === 0)
          .select(col("o_orderkey"), lit("B").as("v")))
      dup.createOrReplaceTempView("dml_cd_src")
      val hit = before.filter(col("o_orderkey") % 25 === 0).count()
      assert(hit > 0)
      val mergeSql =
        """MERGE INTO dml_cd_t t USING dml_cd_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_orderstatus = s.v""".stripMargin

      // opt-in strict mode: loud, actionable error
      spark.conf.set("spark.graft.merge.strictCardinality", "true")
      val e = try intercept[GraftException] { spark.sql(mergeSql) }
      finally spark.conf.unset("spark.graft.merge.strictCardinality")
      assert(e.getMessage.contains("cardinality violation"))
      // nothing was committed by the refused statement
      assert(KeyedTable.read(spark, tbl)
        .filter(col("o_orderstatus").isin("A", "B")).count() === 0)

      // default mode: Hudi semantics — ONE deterministic winner per key
      spark.sql(mergeSql)
      val after = KeyedTable.read(spark, tbl)
      assert(after.filter(col("o_orderstatus").isin("A", "B")).count() === hit)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_cd_t")
      spark.sql("DROP VIEW IF EXISTS dml_cd_src")
    }
  }

  test("property: random MERGE clause sets match a relational reference implementation") {
    // the clause-rank window (per-pair first-match-wins + per-row min
    // clause) is re-derived here in plain Scala and compared against the
    // engine's SQL MERGE over random clause subsets, orders, sources, and
    // both table types — the semantics' independent recompute
    import scala.util.Random
    case class R(id: Long, ver: Long, v: String, p: String)
    case class S(id: Long, ver: Long, v: String, p: String, tag: Long)

    case class MC(sql: String, kind: String,
        cond: (R, S) => Boolean, apply: (R, S) => R)
    case class BC(sql: String, kind: String,
        cond: R => Boolean, apply: R => R)
    case class IC(sql: String, cond: S => Boolean, apply: S => R)

    val m1 = MC("WHEN MATCHED AND s.tag % 2 = 0 THEN DELETE", "delete",
      (_, s) => s.tag % 2 == 0, (r, _) => r)
    val m2 = MC("WHEN MATCHED AND s.ver > t.ver THEN UPDATE SET v = s.v", "update",
      (r, s) => s.ver > r.ver, (r, s) => r.copy(v = s.v))
    val m3 = MC("WHEN MATCHED THEN UPDATE SET v = 'U' || s.v", "update",
      (_, _) => true, (r, s) => r.copy(v = "U" + s.v))
    val b1 = BC("WHEN NOT MATCHED BY SOURCE AND t.id % 3 = 0 THEN DELETE", "delete",
      r => r.id % 3 == 0, r => r)
    val b2 = BC("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'Z'", "update",
      _ => true, r => r.copy(v = "Z"))
    val i1 = IC("WHEN NOT MATCHED AND s.tag % 2 = 1 THEN INSERT (id, ver, v, p) " +
      "VALUES (s.id, s.ver, s.v, s.p)",
      s => s.tag % 2 == 1, s => R(s.id, s.ver, s.v, s.p))
    val i2 = IC("WHEN NOT MATCHED THEN INSERT (id, ver, v, p) " +
      "VALUES (s.id, s.ver + 1, 'N' || s.v, s.p)",
      _ => true, s => R(s.id, s.ver + 1, "N" + s.v, s.p))

    val rnd = new Random(71)
    for (round <- 1 to 5) {
      val matched0 = rnd.shuffle(Seq(m1, m2).filter(_ => rnd.nextBoolean())) ++
        (if (rnd.nextBoolean()) Seq(m3) else Nil)
      val bySource0 = Seq(b1).filter(_ => rnd.nextBoolean()) ++
        (if (rnd.nextBoolean()) Seq(b2) else Nil)
      val inserts0 = Seq(i1).filter(_ => rnd.nextBoolean()) ++
        (if (rnd.nextBoolean()) Seq(i2) else Nil)
      // an all-empty draw degenerates to the FULL clause surface, so every
      // round runs and at least one exercises all three groups together
      val allEmpty = matched0.isEmpty && bySource0.isEmpty && inserts0.isEmpty
      val matched = if (allEmpty) Seq(m1, m2, m3) else matched0
      val bySource = if (allEmpty) Seq(b1, b2) else bySource0
      val inserts = if (allEmpty) Seq(i1, i2) else inserts0
      locally {
        val tt = if (rnd.nextBoolean()) graft.model.TableType.MergeOnRead
          else graft.model.TableType.CopyOnWrite
        val base = (0 until 18).map(i => R(i.toLong, 0L, s"b$i", s"p${i % 3}"))
        val src = (0 until 26).map { _ =>
          val id = rnd.nextInt(30).toLong
          S(id, rnd.nextInt(5).toLong, s"s${rnd.nextInt(90)}", s"p${id % 3}",
            rnd.nextInt(10).toLong)
        }
        val tbl = s"${tmpDir(s"dml-prop$round")}/tbl"
        import spark.implicits._
        KeyedTable.create(spark, tbl,
          base.map(r => (r.id, r.ver, r.v, r.p)).toDF("id", "ver", "v", "p"),
          s"dml_prop$round", Seq("id"), "ver", Seq("p"), tableType = tt)
        src.map(s => (s.id, s.ver, s.v, s.p, s.tag))
          .toDF("id", "ver", "v", "p", "tag")
          .createOrReplaceTempView("dml_prop_src")
        spark.sql(
          (s"MERGE INTO graft.`$tbl` t USING dml_prop_src s ON t.id = s.id" +:
            (matched.map(_.sql) ++ inserts.map(_.sql) ++ bySource.map(_.sql)))
            .mkString("\n"))

        // ---- reference implementation of the engine's documented semantics
        val byId = src.groupBy(_.id)
        // precombine-resolution among same-(id,p) images: ver max, then the
        // remaining orderable columns desc (here: v) — dedupByKey's pinned order
        def resolve(imgs: Seq[R]): R = imgs.maxBy(r => (r.ver, r.v))
        val fromTarget: Seq[Option[R]] = base.map { r =>
          byId.get(r.id) match {
            case Some(pairs) =>
              val hits = pairs.flatMap(s =>
                matched.zipWithIndex.collectFirst {
                  case (c, i) if c.cond(r, s) => (i, c, s) })
              if (hits.isEmpty) Some(r) // matched, no clause applies: untouched
              else {
                val win = hits.map(_._1).min
                if (matched(win).kind == "delete") None
                else Some(resolve(hits.filter(_._1 == win)
                  .map { case (_, c, s) => c.apply(r, s) }))
              }
            case None =>
              bySource.find(_.cond(r)) match {
                case Some(c) if c.kind == "delete" => None
                case Some(c) => Some(c.apply(r))
                case None => Some(r)
              }
          }
        }
        val insertImgs = src.filterNot(s => base.exists(_.id == s.id))
          .flatMap(s => inserts.find(_.cond(s)).map(_.apply(s)))
          .groupBy(r => (r.id, r.p)).values.map(resolve(_)).toSeq
        val expected = (fromTarget.flatten ++ insertImgs)
          .map(r => (r.id, r.ver, r.v, r.p)).sorted

        val got = KeyedTable.read(spark, tbl)
          .select("id", "ver", "v", "p").as[(Long, Long, String, String)]
          .collect().toSeq.sorted
        assert(got === expected,
          s"round $round ($tt): matched=${matched.map(_.sql)} " +
            s"bySource=${bySource.map(_.sql)} inserts=${inserts.map(_.sql)}")
        // and it was ONE commit
        assert(CommitLog.commits(spark, tbl).map(_.operation) ===
          Seq("bootstrap", "merge"))
      }
    }
  }

  test("UPDATE refusals: key/partition assignment and meta-column predicates") {
    val tbl = bootstrapOrders(tmpDir("dml-refuse"), "dml_refuse")
    spark.sql("DROP TABLE IF EXISTS dml_ref_t")
    spark.sql(s"CREATE TABLE dml_ref_t USING graft LOCATION '$tbl'")
    try {
      val e1 = intercept[GraftException] {
        spark.sql("UPDATE dml_ref_t SET o_orderkey = 0 WHERE o_orderstatus = 'F'")
      }
      assert(e1.getMessage.contains("cannot assign key/partition/meta"))
      val e2 = intercept[GraftException] {
        spark.sql("UPDATE dml_ref_t SET o_month = '1999-01' WHERE o_orderstatus = 'F'")
      }
      assert(e2.getMessage.contains("cannot assign key/partition/meta"))
      val e3 = intercept[GraftException] {
        spark.sql("DELETE FROM dml_ref_t WHERE _hoodie_commit_time = '0'")
      }
      assert(e3.getMessage.contains("meta column"))
      // MERGE UPDATE assigning a key column is a row move, refused like
      // updateWhere
      KeyedTable.read(spark, tbl).select(col("o_orderkey"))
        .limit(3).createOrReplaceTempView("dml_ref_src")
      val e4 = intercept[GraftException] {
        spark.sql(
          """MERGE INTO dml_ref_t t USING dml_ref_src s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET o_orderkey = 0""".stripMargin)
      }
      assert(e4.getMessage.contains("cannot assign key/partition"))
      // an EXPLICIT meta assignment (non-star) is refused loudly, never
      // silently dropped — only star expansion's meta assignments are
      val e5 = intercept[GraftException] {
        spark.sql(
          """MERGE INTO dml_ref_t t USING dml_ref_src s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET _hoodie_commit_time = '0'""".stripMargin)
      }
      assert(e5.getMessage.contains("meta column"))
      // a target column smuggled through a CORRELATED subquery in a
      // source-only position still hits the designed refusal (references
      // include subquery outer refs), not an opaque bind failure
      val e6 = intercept[GraftException] {
        spark.sql(
          """MERGE INTO dml_ref_t t USING dml_ref_src s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN NOT MATCHED AND EXISTS (
            |  SELECT 1 FROM dml_ref_src x WHERE x.o_orderkey = t.o_custkey)
            |THEN INSERT (o_orderkey) VALUES (s.o_orderkey)""".stripMargin)
      }
      assert(e6.getMessage.contains("may reference source columns only"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_ref_t")
      spark.sql("DROP VIEW IF EXISTS dml_ref_src")
    }
  }
}
