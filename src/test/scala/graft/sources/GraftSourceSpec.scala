package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{BootstrapConfig, GraftException, TableType}
import graft.table.KeyedTable

class GraftSourceSpec extends SparkTestBase {

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

  test("format('graft') snapshot read matches KeyedTable.read") {
    val tbl = bootstrapOrders(tmpDir("graft-dsv2"), "dsv2_orders")
    val viaSource = spark.read.format("graft").load(tbl)
    val direct = KeyedTable.read(spark, tbl)
    assert(viaSource.schema.fieldNames.toSeq == direct.schema.fieldNames.toSeq)
    assert(viaSource.count() == direct.count())
    assert(viaSource.select("o_orderkey", "o_orderstatus", "o_totalprice")
      .exceptAll(direct.select("o_orderkey", "o_orderstatus", "o_totalprice")).isEmpty)
  }

  test("pruning and filters reach the source; answers unchanged") {
    val tbl = bootstrapOrders(tmpDir("graft-dsv2-prune"), "dsv2_prune")
    val q = spark.read.format("graft").load(tbl)
      .filter(col("o_month") === "1995-01")
      .select("o_orderkey", "o_totalprice")
    val expected = KeyedTable.read(spark, tbl)
      .filter(col("o_month") === "1995-01")
      .select("o_orderkey", "o_totalprice")
    assert(q.exceptAll(expected).isEmpty && expected.exceptAll(q).isEmpty)
    // count(*) over the source: empty pruned schema must still count rows
    assert(spark.read.format("graft").load(tbl).count() ==
      KeyedTable.read(spark, tbl).count())
  }

  test("asOf option time-travels; mode=read_optimized skips live deltas") {
    val dir = tmpDir("graft-dsv2-asof")
    val tbl = s"$dir/tbl"
    val in = s"$dir/in"
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    val boot = KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = "dsv2_asof",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead))
    val base = KeyedTable.read(spark, tbl)
    val dataCols = base.columns.filterNot(_.startsWith("_")).map(col).toSeq
    KeyedTable.upsert(spark, tbl, base
      .filter(col("o_orderkey") % 10 === 0)
      .select(dataCols: _*)
      .withColumn("o_orderstatus", lit("V2")))

    val asOf = spark.read.format("graft").option("asOf", boot.commitTime).load(tbl)
    assert(asOf.filter(col("o_orderstatus") === "V2").count() == 0)
    assert(asOf.count() == base.count())

    val ro = spark.read.format("graft").option("mode", "read_optimized").load(tbl)
    assert(ro.filter(col("o_orderstatus") === "V2").count() == 0)
    val snap = spark.read.format("graft").load(tbl)
    assert(snap.filter(col("o_orderstatus") === "V2").count() > 0)
  }

  test("CREATE TABLE ... USING graft serves pure-SQL reads") {
    val tbl = bootstrapOrders(tmpDir("graft-dsv2-sql"), "dsv2_sql")
    spark.sql("DROP TABLE IF EXISTS graft_sql_spec")
    spark.sql(s"CREATE TABLE graft_sql_spec USING graft LOCATION '$tbl'")
    try {
      val got = spark.sql(
        """SELECT o_month, count(*) AS cnt FROM graft_sql_spec
          |GROUP BY o_month ORDER BY o_month""".stripMargin).collect()
      val want = KeyedTable.read(spark, tbl)
        .groupBy("o_month").agg(count(lit(1)).as("cnt"))
        .orderBy("o_month").collect()
      assert(got.toSeq == want.toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_spec")
  }

  test("df.write.format('graft') creates a table; append upserts by key") {
    val dir = tmpDir("graft-write")
    val tbl = s"$dir/tbl"
    val src = spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))

    // create via DataFrameWriter (no pre-existing table)
    src.write.format("graft")
      .option("keyFields", "o_orderkey").option("precombineField", "o_orderdate")
      .option("partitionFields", "o_month").option("tableName", "w_orders")
      .save(tbl)
    val created = KeyedTable.read(spark, tbl)
    assert(created.count() === src.count())
    assert(graft.table.CommitLog.commits(spark, tbl).map(_.operation) === Seq("bootstrap"))

    // append mode = upsert: existing keys replaced, not duplicated
    val k = created.agg(min("o_orderkey")).head().getLong(0)
    val upd = created.filter(col("o_orderkey") === k)
      .select(created.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit("W2"))
    upd.write.format("graft").mode("append").save(tbl)
    val after = KeyedTable.read(spark, tbl)
    assert(after.count() === src.count())
    assert(after.filter(col("o_orderkey") === k).head()
      .getAs[String]("o_orderstatus") === "W2")

    // errorIfExists refuses; ignore no-ops; overwrite re-creates reusing config
    intercept[GraftException] { upd.write.format("graft").save(tbl) }
    upd.withColumn("o_orderstatus", lit("IGNORED"))
      .write.format("graft").mode("ignore").save(tbl)
    assert(KeyedTable.read(spark, tbl).filter(col("o_orderstatus") === "IGNORED").count() === 0)
    src.limit(100).write.format("graft").mode("overwrite").save(tbl)
    val re = KeyedTable.read(spark, tbl)
    assert(re.count() === 100)
    val st = graft.table.CommitLog.requireState(spark, tbl).latest
    assert(st.keyFields === Seq("o_orderkey") && st.tableName === "w_orders")
  }

  test("INSERT INTO a catalog graft table upserts; CTAS creates") {
    val tbl = bootstrapOrders(tmpDir("graft-insert"), "ins_orders")
    spark.sql("DROP TABLE IF EXISTS graft_ins_spec")
    spark.sql(s"CREATE TABLE graft_ins_spec USING graft LOCATION '$tbl'")
    try {
      val before = spark.table("graft_ins_spec")
      val n = before.count()
      val k = before.agg(min("o_orderkey")).head().getLong(0)
      val upd = before.filter(col("o_orderkey") === k)
        .withColumn("o_orderstatus", lit("SQLUP"))
      upd.createOrReplaceTempView("graft_ins_upd")
      spark.sql("INSERT INTO graft_ins_spec SELECT * FROM graft_ins_upd")
      val after = spark.table("graft_ins_spec")
      assert(after.count() === n) // upsert, not duplicate
      assert(after.filter(col("o_orderkey") === k).head()
        .getAs[String]("o_orderstatus") === "SQLUP")

      // CTAS: derive a new graft table purely in SQL
      val dir2 = tmpDir("graft-ctas")
      spark.sql("DROP TABLE IF EXISTS graft_ctas_spec")
      spark.sql(
        s"""CREATE TABLE graft_ctas_spec USING graft LOCATION '$dir2/tbl'
           |OPTIONS (keyFields 'o_orderkey', precombineField 'o_orderdate',
           |         partitionFields 'o_month')
           |AS SELECT * FROM graft_ins_spec WHERE o_month >= '1995-06'""".stripMargin)
      val want = after.filter(col("o_month") >= "1995-06").count()
      assert(spark.table("graft_ctas_spec").count() === want)
      assert(KeyedTable.read(spark, s"$dir2/tbl").count() === want)
      spark.sql("DROP TABLE IF EXISTS graft_ctas_spec")
    } finally spark.sql("DROP TABLE IF EXISTS graft_ins_spec")
  }

  test("INSERT OVERWRITE from the table itself stages before replacing") {
    val tbl = bootstrapOrders(tmpDir("graft-selfow"), "selfow_orders")
    spark.sql("DROP TABLE IF EXISTS graft_selfow_spec")
    spark.sql(s"CREATE TABLE graft_selfow_spec USING graft LOCATION '$tbl'")
    try {
      val want = spark.table("graft_selfow_spec")
        .filter(col("o_month") >= "1995-06").count()
      assert(want > 0)
      // the SELECT reads the very table being overwritten — a delete-first
      // implementation would destroy the source mid-plan
      spark.sql(
        """INSERT OVERWRITE graft_selfow_spec
          |SELECT * FROM graft_selfow_spec WHERE o_month >= '1995-06'""".stripMargin)
      assert(spark.table("graft_selfow_spec").count() === want)
      assert(KeyedTable.read(spark, tbl).count() === want)
    } finally spark.sql("DROP TABLE IF EXISTS graft_selfow_spec")
  }

  test("range predicates route through the stats index; answers unchanged") {
    val dir = tmpDir("graft-skip")
    val tbl = s"$dir/tbl"
    val in = s"$dir/in"
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = "skip_orders",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month"), tableType = TableType.MergeOnRead))
    KeyedTable.clusterSort(spark, tbl, Seq("o_custkey"))
    graft.table.StatsIndex.build(spark, tbl, Seq("o_custkey"))

    def q(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("o_custkey") >= 100 && col("o_custkey") < 200)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey").collect().toSeq
    val expected = q(KeyedTable.read(spark, tbl))
    assert(q(spark.read.format("graft").load(tbl)) === expected)

    // strict '<' maps to an inclusive prune bound + residual strictness
    val ranges = GraftDataSource.toRanges(Seq(
      org.apache.spark.sql.sources.And(
        org.apache.spark.sql.sources.GreaterThanOrEqual("o_custkey", 100L),
        org.apache.spark.sql.sources.LessThan("o_custkey", 200L))))
    assert(ranges === Seq(("o_custkey", Some(100L), None), ("o_custkey", None, Some(200L))))

    // a live delta forces the merged-snapshot fallback — still correct
    val base = KeyedTable.read(spark, tbl)
    val k = base.filter(col("o_custkey") >= 100 && col("o_custkey") < 200)
      .agg(min("o_orderkey")).head().getLong(0)
    KeyedTable.upsert(spark, tbl, base.filter(col("o_orderkey") === k)
      .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
      .withColumn("o_orderstatus", lit("DX")))
    val viaSql = spark.read.format("graft").load(tbl)
      .filter(col("o_custkey") >= 100 && col("o_custkey") < 200)
    assert(viaSql.filter(col("o_orderkey") === k).head()
      .getAs[String]("o_orderstatus") === "DX")
  }

  test("option validation fails loudly") {
    intercept[GraftException] {
      GraftDataSource.readOptions(Map("path" -> "/x", "mode" -> "nope"))
    }
    intercept[GraftException] {
      GraftDataSource.readOptions(Map("path" -> "/x", "asOf" -> "1", "mode" -> "read_optimized"))
    }
    intercept[GraftException] { GraftDataSource.readOptions(Map.empty) }
  }
}
