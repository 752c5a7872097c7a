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
