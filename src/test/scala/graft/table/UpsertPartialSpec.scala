package graft.table

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model._

/** Partial-update upsert: NULL/absent columns preserve table values. */
class UpsertPartialSpec extends SparkTestBase {
  import spark.implicits._

  private def ordersIn(outDir: String): String = {
    spark.read.parquet(sf("orders"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  private def cfg(input: String, table: String, tt: TableType) = BootstrapConfig(
    dataFilePath = input, tablePath = table, tableName = "orders_patch",
    keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
    partitionFields = Seq("o_month"), tableType = tt)

  for (tt <- Seq(TableType.CopyOnWrite, TableType.MergeOnRead))
    test(s"patch preserves absent columns, overwrites provided, inserts new keys (${tt.name})") {
      val in = ordersIn(tmpDir("in"))
      val table = tmpDir("tbl")
      KeyedTable.bootstrap(spark, cfg(in, table, tt))
      val row = KeyedTable.read(spark, table)
        .select("o_orderkey", "o_month", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey").head()
      val (k, m, ts) = (row.getLong(0), row.getString(1),
        row.getAs[java.time.LocalDateTime](2))
      val origPrice = row.getDouble(3)

      // on MOR, land a prior uncompacted delta so the patch must resolve
      // against the MERGED current state, not just base files
      if (tt == TableType.MergeOnRead) {
        val base = KeyedTable.read(spark, table)
        KeyedTable.upsert(spark, table, base.filter(col("o_orderkey") === k)
          .select(base.columns.filterNot(_.startsWith("_")).map(col).toSeq: _*)
          .withColumn("o_orderstatus", lit("DELTA")))
      }

      val patch = Seq((k, m, ts, "PATCHED"), (k + 9999999L, m, ts, "FRESH"))
        .toDF("o_orderkey", "o_month", "o_orderdate", "o_orderstatus")
      KeyedTable.upsertPartial(spark, table, patch)

      val after = KeyedTable.read(spark, table)
      val patched = after.filter(col("o_orderkey") === k).head()
      assert(patched.getAs[String]("o_orderstatus") === "PATCHED")
      assert(patched.getAs[Double]("o_totalprice") === origPrice) // preserved
      val fresh = after.filter(col("o_orderkey") === k + 9999999L).head()
      assert(fresh.getAs[String]("o_orderstatus") === "FRESH")
      assert(fresh.isNullAt(fresh.fieldIndex("o_totalprice"))) // no old value to keep
    }

  test("unknown and missing columns are refused") {
    val in = ordersIn(tmpDir("in"))
    val table = tmpDir("tbl")
    KeyedTable.bootstrap(spark, cfg(in, table, TableType.CopyOnWrite))
    val e = intercept[GraftException] {
      KeyedTable.upsertPartial(spark, table,
        Seq((1L, "1995-01", "x")).toDF("o_orderkey", "o_month", "o_nope"))
    }
    assert(e.getMessage.contains("unknown column"))
    val e2 = intercept[GraftException] {
      KeyedTable.upsertPartial(spark, table,
        Seq((1L, "S")).toDF("o_orderkey", "o_orderstatus"))
    }
    assert(e2.getMessage.contains("must carry key/partition/precombine"))
  }
}
