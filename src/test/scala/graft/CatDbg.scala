package graft
import org.apache.spark.sql.functions._
import graft.model._
import graft.table.KeyedTable
object CatDbg {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val dir = java.nio.file.Files.createTempDirectory("catdbg").toString
    val in = s"$dir/in"; val tbl = s"$dir/tbl"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").parquet(in)
    KeyedTable.bootstrap(spark, BootstrapConfig(
      dataFilePath = in, tablePath = tbl, tableName = "dbg",
      keyFields = Seq("o_orderkey"), precombineField = "o_orderdate",
      partitionFields = Seq("o_month")))
    println("== stats call")
    spark.sql(s"CALL graft.system.index_stats('$tbl', 'o_custkey')").show(false)
    println("== bloom call")
    spark.sql(s"CALL graft.system.index_bloom('$tbl')").show(false)
    println("== done")
    spark.stop()
  }
}
