package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted join equals plain join on a maximally skewed key") {
    val li = spark.read.parquet(sf("lineitem"))
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("label", concat(lit("flag_"), col("l_returnflag")))

    val plain = li.join(dim, Seq("l_returnflag"))
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, dim, Seq("l_returnflag"),
        salt = 8, saltExpr = pmod(col("l_orderkey"), lit(8)))
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted.size === 3)
  }
}
