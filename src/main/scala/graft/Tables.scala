package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table readers (TESTDATA.md). One parquet file per table under the
  * scale-factor directory the driver passes in. Reads are plain parquet scans
  * so Catalyst can push filters/prune columns into the scan
  * (reference input surface: pyspark_script.py:332-337, Parquet/ORC only).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-merging scan — reference reads with mergeSchema=true
    * (pyspark_script.py:333,335). Costs a footer read per file; only use when
    * files may disagree on schema.
    */
  def readMerged(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** `events.ts` is physically TIMESTAMP(NANOS), which Spark's parquet reader
    * only accepts as a raw long (spark.sql.legacy.parquet.nanosAsLong=true —
    * set in [[Sessions]]). Convert to a proper timestamp at micros precision
    * with integer division (nanos exceed 2^53, so double division would lose
    * precision).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
