package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hudi-shaped meta-columns, added with pure Column expressions (codegen'd;
  * no UDFs). The `_`-prefix is the schema-validation exclusion contract
  * (pyspark_script.py:154).
  */
object MetaColumns {
  val CommitTime = "_hoodie_commit_time"
  val RecordKey = "_hoodie_record_key"
  val PartitionPath = "_hoodie_partition_path"
  val all: Seq[String] = Seq(CommitTime, RecordKey, PartitionPath)

  /** Single key → plain stringified value; composite → "k1:v1,k2:v2"
    * (Hudi SimpleKeyGenerator / ComplexKeyGenerator formats).
    */
  def recordKey(keyFields: Seq[String]): Column =
    if (keyFields.size == 1) col(keyFields.head).cast("string")
    else concat_ws(",", keyFields.map(k => concat(lit(k + ":"), col(k).cast("string"))): _*)

  /** Hive-style partition path "f1=v1/f2=v2" — the string-format contract of
    * pyspark_script.py:239 + hive_style_partitioning=true
    * (pyspark_script.py:365). Empty for unpartitioned tables.
    */
  def partitionPath(partitionFields: Seq[String]): Column =
    if (partitionFields.isEmpty) lit("")
    else concat_ws("/", partitionFields.map(p => concat(lit(p + "="), col(p).cast("string"))): _*)

  def withMeta(df: DataFrame, keyFields: Seq[String], partitionFields: Seq[String],
      commitTime: String): DataFrame =
    df.withColumn(CommitTime, lit(commitTime))
      .withColumn(RecordKey, recordKey(keyFields))
      .withColumn(PartitionPath, partitionPath(partitionFields))

  def strip(df: DataFrame): DataFrame = df.drop(all: _*)
}
