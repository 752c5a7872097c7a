package graft.io

import org.apache.spark.sql.SparkSession

/** M1-M3 catalog operators + the `check_path_or_table` dispatch
  * (app.py:361-370): the reference probes Hive over thrift (SHOW TABLES LIKE
  * app.py:403-415, DESCRIBE FORMATTED location app.py:418-436, partition
  * columns app.py:503-528) and falls back to an HDFS walk for paths
  * (app.py:392-400). Here the same contract runs against Spark's own
  * catalog — one JVM, no extra processes — with [[PartitionDiscovery]]
  * serving the path branch.
  */
object CatalogOps {

  /** The `check_path_or_table` response shape (app.py:367-389): existence,
    * resolved storage location, partitioned-ness, partition fields in order.
    */
  final case class Probe(
      exists: Boolean,
      location: Option[String],
      isPartitioned: Boolean,
      partitionFields: Seq[String])

  /** M1: SHOW TABLES LIKE → catalog existence (app.py:403-415). */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** M2: DESCRIBE FORMATTED → Location row (app.py:418-436). */
  def tableLocation(spark: SparkSession, name: String): Option[String] = {
    if (!tableExists(spark, name)) return None
    spark.sql(s"DESCRIBE FORMATTED $name")
      .filter("col_name = 'Location'")
      .collect().headOption.map(_.getString(1))
  }

  /** M3: partition columns after the `Partition Information` header
    * (app.py:503-528) — served by the catalog's column metadata directly.
    */
  def partitionColumns(spark: SparkSession, name: String): Seq[String] = {
    if (!tableExists(spark, name)) return Seq.empty
    spark.catalog.listColumns(name).collect()
      .filter(_.isPartition).map(_.name).toSeq
  }

  /** The dispatch of app.py:361-370: path-looking strings get a filesystem
    * walk; anything else is treated as a catalog table whose resolved
    * location is then walked for its partition layout.
    */
  def checkPathOrTable(spark: SparkSession, s: String): Probe = {
    val isPath = s.startsWith("hdfs://") || s.startsWith("file:/") || s.startsWith("/")
    if (isPath) {
      val f = PartitionDiscovery.fs(spark, s)
      if (!f.exists(new org.apache.hadoop.fs.Path(s)))
        Probe(exists = false, None, isPartitioned = false, Seq.empty)
      else {
        val layout = PartitionDiscovery.discover(spark, s)
        Probe(exists = true, Some(s), layout.isPartitioned, layout.partitionFields)
      }
    } else if (!tableExists(spark, s)) {
      Probe(exists = false, None, isPartitioned = false, Seq.empty)
    } else {
      val loc = tableLocation(spark, s)
      val parts = partitionColumns(spark, s)
      Probe(exists = true, loc, parts.nonEmpty, parts)
    }
  }
}
