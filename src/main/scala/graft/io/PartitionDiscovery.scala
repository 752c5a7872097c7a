package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** M4/M5 partition-layout discovery over a directory tree (app.py:439-500,
  * pyspark_script.py:180-196). Extracts hive-style `k=v` fields in directory
  * order, preserving first-seen order of field names (app.py:472-481), and
  * lists existing partition paths of a table excluding the commit-log dir
  * (the reference excludes `.hoodie`).
  *
  * Directory walks are namenode-metadata operations bounded by #partitions,
  * not data size — safe at any scale; nothing here reads file contents.
  */
object PartitionDiscovery {

  final case class Layout(isPartitioned: Boolean, partitionFields: Seq[String])

  private val KvDir = "([^/=]+)=([^/=]+)".r

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Walk the tree and collect partition field names in first-seen order. */
  def discover(spark: SparkSession, path: String): Layout = {
    val f = fs(spark, path)
    val fields = scala.collection.mutable.LinkedHashSet[String]()
    def walk(p: Path): Unit = {
      val dirs = f.listStatus(p).filter(_.isDirectory)
        .filterNot(d => d.getPath.getName.startsWith(".") || d.getPath.getName.startsWith("_"))
      dirs.foreach { d =>
        d.getPath.getName match {
          case KvDir(k, _) => fields += k
          case _ =>
        }
        walk(d.getPath)
      }
    }
    walk(new Path(path))
    Layout(fields.nonEmpty, fields.toSeq)
  }

  /** Existing partition paths of a table, to `depth` levels of `k=v` dirs
    * ("" never appears; unpartitioned tables return empty). Excludes hidden
    * and commit-log directories (M5).
    */
  def existingPartitions(spark: SparkSession, tablePath: String, depth: Int): Seq[String] = {
    val f = fs(spark, tablePath)
    val root = new Path(tablePath)
    if (depth <= 0 || !f.exists(root)) return Seq.empty
    def walk(p: Path, level: Int, prefix: String): Seq[String] = {
      val dirs = f.listStatus(p).filter(_.isDirectory)
        .map(_.getPath)
        .filterNot(d => d.getName.startsWith(".") || d.getName.startsWith("_"))
        .filter(d => KvDir.pattern.matcher(d.getName).matches())
      dirs.toSeq.flatMap { d =>
        val path = if (prefix.isEmpty) d.getName else s"$prefix/${d.getName}"
        if (level == depth) Seq(path) else walk(d, level + 1, path)
      }
    }
    walk(root, 1, "").sorted
  }
}
