package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.model.GraftException

/** S3 format sniffing (pyspark_script.py:87-119): recursively find the first
  * data file under a path and decide parquet vs orc from its extension;
  * error on unsupported extensions or an empty tree. The walk touches only
  * directory listings (namenode metadata), never file contents.
  */
object SourceSniffer {
  val ValidFormats: Set[String] = Set("parquet", "orc") // app.py:441

  def sniff(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw GraftException.config(s"Data file path does not exist: $path")
    firstFile(fs, p) match {
      case None => throw GraftException.config(s"No data files found under: $path")
      case Some(name) =>
        val ext = name.substring(name.lastIndexOf('.') + 1).toLowerCase
        if (!ValidFormats.contains(ext)) throw GraftException.unsupportedFormat(ext)
        ext
    }
  }

  /** First non-hidden file name in a depth-first walk, mirroring the
    * reference's os.walk-style recursion.
    */
  private[io] def firstFile(fs: FileSystem, p: Path): Option[String] = {
    val entries = fs.listStatus(p).sortBy(_.getPath.getName)
    val visible = entries.filterNot { e =>
      val n = e.getPath.getName
      n.startsWith(".") || n.startsWith("_")
    }
    visible.find(_.isFile).map(_.getPath.getName)
      .orElse(visible.filter(_.isDirectory).iterator
        .flatMap(d => firstFile(fs, d.getPath)).nextOption())
  }
}
