package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model.GraftException

/** Delimited (CSV) and JSON-lines ingestion — the landing-zone formats every
  * pipeline meets before columnar conversion. [[SourceSniffer]] keeps the
  * reference's strict parquet/orc whitelist (app.py:441) and its error
  * taxonomy; this module is the "beyond the reference" extension with a
  * wider whitelist behind a distinct entry point, so reference-faithful
  * callers keep reference-faithful errors.
  *
  * Explicit schema is REQUIRED on every read: schema inference is a second
  * full pass over the data — invisible at test SF, a double read of a 100 TB
  * drop zone in production. Reads run FAILFAST so a malformed row aborts the
  * job instead of silently null-padding misparsed cells into the corpus.
  */
object TextSources {
  val ExtendedFormats: Set[String] = SourceSniffer.ValidFormats ++ Set("csv", "json")

  /** [[SourceSniffer.sniff]]'s directory walk with the extended whitelist. */
  def sniffAny(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw GraftException.config(s"Data file path does not exist: $path")
    SourceSniffer.firstFile(fs, p) match {
      case None => throw GraftException.config(s"No data files found under: $path")
      case Some(name) =>
        val ext = name.substring(name.lastIndexOf('.') + 1).toLowerCase
        if (!ExtendedFormats.contains(ext)) throw GraftException.unsupportedFormat(ext)
        ext
    }
  }

  /** Schema-applied read of any extended format. CSV expects a header row
    * (written by [[writeCsv]]); JSON is JSON-lines (Spark's default).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    sniffAny(spark, path) match {
      case "csv" =>
        spark.read.schema(schema).option("header", "true")
          .option("mode", "FAILFAST").csv(path)
      case "json" =>
        spark.read.schema(schema).option("mode", "FAILFAST").json(path)
      case fmt => spark.read.schema(schema).format(fmt).load(path)
    }

  /** Write helpers pinning the options [[read]] assumes. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
