package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session per suite; temp dirs per test. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.builder("local[4]", "4").getOrCreate()

  def sf(name: String): String = s"/root/testdata/sf0.001/$name.parquet"

  def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }
}
