package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.GraftException
import graft.table.PathCodec

class IoSpec extends SparkTestBase {

  test("sniffer finds parquet recursively and rejects unsupported/empty") {
    val d = tmpDir("sniff")
    Files.createDirectories(Paths.get(d, "a/b"))
    spark.read.parquet(sf("region")).write.mode("overwrite").parquet(s"$d/a/b/data")
    assert(SourceSniffer.sniff(spark, d) === "parquet")

    val bad = tmpDir("sniffbad")
    Files.writeString(Paths.get(bad, "x.csv"), "a,b")
    val e = intercept[GraftException](SourceSniffer.sniff(spark, bad))
    assert(e.getMessage === "Unsupported file format: csv")

    val empty = tmpDir("sniffempty")
    val e2 = intercept[GraftException](SourceSniffer.sniff(spark, empty))
    assert(e2.getMessage.startsWith("Configuration Error: No data files found"))
  }

  test("text sources: csv and json round-trip under explicit schema; sniffAny widens, still rejects unknown") {
    val src = spark.read.parquet(sf("region"))

    val csvDir = s"${tmpDir("tscsv")}/data"
    TextSources.writeCsv(src, csvDir)
    assert(TextSources.sniffAny(spark, csvDir) === "csv")
    val backCsv = TextSources.read(spark, csvDir, src.schema)
    assert(backCsv.schema === src.schema)
    assert(backCsv.orderBy("r_regionkey").collect()
      === src.orderBy("r_regionkey").collect())

    val jsonDir = s"${tmpDir("tsjson")}/data"
    TextSources.writeJson(src, jsonDir)
    assert(TextSources.sniffAny(spark, jsonDir) === "json")
    val backJson = TextSources.read(spark, jsonDir, src.schema)
    assert(backJson.orderBy("r_regionkey").collect()
      === src.orderBy("r_regionkey").collect())

    // parquet still flows through the generic branch
    val pqDir = s"${tmpDir("tspq")}/data"
    src.write.parquet(pqDir)
    assert(TextSources.read(spark, pqDir, src.schema).count() === src.count())

    // the extended whitelist is wider than the reference's, not unbounded
    val bad = tmpDir("tsbad")
    Files.writeString(Paths.get(bad, "x.txt"), "nope")
    val e = intercept[GraftException](TextSources.sniffAny(spark, bad))
    assert(e.getMessage === "Unsupported file format: txt")
  }

  test("partition discovery extracts k=v fields in first-seen order") {
    val d = tmpDir("disc")
    spark.read.parquet(sf("lineitem"))
      .withColumn("l_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("l_returnflag", "l_month").parquet(d)
    val layout = PartitionDiscovery.discover(spark, d)
    assert(layout.isPartitioned)
    assert(layout.partitionFields === Seq("l_returnflag", "l_month"))

    val parts = PartitionDiscovery.existingPartitions(spark, d, 2)
    assert(parts.nonEmpty)
    assert(parts.forall(_.matches("l_returnflag=[ANR]/l_month=\\d{4}-\\d{2}")))

    val flat = tmpDir("flat")
    spark.read.parquet(sf("region")).write.mode("overwrite").parquet(flat)
    assert(!PartitionDiscovery.discover(spark, flat).isPartitioned)
  }

  test("PathCodec round-trips timestamps and special characters") {
    val p = "o_orderdate=1995-01-15 00:00:00"
    assert(PathCodec.escape(p) === "o_orderdate=1995-01-15 00%3A00%3A00")
    assert(PathCodec.unescape(PathCodec.escape(p)) === p)
    val weird = "f=a/b:c%d"
    assert(PathCodec.unescape(PathCodec.escape(weird)) === weird)
    // DEL is in Spark's charToEscape (ExternalCatalogUtils) but not < ' '
    val del = "f=a\u007Fb"
    assert(PathCodec.escape(del) === "f=a%7Fb")
    assert(PathCodec.unescape(PathCodec.escape(del)) === del)
  }
}
