package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName ...] — trailing names restrict the dump
    // to those queries (local iteration); the driver passes exactly two args
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    // queries run CONCURRENTLY on the shared session (they are independent:
    // per-query temp table dirs, no session-conf mutation, view/sink names
    // unique per query) — local[32] is underutilized by one lifecycle
    // query's serial commit steps, and the driver's harness budget covers
    // verify + oracle + bench together, so wall-clock here is the scarce
    // resource. Worker count via SPARK_GRAFT_VERIFY_PAR; failures print
    // per-query and never abort the dump.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach(queue.add)
    // Diagnostic sidecar: per-query canonical hash of the EXACT parquet the
    // driver's oracle compare will read (columns sorted by name, rows sorted
    // by their rendered form, cells rendered deterministically — doubles as
    // raw IEEE-754 bits so no formatter ambiguity). A committed copy of this
    // file from a local run lets a future hash-mismatch be localized: if the
    // driver's spark_check.json matches the committed one, Spark produced
    // identical results in both environments and the divergence is on the
    // oracle/compare side.
    val checks = new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()
    def cell(v: Any): String = v match {
      case null => "\\N"
      case d: Double => java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d))
      case f: Float => java.lang.Integer.toHexString(java.lang.Float.floatToIntBits(f))
      case b: java.math.BigDecimal => b.toPlainString
      case b: scala.math.BigDecimal => b.bigDecimal.toPlainString
      case a: Array[Byte] => a.map(x => f"$x%02x").mkString
      case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
      case r: org.apache.spark.sql.Row =>
        (0 until r.length).map(i => cell(r.get(i))).mkString("{", ",", "}")
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => cell(k) + "=" + cell(x) }.toSeq.sorted.mkString("<", ",", ">")
      case other => other.toString
    }
    def canonicalHash(name: String): Unit = {
      val df = spark.read.parquet(s"$outDir/$name")
      val cols = df.columns.sorted
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map(r => (0 until r.length).map(i => cell(r.get(i))).mkString("\u0001"))
        .sorted
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(rows.mkString("\n").getBytes("UTF-8"))
      checks.put(name, (rows.length.toLong, md.map(b => f"$b%02x").mkString))
    }
    val workers = (1 to math.max(1, par)).map { _ =>
      val t = new Thread(() => {
        var item = queue.poll()
        while (item != null) {
          val (name, fn) = item
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            canonicalHash(name)
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          item = queue.poll()
        }
      })
      t.setDaemon(true); t.start(); t
    }
    workers.foreach(_.join())
    val checkJson = {
      import scala.jdk.CollectionConverters._
      checks.asScala.toSeq.sortBy(_._1)
        .map { case (n, (rows, h)) => s""""$n": {"rows": $rows, "hash": "$h"}""" }
        .mkString("{", ",\n ", "}")
    }
    Files.writeString(Paths.get(s"$outDir/spark_check.json"), checkJson)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
