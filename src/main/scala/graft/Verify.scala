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
    val workers = (1 to math.max(1, par)).map { _ =>
      val t = new Thread(() => {
        var item = queue.poll()
        while (item != null) {
          val (name, fn) = item
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          item = queue.poll()
        }
      })
      t.setDaemon(true); t.start(); t
    }
    workers.foreach(_.join())
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
