package graft.table

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Last-outcome journal of the best-effort maintenance hooks (`index.auto`,
  * `compact.auto`, `campaign.reclaim`): each hook records what its most
  * recent run DID — ok with a detail, or skipped with the error — so an
  * operator can audit "is my hands-off maintenance actually running?"
  * from SQL (`.maintenance` meta relation / `show_maintenance` procedure)
  * instead of grepping driver logs for the best-effort skip lines.
  *
  * One tiny JSON beside the properties file (`.graft/maintenance.json`),
  * one row per service, overwritten per run (temp-file + rename, like
  * [[TableProperties]]). Each record is a whole-file read-modify-write, so
  * it runs under the same "props" [[MetaMutex]] as property writes:
  * concurrent hooks for DIFFERENT services (index.auto in writer A racing
  * compact.auto in writer B) each keep the other's latest row — without
  * the mutex a stale read would rewrite the file minus the other service.
  * Within ONE service, last-writer-wins stands (a "latest outcome"
  * surface). Recording is itself best-effort: a journal write failure —
  * including a mutex acquire timeout — never fails the hook, let alone the
  * data publish under it.
  */
object MaintenanceLog {

  final case class Entry(service: String, at: String, trigger: String,
      outcome: String, detail: String)

  def logPath(tablePath: String): Path =
    new Path(CommitLog.logDir(tablePath), "maintenance.json")

  /** Record `service`'s latest run. Never throws. */
  def record(
      spark: SparkSession, tablePath: String, service: String,
      trigger: String, outcome: String, detail: String): Unit =
    try MetaMutex.withLock(spark, tablePath, "props") {
      val entries = read(spark, tablePath).filterNot(_.service == service) :+
        Entry(service, CommitLog.instantOfMillis(System.currentTimeMillis()),
          trigger, outcome, detail.take(500))
      val fs = CommitLog.fs(spark, tablePath)
      val p = logPath(tablePath)
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      entries.foreach { e =>
        val n = root.putObject(e.service)
        n.put("at", e.at); n.put("trigger", e.trigger)
        n.put("outcome", e.outcome); n.put("detail", e.detail)
      }
      val out = fs.create(tmp, true)
      try out.write(mapper.writeValueAsBytes(root)) finally out.close()
      if (fs.exists(p)) fs.delete(p, false)
      fs.rename(tmp, p)
      ()
    } catch { case _: Exception => () }

  /** Latest outcome per service, service-sorted; empty when no hook has
    * ever run (or the journal is unreadable — observability must not
    * throw).
    */
  def read(spark: SparkSession, tablePath: String): Seq[Entry] =
    try {
      val fs = CommitLog.fs(spark, tablePath)
      val p = logPath(tablePath)
      if (!fs.exists(p)) return Seq.empty
      val in = fs.open(p)
      val node = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
      node.properties().asScala.map { e =>
        val n = e.getValue
        Entry(e.getKey,
          Option(n.get("at")).map(_.asText()).getOrElse(""),
          Option(n.get("trigger")).map(_.asText()).getOrElse(""),
          Option(n.get("outcome")).map(_.asText()).getOrElse(""),
          Option(n.get("detail")).map(_.asText()).getOrElse(""))
      }.toSeq.sortBy(_.service)
    } catch { case _: Exception => Seq.empty }
}
