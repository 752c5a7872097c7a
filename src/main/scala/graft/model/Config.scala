package graft.model

/** Error taxonomy — the exact log-string contract of the reference
  * (pyspark_script.py:410-425): ValueError → "Configuration Error:",
  * PermissionError → "Permission Denied:", anything else → "Unexpected
  * Error:". Format sniffing additionally emits "Unsupported file format:"
  * (pyspark_script.py:337). These strings are a cross-process API (parsed
  * back at app.py:296-305), so they are kept byte-identical.
  */
class GraftException(message: String) extends RuntimeException(message)

/** Optimistic-concurrency rejection (Hudi `HoodieWriteConflictException`
  * analogue): another writer's commit landed after this write's base
  * instant and touches overlapping partitions. RETRYABLE by contract —
  * run fsck to clear the loser's staged data, re-read the table state,
  * and re-apply the write on top of the new tip.
  */
class CommitConflictException(message: String) extends GraftException(message)

object GraftException {
  def config(msg: String): GraftException = new GraftException(s"Configuration Error: $msg")
  def permission(msg: String): GraftException = new GraftException(s"Permission Denied: $msg")
  def unsupportedFormat(what: String): GraftException =
    new GraftException(s"Unsupported file format: $what")
  def unexpected(msg: String): GraftException = new GraftException(s"Unexpected Error: $msg")
  def conflict(msg: String): CommitConflictException =
    new CommitConflictException(s"Commit Conflict: $msg")
}

/** COPY_ON_WRITE / MERGE_ON_READ (pyspark_script.py:66, app.py:118).
  * Both table types have real, distinct write paths: COW rewrites the touched
  * partitions per upsert/delete (staging write + directory swap); MOR lands
  * each batch as a partitioned delta under `.graft/deltas/<commit>/` with
  * read-time merge and explicit compaction ([[graft.table.Deltas]],
  * [[graft.table.KeyedTable.compact]]) — hash-verified end-to-end by the
  * q22 lifecycle oracle query.
  */
sealed trait TableType { def name: String }
object TableType {
  case object CopyOnWrite extends TableType { val name = "COPY_ON_WRITE" }
  case object MergeOnRead extends TableType { val name = "MERGE_ON_READ" }
  def parse(s: String): TableType = s.trim.toUpperCase match {
    case "COPY_ON_WRITE" => CopyOnWrite
    case "MERGE_ON_READ" => MergeOnRead
    case other => throw GraftException.config(s"Invalid table type: $other")
  }
}

/** Bootstrap mode selectors (pyspark_script.py:375-389, H1-H4). */
sealed trait BootstrapType { def name: String }
object BootstrapType {
  case object MetadataOnly extends BootstrapType { val name = "METADATA_ONLY" }
  case object FullRecord extends BootstrapType { val name = "FULL_RECORD" }
  def parse(s: String): BootstrapType = s.trim.toUpperCase match {
    case "METADATA_ONLY" => MetadataOnly
    case "FULL_RECORD" => FullRecord
    case other => throw GraftException.config(s"Invalid bootstrap type: $other")
  }
}

/** insert | upsert | bulk_insert (backend.py:24, pyspark_script.py:270). */
sealed trait WriteOperation { def name: String }
object WriteOperation {
  case object Insert extends WriteOperation { val name = "insert" }
  case object Upsert extends WriteOperation { val name = "upsert" }
  case object BulkInsert extends WriteOperation { val name = "bulk_insert" }
  def parse(s: String): WriteOperation = s.trim.toLowerCase match {
    case "insert" => Insert
    case "upsert" => Upsert
    case "bulk_insert" => BulkInsert
    case other => throw GraftException.config(s"Invalid write operation: $other")
  }
}

/** The bootstrap job request — the argv surface of pyspark_script.py:294-315
  * plus app.py's HudiBootstrapRequest (app.py:112-123). Key/partition fields
  * are comma-separated composites in the reference (pyspark_script.py:127,
  * 137-141); modeled as Seq[String] from day one. `dryRun` is the declared
  * capability at backend.py:24-28: validate + plan + report the partitions
  * a run WOULD write, without touching the filesystem or commit log.
  */
final case class BootstrapConfig(
    dataFilePath: String,
    tablePath: String,
    tableName: String,
    keyFields: Seq[String],
    precombineField: String,
    partitionFields: Seq[String] = Seq.empty,
    tableType: TableType = TableType.CopyOnWrite,
    bootstrapType: BootstrapType = BootstrapType.FullRecord,
    partitionRegex: Option[String] = None,
    regexMode: BootstrapType = BootstrapType.MetadataOnly,
    resume: Boolean = false,
    dryRun: Boolean = false,
    sparkConfig: Map[String, String] = Map.empty) {

  /** Pre-flight validation (M7, pyspark_script.py:41-85 shape; path existence
    * is checked later with the filesystem in hand).
    */
  def validate(): Unit = {
    val errors = Seq.newBuilder[String]
    if (dataFilePath.trim.isEmpty) errors += "data file path must not be empty."
    if (tablePath.trim.isEmpty) errors += "output path must not be empty."
    if (tableName.trim.isEmpty) errors += "table name must not be empty."
    if (keyFields.isEmpty || keyFields.exists(_.trim.isEmpty)) errors += "key field must not be empty."
    if (precombineField.trim.isEmpty) errors += "precombine field must not be empty."
    val errs = errors.result()
    if (errs.nonEmpty) throw GraftException.config(errs.mkString("\n"))
  }
}
