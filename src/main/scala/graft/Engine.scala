package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{BootstrapConfig, GraftException, WriteOperation}
import graft.table.KeyedTable

/** Process-level facade mirroring the reference's job contract
  * (pyspark_script.py:294-429): run a bootstrap, map every failure onto the
  * exact error-log taxonomy that the control plane regex-parses back out of
  * the log (app.py:296-305).
  */
object Engine {

  final case class RunResult(
      success: Boolean,
      result: Option[KeyedTable.BootstrapResult],
      errorLog: Option[String]) {
    /** The job's observable log-line surface (counts contract + error taxonomy). */
    def logLines: Seq[String] =
      result.map(_.logLines).getOrElse(Seq.empty) ++ errorLog.toSeq
  }

  def bootstrap(spark: SparkSession, cfg: BootstrapConfig): RunResult =
    try RunResult(success = true, Some(KeyedTable.bootstrap(spark, cfg)), None)
    catch {
      case e: GraftException =>
        RunResult(success = false, None, Some(e.getMessage))
      case e: org.apache.hadoop.security.AccessControlException =>
        RunResult(success = false, None, Some(s"Permission Denied: ${e.getMessage}"))
      case e: Throwable =>
        RunResult(success = false, None, Some(s"Unexpected Error: ${e.getMessage}"))
    }

  def readOptimized(spark: SparkSession, tablePath: String): DataFrame =
    KeyedTable.readOptimized(spark, tablePath)

  def read(spark: SparkSession, tablePath: String): DataFrame =
    KeyedTable.read(spark, tablePath)

  def upsert(spark: SparkSession, tablePath: String, updates: DataFrame): Seq[String] =
    KeyedTable.upsert(spark, tablePath, updates)

  def append(spark: SparkSession, tablePath: String, batch: DataFrame,
      op: WriteOperation = WriteOperation.BulkInsert): Seq[String] =
    KeyedTable.append(spark, tablePath, batch, op)

  def delete(spark: SparkSession, tablePath: String, keys: DataFrame): Seq[String] =
    KeyedTable.delete(spark, tablePath, keys)

  def compact(spark: SparkSession, tablePath: String): Seq[String] =
    KeyedTable.compact(spark, tablePath)

  def cluster(spark: SparkSession, tablePath: String, sortCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Seq[String] =
    KeyedTable.cluster(spark, tablePath, sortCols, maxRecordsPerFile)

  def clusterZ(spark: SparkSession, tablePath: String, zCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Seq[String] =
    KeyedTable.clusterZ(spark, tablePath, zCols, maxRecordsPerFile)

  def readIncremental(spark: SparkSession, tablePath: String, sinceCommitTime: String): DataFrame =
    KeyedTable.readIncremental(spark, tablePath, sinceCommitTime)

  def rollback(spark: SparkSession, tablePath: String, toCommitTime: String): Seq[String] =
    KeyedTable.rollback(spark, tablePath, toCommitTime)

  def readAsOf(spark: SparkSession, tablePath: String, asOf: String): DataFrame =
    KeyedTable.readAsOf(spark, tablePath, asOf)

  def readChanges(spark: SparkSession, tablePath: String, sinceCommitTime: String): DataFrame =
    KeyedTable.readChanges(spark, tablePath, sinceCommitTime)

  def upsertGlobal(spark: SparkSession, tablePath: String, updates: DataFrame): Seq[String] =
    KeyedTable.upsertGlobal(spark, tablePath, updates)

  def savepoint(spark: SparkSession, tablePath: String, instant: String): String =
    KeyedTable.savepoint(spark, tablePath, instant)

  def deleteSavepoint(spark: SparkSession, tablePath: String, instant: String): Unit =
    KeyedTable.deleteSavepoint(spark, tablePath, instant)

  def restore(spark: SparkSession, tablePath: String, instant: String): Seq[String] =
    KeyedTable.restore(spark, tablePath, instant)

  def cleanArchive(spark: SparkSession, tablePath: String, retainLast: Int = KeyedTable.ArchiveRetention): Seq[String] =
    KeyedTable.cleanArchive(spark, tablePath, retainLast)

  def sync(spark: SparkSession, srcPath: String, dstPath: String, sinceCommitTime: String): String =
    graft.table.TableSync.sync(spark, srcPath, dstPath, sinceCommitTime)

  def files(spark: SparkSession, tablePath: String): DataFrame =
    KeyedTable.files(spark, tablePath)

  def timeline(spark: SparkSession, tablePath: String): DataFrame =
    KeyedTable.timeline(spark, tablePath)

  def clusterSort(spark: SparkSession, tablePath: String, sortCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Seq[String] =
    KeyedTable.clusterSort(spark, tablePath, sortCols, maxRecordsPerFile)

  def dropPartitions(spark: SparkSession, tablePath: String, partitions: Seq[String]): Seq[String] =
    KeyedTable.dropPartitions(spark, tablePath, partitions)

  def sizeFiles(spark: SparkSession, tablePath: String,
      targetFileBytes: Long = 128L * 1024 * 1024, slackFiles: Int = 1): Seq[String] =
    KeyedTable.sizeFiles(spark, tablePath, targetFileBytes, slackFiles)

  def indexStats(spark: SparkSession, tablePath: String, columns: Seq[String]): String =
    graft.table.StatsIndex.build(spark, tablePath, columns)

  def readBetween(spark: SparkSession, tablePath: String, column: String,
      lower: Option[Any], upper: Option[Any]): DataFrame =
    KeyedTable.readBetween(spark, tablePath, column, lower, upper)

  def readWhere(spark: SparkSession, tablePath: String,
      ranges: Seq[(String, Option[Any], Option[Any])]): DataFrame =
    KeyedTable.readWhere(spark, tablePath, ranges)

  def indexBloom(spark: SparkSession, tablePath: String, fpp: Double = 0.01): String =
    graft.table.BloomIndex.build(spark, tablePath, fpp)

  def readByKeys(spark: SparkSession, tablePath: String, keys: Seq[String]): DataFrame =
    graft.table.BloomIndex.readByKeys(spark, tablePath, keys)

  def pullChanges(spark: SparkSession, tablePath: String, checkpointDir: String,
      startAt: Option[String] = None)(
      handler: (DataFrame, graft.streaming.ChangeStream.Pull) => Unit)
      : Option[graft.streaming.ChangeStream.Pull] =
    graft.streaming.ChangeStream.pull(spark, tablePath, checkpointDir, startAt)(handler)

  def syncToContinuous(spark: SparkSession, srcPath: String, dstPath: String,
      checkpointDir: String, startAt: Option[String] = None)
      : Option[graft.streaming.ChangeStream.Pull] =
    graft.streaming.ChangeStream.syncTo(spark, srcPath, dstPath, checkpointDir, startAt)

  def fsck(spark: SparkSession, tablePath: String, repair: Boolean = true)
      : KeyedTable.FsckReport =
    KeyedTable.fsck(spark, tablePath, repair)

  def compactIfNeeded(spark: SparkSession, tablePath: String,
      maxDeltaRatio: Double = 0.10, maxDeltaCommits: Int = 10): Option[Seq[String]] =
    KeyedTable.compactIfNeeded(spark, tablePath, maxDeltaRatio, maxDeltaCommits)

  def upsertPartial(spark: SparkSession, tablePath: String, updates: DataFrame): Seq[String] =
    KeyedTable.upsertPartial(spark, tablePath, updates)

  def deleteWhere(spark: SparkSession, tablePath: String, predicate: String): Seq[String] =
    KeyedTable.deleteWhere(spark, tablePath, predicate)

  def updateWhere(spark: SparkSession, tablePath: String, predicate: String,
      sets: Map[String, String]): Seq[String] =
    KeyedTable.updateWhere(spark, tablePath, predicate, sets)

  def syncAgg(spark: SparkSession, tablePath: String, destPath: String,
      groupCols: Seq[String], sumCols: Seq[String]): graft.table.IncrementalAgg.SyncResult =
    graft.table.IncrementalAgg.sync(spark, tablePath, destPath, groupCols, sumCols)

  def readAgg(spark: SparkSession, destPath: String): DataFrame =
    graft.table.IncrementalAgg.result(spark, destPath)
}
