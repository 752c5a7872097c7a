package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental replication: apply a source table's change feed
  * ([[KeyedTable.readChanges]]) to a destination keyed table with the same
  * key/partition configuration — the downstream half of a CDC pipeline
  * (keep a derived/serving copy in sync by reading only what changed, not
  * the table). Deletes apply before upserts, matching the change-feed
  * contract: a key deleted and re-inserted since the watermark carries both
  * events, and the upsert image is the final state.
  *
  * At scale each sync costs O(|changes|): the change feed is
  * partition-pruned at the source, and the destination writes touch only
  * the partitions the changes land in. The caller owns the watermark
  * (returned high-water mark = source tip at read time), so syncs compose:
  * `w2 = sync(src, dst, w1)`.
  */
object TableSync {

  /** Replicate changes committed to `srcPath` after `sinceCommitTime` into
    * `dstPath`. Returns the new high-water mark to pass to the next sync.
    */
  def sync(
      spark: SparkSession,
      srcPath: String,
      dstPath: String,
      sinceCommitTime: String): String = {
    val st = CommitLog.requireState(spark, srcPath)
    val highWater = st.latest.commitTime
    if (highWater <= sinceCommitTime) return sinceCommitTime

    val keyF = st.latest.keyFields
    val partF = st.latest.partitionFields
    val changes = KeyedTable.readChanges(spark, srcPath, sinceCommitTime).persist()
    try {
      val deletes = changes.filter(col(KeyedTable.ChangeOp) === "delete")
        .select((keyF ++ partF).map(col): _*)
      val upserts = changes.filter(col(KeyedTable.ChangeOp) === "upsert")
        .drop(KeyedTable.ChangeOp).drop(MetaColumns.all: _*)
      // one grouped count instead of two isEmpty probes over the persisted
      // interval (IndexSync.applyInterval's op-histogram pattern)
      val ops = changes.groupBy(col(KeyedTable.ChangeOp)).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (ops.getOrElse("delete", 0L) > 0L) KeyedTable.delete(spark, dstPath, deletes)
      if (ops.getOrElse("upsert", 0L) > 0L) KeyedTable.upsert(spark, dstPath, upserts)
    } finally changes.unpersist()
    highWater
  }
}
