package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ChangeStream
import graft.table.KeyedTable

/** Derived-index consistency from the BASE TABLE's change feed: a corpus
  * that lives as a keyed graft table keeps its standing dedup/ANN/PQ
  * indexes consistent hands-off — each `sync*` call pulls the corpus's
  * checkpointed CDC interval ([[ChangeStream.pull]], offsets = commit
  * instants, O(changes) never O(table)) and applies it to the index:
  * DELETES tombstone the ids' index entries (the x67/x68 takedown leg,
  * now AUTOMATED — a PII removal from the corpus propagates to every
  * derived index without anyone remembering each one), and UPSERTS
  * (re)index the rows' latest images (`DedupIndex.append` /
  * `AnnIndex.append` / `PqIndex.append` — assignment/encoding against the
  * STORED trained state, never a retrain).
  *
  * Delivery is at-least-once (the handler runs before the watermark
  * write), and the apply is IDEMPOTENT — keyed tombstones + keyed
  * upserts, deletes applied before upserts like [[graft.table.TableSync]]
  * (a key appears in an interval as its END state: deleted or upserted,
  * not both) — so a crash-replayed interval converges to the same index.
  * Schedule the call per corpus publish (or poll with
  * [[ChangeStream.follow]]'s shape); `startAt` pins the first interval,
  * e.g. the corpus instant the index was BUILT from — the batch
  * [[graft.table.TableSync.sync]] chain contract.
  *
  * Scale shape: one CDC read (partition-pruned) + one O(|deletes|)
  * tombstone delta + one O(|upserts|) encode/assign + upsert per
  * interval; the corpus is never rescanned and the index never rebuilt.
  */
object IndexSync {

  private def split(changes: DataFrame): (DataFrame, DataFrame) = (
    changes.filter(col(KeyedTable.ChangeOp) === "delete"),
    changes.filter(col(KeyedTable.ChangeOp) === "upsert"))

  /** Apply one corpus CDC interval to a standing [[DedupIndex]]. Returns
    * the applied interval, or None when the corpus has no new commits.
    */
  def syncDedup(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16,
      startAt: Option[String] = None): Option[ChangeStream.Pull] =
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt) { (changes, _) =>
      val (dels, ups) = split(changes)
      if (!dels.isEmpty) DedupIndex.remove(spark, indexPath, dels.select(idCol), idCol)
      if (!ups.isEmpty)
        DedupIndex.append(spark, indexPath, ups, idCol, textCol, shingleN, numHashes)
    }

  /** Apply one corpus CDC interval to a standing [[AnnIndex]]. */
  def syncAnn(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String, idCol: String = "vec_id", vecCol: String = "embedding",
      startAt: Option[String] = None): Option[ChangeStream.Pull] =
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt) { (changes, _) =>
      val (dels, ups) = split(changes)
      if (!dels.isEmpty) AnnIndex.remove(spark, indexPath, dels.select(idCol), idCol)
      if (!ups.isEmpty) AnnIndex.append(spark, indexPath, ups, idCol, vecCol)
    }

  /** Apply one corpus CDC interval to a standing [[PqIndex]]. */
  def syncPq(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String, dim: Int, m: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      startAt: Option[String] = None): Option[ChangeStream.Pull] =
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt) { (changes, _) =>
      val (dels, ups) = split(changes)
      if (!dels.isEmpty) PqIndex.remove(spark, indexPath, dels.select(idCol), idCol)
      if (!ups.isEmpty) PqIndex.append(spark, indexPath, ups, dim, m, idCol, vecCol)
    }
}
