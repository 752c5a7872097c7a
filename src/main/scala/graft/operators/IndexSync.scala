package graft.operators

import org.apache.hadoop.fs.Path
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
  * write), and the apply is IDEMPOTENT — keyed tombstones + keyed upserts,
  * deletes applied before upserts like [[graft.table.TableSync]]. The
  * order is LOAD-BEARING: `readChanges` emits BOTH a tombstone and the
  * latest image for a key deleted then re-inserted inside one interval,
  * so only deletes-first lets the upserted end state win — reordering
  * would silently drop re-inserted keys from the index. Under that order
  * a crash-replayed interval converges to the same index.
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

  /** Apply one CDC interval to one standing index: deletes tombstone first,
    * then upserts (re)index the latest images — see the ordering note in
    * the object doc. Shared by the explicit `sync*` faces and the
    * registry-driven apply ([[SyncRegistry]]).
    */
  private[operators] def applyInterval(
      spark: SparkSession, indexPath: String, changes: DataFrame,
      spec: SyncRegistry.Spec): Unit = {
    val (dels, ups) = split(changes)
    // one grouped count instead of two isEmpty probes: each probe is its
    // own action over the (persisted) interval, and the registry multiplies
    // them by N indexes — the op histogram answers both legs in one job
    val ops = changes.groupBy(col(KeyedTable.ChangeOp)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hasDels = ops.getOrElse("delete", 0L) > 0L
    val hasUps = ops.getOrElse("upsert", 0L) > 0L
    spec match {
      case d: SyncRegistry.DedupSpec =>
        if (hasDels) DedupIndex.remove(spark, indexPath, dels.select(d.idCol), d.idCol)
        if (hasUps) {
          // parameters from the index's own STAMPS when present (written by
          // bootstrap/rebuild/cutover): a library-level rebuild under new
          // (shingleN, numHashes) must not strand the sync on the
          // registration-time values — entries appended under the old
          // parameters would silently never collide with the new ones.
          // Pre-stamp indexes fall back to the spec.
          val props = graft.table.TableProperties.get(spark, indexPath)
          val shingleN = props.get(DedupIndex.ShingleNProp)
            .map(_.trim.toInt).getOrElse(d.shingleN)
          val numHashes = props.get(DedupIndex.NumHashesProp)
            .map(_.trim.toInt).getOrElse(d.numHashes)
          DedupIndex.append(spark, indexPath, ups, d.idCol, d.textCol, shingleN, numHashes)
        }
      case a: SyncRegistry.AnnSpec =>
        if (hasDels) AnnIndex.remove(spark, indexPath, dels.select(a.idCol), a.idCol)
        if (hasUps) AnnIndex.append(spark, indexPath, ups, a.idCol, a.vecCol)
      case p: SyncRegistry.PqSpec =>
        if (hasDels) PqIndex.remove(spark, indexPath, dels.select(p.idCol), p.idCol)
        if (hasUps) {
          // geometry from STORAGE, never from configuration: a reshaping
          // retrain (m may change) must not strand the sync on stale (dim, m)
          val (dim, m) = PqIndex.storedGeometry(spark, indexPath)
          PqIndex.append(spark, indexPath, ups, dim, m, p.idCol, p.vecCol)
        }
      case t: SyncRegistry.TextSpec =>
        // remove is mode-aware internally; the append face dispatches on
        // the index's OWN text.fields stamp (the derive-from-storage rule:
        // a fielded index synced through a plain TextSpec must re-index
        // per-field — the stamp, not the spec, knows the field columns)
        if (hasDels) TextIndex.remove(spark, indexPath, dels.select(t.idCol), t.idCol)
        if (hasUps) TextIndex.storedFields(spark, indexPath) match {
          case Some(_) => TextIndex.appendFielded(spark, indexPath, ups, t.idCol)
          case None => TextIndex.append(spark, indexPath, ups, t.idCol, t.textCol)
        }
    }
  }

  /** [[applyInterval]] with the interval materialized once: a single apply
    * still runs several actions over it (the op-histogram count + writes),
    * each re-executing the CDC read from storage without the persist.
    * Single-index call sites use this; [[SyncRegistry]]'s multi-index pull
    * persists once around its whole loop instead.
    */
  private[operators] def applyPersisted(
      spark: SparkSession, indexPath: String, changes: DataFrame,
      spec: SyncRegistry.Spec): Unit = {
    val c = changes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applyInterval(spark, indexPath, c, spec) finally c.unpersist()
  }

  /** Checkpoint identity for an explicit single-index sync: destination +
    * parameters beside the watermark, with the corpus path NORMALIZED
    * ([[SyncRegistry]]'s `identityOf` rule — `spec.describe` normalizes the
    * index path the same way): slash / relative respellings of the same
    * tables must resolve to ONE identity, or a previously-working checkpoint
    * refuses the pull for every spelling but one — and the refusal's "fresh
    * checkpoint dir" remedy would silently skip already-pulled intervals.
    */
  private def identityOf(corpusPath: String, spec: SyncRegistry.Spec): String =
    s"indexsync ${new Path(corpusPath)} -> ${spec.describe}"

  /** Pre-normalization raw-path renderings (corpus and/or index path raw)
    * — the adoption keys that upgrade old stamped checkpoints in place.
    */
  private def identityLegacyOf(
      corpusPath: String, spec: SyncRegistry.Spec): Seq[String] = Seq(
    s"indexsync $corpusPath -> ${spec.describeLegacy}",
    s"indexsync $corpusPath -> ${spec.describe}",
    s"indexsync ${new Path(corpusPath)} -> ${spec.describeLegacy}")

  /** Apply one corpus CDC interval to a standing [[DedupIndex]]. Returns
    * the applied interval, or None when the corpus has no new commits.
    */
  def syncDedup(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16,
      startAt: Option[String] = None): Option[ChangeStream.Pull] = {
    val spec = SyncRegistry.DedupSpec(indexPath, idCol, textCol, shingleN, numHashes)
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt,
      identity = Some(identityOf(corpusPath, spec)),
      legacyIdentities = identityLegacyOf(corpusPath, spec)) { (changes, _) =>
      applyPersisted(spark, indexPath, changes, spec)
    }
  }

  /** Apply one corpus CDC interval to a standing [[AnnIndex]]. */
  def syncAnn(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String, idCol: String = "vec_id", vecCol: String = "embedding",
      startAt: Option[String] = None): Option[ChangeStream.Pull] = {
    val spec = SyncRegistry.AnnSpec(indexPath, idCol, vecCol)
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt,
      identity = Some(identityOf(corpusPath, spec)),
      legacyIdentities = identityLegacyOf(corpusPath, spec)) { (changes, _) =>
      applyPersisted(spark, indexPath, changes, spec)
    }
  }

  /** Apply one corpus CDC interval to a standing [[TextIndex]]. */
  def syncText(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String, idCol: String, textCol: String,
      startAt: Option[String] = None): Option[ChangeStream.Pull] = {
    val spec = SyncRegistry.TextSpec(indexPath, idCol, textCol)
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt,
      identity = Some(identityOf(corpusPath, spec)),
      legacyIdentities = identityLegacyOf(corpusPath, spec)) { (changes, _) =>
      applyPersisted(spark, indexPath, changes, spec)
    }
  }

  /** Apply one corpus CDC interval to a standing [[PqIndex]]. The encode
    * geometry comes from the STORED codebooks, not a parameter — a
    * reshaping retrain must not strand the sync on a stale (dim, m).
    */
  def syncPq(
      spark: SparkSession, corpusPath: String, indexPath: String,
      checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      startAt: Option[String] = None): Option[ChangeStream.Pull] = {
    val spec = SyncRegistry.PqSpec(indexPath, idCol, vecCol)
    ChangeStream.pull(spark, corpusPath, checkpointDir, startAt,
      identity = Some(identityOf(corpusPath, spec)),
      legacyIdentities = identityLegacyOf(corpusPath, spec)) { (changes, _) =>
      applyPersisted(spark, indexPath, changes, spec)
    }
  }
}
