package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.model.GraftException

/** Cross-process writer lock: a filesystem lease closing the OCC
  * check-then-create window that the in-JVM publish lock cannot cover when
  * two separate driver processes write one table (the reference's own
  * deployment shape — concurrent spark-submit jobs, app.py:216-223).
  *
  * Mechanics: one lease file under `<table>/.graft/locks/`, taken with the
  * filesystem's atomic `create(overwrite = false)` — exactly one of any
  * number of concurrent acquirers wins (local FS and HDFS guarantee this;
  * object stores with conditional writes do too). The lease carries an
  * owner id, a monotonic fencing token, and an expiry: a writer that dies
  * mid-commit leaves a lease that any later writer STEALS once expired
  * (delete + re-create — the create race between two stealers again has
  * exactly one winner). The token is persisted in a sidecar `token.seq`
  * (never deleted) so it keeps increasing across steals and releases;
  * [[CommitLog.write]] re-validates ownership before creating the commit
  * JSON, so a writer whose lease was stolen mid-publish aborts retryably
  * instead of double-committing.
  *
  * The lease is held only across the metadata-sized critical section
  * (pre-swap guard → directory swap → publish); the data-sized staging
  * write happens before acquisition, so concurrent writers still overlap
  * on the expensive part. Default TTL (10 min) is far above any swap +
  * publish duration, so renewal is unnecessary; expiry exists only to
  * unblock the table after a writer death (fsck also sweeps expired
  * leases). Disable with `spark.graft.lock.enabled=false` where an
  * external lock provider (ZK, DynamoDB) fills the role instead — the
  * same deployment contract as Hudi's multi-writer OCC.
  */
object TableLock {

  final case class Lease(owner: String, token: Long, acquiredAt: Long, expiresAt: Long)

  private def lockDir(tablePath: String) = new Path(CommitLog.logDir(tablePath), "locks")
  private[table] def lockFile(tablePath: String) = new Path(lockDir(tablePath), "writer.lock")
  private def tokenFile(tablePath: String) = new Path(lockDir(tablePath), "token.seq")

  private[table] def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.lock.enabled", "true").toBoolean
  private def ttlMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.lock.ttlMs", "600000").toLong
  private def acquireTimeoutMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.lock.acquireTimeoutMs", "30000").toLong

  /** The lease currently on file, valid or expired; None if absent or
    * unreadable (a half-written lease from a dying writer reads as absent —
    * the atomic create already decided the race, the content is advisory).
    */
  def current(spark: SparkSession, tablePath: String): Option[Lease] = {
    val f = CommitLog.fs(spark, tablePath)
    val p = lockFile(tablePath)
    if (!f.exists(p)) return None
    try {
      val in = f.open(p)
      val node = try CommitLog.mapper.readTree(in) finally in.close()
      Some(Lease(node.get("owner").asText(), node.get("token").asLong(),
        node.get("acquiredAt").asLong(), node.get("expiresAt").asLong()))
    } catch { case _: Exception => None }
  }

  /** One atomic acquisition attempt. Some(lease) iff this caller now holds
    * the lock; None if a live lease belongs to someone else or the create
    * race was lost.
    */
  def tryAcquire(spark: SparkSession, tablePath: String, owner: String): Option[Lease] = {
    val f = CommitLog.fs(spark, tablePath)
    val dir = lockDir(tablePath)
    if (!f.exists(dir)) f.mkdirs(dir)
    val now = System.currentTimeMillis()
    val prev = {
      val p = current(spark, tablePath)
      p match {
        case Some(l) if l.expiresAt >= now => return None // held and live
        case Some(l) => f.delete(lockFile(tablePath), false); Some(l) // expired — steal
        case None => None
      }
    }
    val lastToken = math.max(prev.map(_.token).getOrElse(0L), readToken(spark, tablePath))
    val lease = Lease(owner, lastToken + 1, now, now + ttlMs(spark))
    val root = CommitLog.mapper.createObjectNode()
    root.put("owner", lease.owner); root.put("token", lease.token)
    root.put("acquiredAt", lease.acquiredAt); root.put("expiresAt", lease.expiresAt)
    try {
      val out = f.create(lockFile(tablePath), false) // atomic: one winner
      try out.write(CommitLog.mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
      finally out.close()
    } catch { case _: java.io.IOException => return None } // lost the race
    // best-effort: only the race winner reaches this write
    try {
      val out = f.create(tokenFile(tablePath), true)
      try out.write(lease.token.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () }
    Some(lease)
  }

  private def readToken(spark: SparkSession, tablePath: String): Long = {
    val f = CommitLog.fs(spark, tablePath)
    val p = tokenFile(tablePath)
    if (!f.exists(p)) return 0L
    try {
      val in = f.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim.toLong
      finally in.close()
    } catch { case _: Exception => 0L }
  }

  /** Blocking acquire with polling, up to the configured timeout; a
    * retryable conflict if some other process holds the lease throughout.
    */
  def acquire(spark: SparkSession, tablePath: String, owner: String): Lease = {
    val deadline = System.currentTimeMillis() + acquireTimeoutMs(spark)
    var attempt = tryAcquire(spark, tablePath, owner)
    while (attempt.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
      attempt = tryAcquire(spark, tablePath, owner)
    }
    attempt.getOrElse {
      val holder = current(spark, tablePath).map(_.owner).getOrElse("unknown")
      throw GraftException.conflict(
        s"Writer '$owner' could not acquire the table lock at $tablePath " +
          s"(held by '$holder'). Retryable: another process is committing; " +
          "retry after it finishes, or run fsck if its lease never expires.")
    }
  }

  /** True iff `lease` is still the one on file (same owner AND token) and
    * unexpired — the fencing check a publisher runs before its final
    * atomic create.
    */
  def stillHeld(spark: SparkSession, tablePath: String, lease: Lease): Boolean =
    current(spark, tablePath).exists(l =>
      l.owner == lease.owner && l.token == lease.token &&
        l.expiresAt >= System.currentTimeMillis())

  /** Release if (and only if) still ours; a stolen or missing lease is
    * left alone.
    */
  def release(spark: SparkSession, tablePath: String, lease: Lease): Unit = {
    if (current(spark, tablePath).exists(l =>
        l.owner == lease.owner && l.token == lease.token))
      CommitLog.fs(spark, tablePath).delete(lockFile(tablePath), false)
  }

  /** Expired lease on file, if any — fsck reports and sweeps it. */
  def expired(spark: SparkSession, tablePath: String): Option[Lease] =
    current(spark, tablePath).filter(_.expiresAt < System.currentTimeMillis())
}
