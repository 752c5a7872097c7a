package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.model.GraftException

/** Cross-process writer lock: a filesystem lease closing the OCC
  * check-then-create window that the in-JVM publish lock cannot cover when
  * two separate driver processes write one table (the reference's own
  * deployment shape — concurrent spark-submit jobs, app.py:216-223).
  *
  * Mechanics: lease FILES under `<table>/.graft/locks/`, one per
  * acquisition, NAMED BY their monotonic fencing token
  * (`lease-<20-digit token>.lock`). The holder is the highest-token lease
  * that has not expired. Acquiring — fresh or stealing an expired lease —
  * is one atomic exclusive create of the NEXT token's file, so any number
  * of concurrent acquirers produce exactly one winner, and nobody ever
  * deletes another writer's live lease (the classic steal race: two
  * stealers read the same expired lease, one deletes-and-recreates, the
  * other's delete kills the fresh lease — structurally impossible here
  * because stealing only CREATES a higher token). Tokens also persist in a
  * never-deleted `token.seq` so they keep increasing across full releases.
  *
  * Atomic exclusive create: on `file://` Hadoop's LocalFileSystem
  * implements `create(overwrite=false)` as a non-atomic exists-then-open,
  * so two same-box processes could both "win" — there we use NIO
  * `Files.createFile` (O_EXCL, atomic). Other filesystems (HDFS, object
  * stores with conditional writes) keep the Hadoop call, which is atomic
  * for them.
  *
  * [[CommitLog.write]] re-validates ownership ([[stillHeld]]: my lease is
  * still the highest, unexpired) before creating the commit JSON, so a
  * writer whose lease expired and was superseded aborts retryably instead
  * of double-committing. The lease is held only across the metadata-sized
  * critical section (pre-swap guard → directory swap → publish); the
  * data-sized staging write happens before acquisition. Default TTL
  * (10 min) is far above any swap + publish duration; expiry exists only
  * to unblock the table after a writer death (fsck also sweeps expired
  * leases). Disable with `spark.graft.lock.enabled=false` where an
  * external lock provider (ZK, DynamoDB) fills the role instead — the
  * same deployment contract as Hudi's multi-writer OCC.
  */
object TableLock {

  final case class Lease(owner: String, token: Long, acquiredAt: Long, expiresAt: Long)

  private def lockDir(tablePath: String) = new Path(CommitLog.logDir(tablePath), "locks")
  private[table] def leaseFile(tablePath: String, token: Long) =
    new Path(lockDir(tablePath), f"lease-$token%020d.lock")
  private def tokenFile(tablePath: String) = new Path(lockDir(tablePath), "token.seq")

  private[table] def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.lock.enabled", "true").toBoolean
  private def ttlMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.lock.ttlMs", "600000").toLong
  private def acquireTimeoutMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.lock.acquireTimeoutMs", "30000").toLong

  private def parseLease(
      spark: SparkSession, tablePath: String, p: Path): Option[Lease] =
    try {
      val f = CommitLog.fs(spark, tablePath)
      val in = f.open(p)
      val node = try CommitLog.mapper.readTree(in) finally in.close()
      Some(Lease(node.get("owner").asText(), node.get("token").asLong(),
        node.get("acquiredAt").asLong(), node.get("expiresAt").asLong()))
    } catch { case _: Exception => None }

  /** The governing lease: the highest-token lease file, valid or expired;
    * None if absent. A just-created file whose content has not flushed yet
    * parses as a zero-content placeholder — treated as LIVE (the creator
    * is mid-acquisition) by assuming the freshest possible expiry.
    */
  def current(spark: SparkSession, tablePath: String): Option[Lease] = {
    val f = CommitLog.fs(spark, tablePath)
    val dir = lockDir(tablePath)
    if (!f.exists(dir)) return None
    val leases = f.listStatus(dir).map(_.getPath)
      .filter(_.getName.matches("lease-\\d{20}\\.lock"))
    if (leases.isEmpty) return None
    val top = leases.maxBy(_.getName)
    val token = top.getName.stripPrefix("lease-").stripSuffix(".lock").toLong
    parseLease(spark, tablePath, top).orElse {
      // placeholder for an in-flight create (content not flushed yet):
      // live from the FILE's mtime, so a permanently corrupt lease still
      // expires and stays fsck-sweepable instead of locking forever
      val born = try f.getFileStatus(top).getModificationTime
        catch { case _: Exception => 0L }
      Some(Lease("(acquiring)", token, born, born + ttlMs(spark)))
    }
  }

  /** Atomic exclusive create of `p`. Hadoop's LocalFileSystem implements
    * create(overwrite=false) as exists-then-open (NOT atomic); NIO's
    * createFile is O_EXCL there. Non-local filesystems keep the Hadoop
    * call. True iff this caller created the file.
    */
  /** Schemes where Hadoop `create(overwrite=false)` is exists-then-put, NOT
    * atomic, unless the store's conditional-write support is enabled: two
    * drivers on plain S3 could both "win" the same token and the lock would
    * silently degrade to no protection — refuse loudly instead, pointing at
    * the real options. HDFS/ABFS/GCS have atomic exclusive create;
    * S3A gains it with `fs.s3a.create.conditional.enabled` (S3 conditional
    * PUT); `spark.graft.lock.assumeAtomicCreate=true` overrides for stores
    * this list is wrong about.
    */
  private def assertAtomicCreate(spark: SparkSession, tablePath: String): Unit = {
    val f = CommitLog.fs(spark, tablePath)
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    if (!Set("s3", "s3n", "s3a").contains(scheme)) return
    if (spark.conf.get("spark.graft.lock.assumeAtomicCreate", "false").toBoolean) return
    val conditional = f.getConf != null &&
      f.getConf.getBoolean("fs.s3a.create.conditional.enabled", false)
    if (!conditional)
      throw GraftException.config(
        s"Cross-process lock on $scheme:// needs atomic exclusive create, which plain " +
          "S3 does not provide (create(overwrite=false) is exists-then-put — two " +
          "writers could both acquire the lease). Enable S3 conditional writes " +
          "(fs.s3a.create.conditional.enabled=true), use an external lock provider " +
          "(spark.graft.lock.enabled=false), or override with " +
          "spark.graft.lock.assumeAtomicCreate=true if your store is atomic.")
  }

  private[table] def createExclusive(
      spark: SparkSession, tablePath: String, p: Path, content: Array[Byte]): Boolean = {
    val f = CommitLog.fs(spark, tablePath)
    val isLocal = Option(f.getUri.getScheme).forall(s => s == "file" || s.isEmpty)
    if (isLocal) {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.createFile(nio) // atomic O_EXCL
        java.nio.file.Files.write(nio, content)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else {
      try {
        val out = f.create(p, false)
        try out.write(content) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** One acquisition attempt. Some(lease) iff this caller now holds the
    * lock; None if a live lease belongs to someone else or the
    * next-token create race was lost.
    */
  def tryAcquire(spark: SparkSession, tablePath: String, owner: String): Option[Lease] = {
    val f = CommitLog.fs(spark, tablePath)
    assertAtomicCreate(spark, tablePath)
    val dir = lockDir(tablePath)
    if (!f.exists(dir)) f.mkdirs(dir)
    val now = System.currentTimeMillis()
    val top = current(spark, tablePath)
    top match {
      case Some(l) if l.expiresAt >= now => return None // held and live
      case _ => ()
    }
    val lastToken = math.max(top.map(_.token).getOrElse(0L), readToken(spark, tablePath))
    val lease = Lease(owner, lastToken + 1, now, now + ttlMs(spark))
    val root = CommitLog.mapper.createObjectNode()
    root.put("owner", lease.owner); root.put("token", lease.token)
    root.put("acquiredAt", lease.acquiredAt); root.put("expiresAt", lease.expiresAt)
    val content = CommitLog.mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    if (!createExclusive(spark, tablePath, leaseFile(tablePath, lease.token), content))
      return None // lost the race to a concurrent acquirer of the same token
    // winner-only housekeeping: advance token.seq; sweep superseded leases
    try {
      val out = f.create(tokenFile(tablePath), true)
      try out.write(lease.token.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () }
    try {
      f.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.matches("lease-\\d{20}\\.lock") &&
          p.getName < leaseFile(tablePath, lease.token).getName)
        .foreach(p => f.delete(p, false))
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

  /** True iff `lease` is still the GOVERNING lease (highest token, same
    * owner) and unexpired — the fencing check a publisher runs before its
    * final atomic create. A higher token on file means this lease expired
    * and was superseded.
    */
  def stillHeld(spark: SparkSession, tablePath: String, lease: Lease): Boolean =
    current(spark, tablePath).exists(l =>
      l.owner == lease.owner && l.token == lease.token &&
        l.expiresAt >= System.currentTimeMillis())

  /** Heartbeat renewal: extend OUR OWN lease's expiry by a fresh TTL while
    * still the governing lease. The fixed-TTL alternative fences a
    * legitimately slow publish (GC pause + huge partition list) mid-swap;
    * with renewal a live writer stays live indefinitely and only a DEAD
    * writer's lease ever expires. Overwriting our own file is safe — its
    * name is ours alone, and a reader catching it half-written falls into
    * `current`'s placeholder path (live from mtime). None when the lease
    * already expired and was superseded — the caller's next fencing check
    * will abort retryably, exactly as without renewal.
    */
  def renew(spark: SparkSession, tablePath: String, lease: Lease): Option[Lease] = {
    if (!stillHeld(spark, tablePath, lease)) return None
    val renewed = lease.copy(expiresAt = System.currentTimeMillis() + ttlMs(spark))
    val root = CommitLog.mapper.createObjectNode()
    root.put("owner", renewed.owner); root.put("token", renewed.token)
    root.put("acquiredAt", renewed.acquiredAt); root.put("expiresAt", renewed.expiresAt)
    val bytes = CommitLog.mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    val f = CommitLog.fs(spark, tablePath)
    val target = leaseFile(tablePath, renewed.token)
    try {
      val isLocal = Option(f.getUri.getScheme).forall(s => s == "file" || s.isEmpty)
      if (isLocal) {
        // atomic replace: readers in OTHER processes never observe the
        // lease half-written (a torn read would only degrade to the live
        // placeholder, but atomic is free here)
        val tmp = java.nio.file.Paths.get(
          target.toUri.getPath + s".renew-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        val out = f.create(target, true)
        try out.write(bytes) finally out.close()
      }
      Some(renewed)
    } catch { case _: Exception => None } // next beat or fencing check decides
  }

  /** The heartbeat period: a third of the TTL, so two consecutive missed
    * beats still leave a live lease.
    */
  private[table] def renewPeriodMs(spark: SparkSession): Long =
    math.max(ttlMs(spark) / 3, 50L)

  /** Release = delete OUR OWN lease file (its name is ours alone; a live
    * lease is never deleted by anyone else).
    */
  def release(spark: SparkSession, tablePath: String, lease: Lease): Unit =
    CommitLog.fs(spark, tablePath).delete(leaseFile(tablePath, lease.token), false)

  /** Re-create the lease file at (possibly relocated) `tablePath` — used by
    * create(), whose lock travels aside with the old table directory during
    * the replace swap. Overwrites any interloper that slipped into the
    * sub-millisecond rename window; their fencing check then fails.
    */
  private[table] def transplant(spark: SparkSession, tablePath: String, lease: Lease): Unit = {
    val f = CommitLog.fs(spark, tablePath)
    val dir = lockDir(tablePath)
    if (!f.exists(dir)) f.mkdirs(dir)
    val root = CommitLog.mapper.createObjectNode()
    root.put("owner", lease.owner); root.put("token", lease.token)
    root.put("acquiredAt", lease.acquiredAt); root.put("expiresAt", lease.expiresAt)
    val out = f.create(leaseFile(tablePath, lease.token), true)
    try out.write(CommitLog.mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
    // an interloper's lease would carry a DIFFERENT token file; sweep any
    f.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.matches("lease-\\d{20}\\.lock") &&
        p.getName != leaseFile(tablePath, lease.token).getName)
      .foreach(p => f.delete(p, false))
  }

  /** Expired governing lease, if any — fsck reports and sweeps it. */
  def expired(spark: SparkSession, tablePath: String): Option[Lease] =
    current(spark, tablePath).filter(_.expiresAt < System.currentTimeMillis())
}
