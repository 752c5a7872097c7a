package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.model.GraftException

/** Tiny cross-process mutex for the table's SIDE-CAR metadata files
  * (`properties.json`, `maintenance.json`) — the read-modify-write surfaces
  * that live OUTSIDE the commit lease because maintenance hooks run after
  * publish and user `set_property` calls run with no commit at all. Without
  * it, two concurrent whole-file rewrites silently drop each other's keys
  * (e.g. a campaign cursor write reverting a user's `compact.auto` flip —
  * the silent-maintenance-off failure ADVICE r10 flagged).
  *
  * Same race-proof core as [[TableLock]]: lease files under
  * `<logDir>/<scope>.mutex/` NAMED BY a monotonic token (next = max(listed,
  * never-deleted `token.seq`) + 1), taken with one atomic exclusive create.
  * Where TableLock closes the stale-listing ABA window with its
  * publish-time FENCING check, a mutex has no later validation point — so
  * the guard moves to acquisition: after winning the create, the acquirer
  * lists again and backs off if ANY other unexpired lease exists (see
  * tryAcquire). Nobody ever deletes a live lease. Critical sections here
  * are millisecond-sized metadata rewrites, so the TTL is short (default
  * 30 s): a holder that dies mid-write stalls other writers for at most
  * that long.
  *
  * Posture: serialization is GUARANTEED between participating writers on
  * filesystems with atomic exclusive create (local via NIO O_EXCL, HDFS,
  * conditional-write object stores — [[TableLock]]'s analysis). On plain S3
  * the mutex degrades to best-effort rather than refusing: these files are
  * administrative, never data semantics, and a refused property write would
  * be worse than a rare lost one.
  */
private[table] object MetaMutex {

  final case class Held(dir: Path, file: Path)

  private def mutexDir(tablePath: String, scope: String): Path =
    new Path(CommitLog.logDir(tablePath), s"$scope.mutex")

  private def ttlMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.metaMutex.ttlMs", "30000").toLong
  private def timeoutMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.metaMutex.timeoutMs", "15000").toLong

  /** expiresAt of lease file `p`: its content when parseable, else its
    * mtime + TTL (an in-flight create whose content has not landed yet is
    * treated as live — the creator is mid-acquisition).
    */
  private def expiryOf(spark: SparkSession, tablePath: String, p: Path): Long = {
    val f = CommitLog.fs(spark, tablePath)
    try {
      val in = f.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim.toLong
      finally in.close()
    } catch {
      case _: Exception =>
        val born = try f.getFileStatus(p).getModificationTime
          catch { case _: Exception => 0L }
        born + ttlMs(spark)
    }
  }

  private def tryAcquire(
      spark: SparkSession, tablePath: String, scope: String): Option[Held] = {
    val f = CommitLog.fs(spark, tablePath)
    val dir = mutexDir(tablePath, scope)
    if (!f.exists(dir)) f.mkdirs(dir)
    val now = System.currentTimeMillis()
    val leases = f.listStatus(dir).map(_.getPath)
      .filter(_.getName.matches("m-\\d{20}\\.lock"))
    val topToken = if (leases.isEmpty) 0L else {
      val top = leases.maxBy(_.getName)
      if (expiryOf(spark, tablePath, top) >= now) return None // held and live
      top.getName.stripPrefix("m-").stripSuffix(".lock").toLong
    }
    // the NEXT token derives from max(listing, token.seq) — like TableLock.
    // The seq file is the piece that makes token reuse safe: a release
    // DELETES the top lease, so an acquirer with a stale (pre-delete)
    // listing and one with a fresh (post-delete, empty) listing would
    // otherwise derive DIFFERENT next tokens and both "win" their own —
    // two writers inside the critical section (caught as a tmp-file
    // collision under a full-suite run). With the never-deleted seq both
    // derive the SAME next token and the atomic exclusive create
    // arbitrates exactly one winner.
    val next = math.max(topToken, readSeq(spark, tablePath, scope)) + 1
    val mine = new Path(dir, f"m-$next%020d.lock")
    val content = (now + ttlMs(spark)).toString.getBytes("UTF-8")
    if (!TableLock.createExclusive(spark, tablePath, mine, content)) return None
    // winner-only housekeeping: persist the token (best-effort)
    try {
      val out = f.create(seqFile(tablePath, scope), true)
      try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: Exception => () }
    // MUTUAL-EXCLUSION GUARD (what TableLock gets from its publish-time
    // fencing check, restated for a fence-less mutex): a racer holding a
    // stale listing can create a DIFFERENT token and "win" its own create;
    // so after winning, list again — ANY other unexpired lease means back
    // off (delete mine, retry). Both racers' files exist from each create
    // until its delete, and each guard runs after its own create, so the
    // later guard always sees the earlier file: two concurrent entries are
    // impossible, and mutual back-off just retries under jitter. Only
    // EXPIRED leftovers are swept — never a live rival.
    val rivals = f.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.matches("m-\\d{20}\\.lock") && p.getName != mine.getName)
    val live = rivals.filter(p =>
      expiryOf(spark, tablePath, p) >= System.currentTimeMillis())
    if (live.nonEmpty) {
      try f.delete(mine, false) catch { case _: Exception => () }
      return None
    }
    try rivals.foreach(p => f.delete(p, false))
    catch { case _: Exception => () }
    Some(Held(dir, mine))
  }

  private def seqFile(tablePath: String, scope: String): Path =
    new Path(mutexDir(tablePath, scope), "token.seq")

  private def readSeq(spark: SparkSession, tablePath: String, scope: String): Long = {
    val f = CommitLog.fs(spark, tablePath)
    val p = seqFile(tablePath, scope)
    if (!f.exists(p)) return 0L
    try {
      val in = f.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim.toLong
      finally in.close()
    } catch { case _: Exception => 0L }
  }

  /** Run `body` under the scope's mutex. Throws a retryable conflict when
    * another process holds it past the acquire timeout.
    */
  def withLock[T](spark: SparkSession, tablePath: String, scope: String)(body: => T): T = {
    val deadline = System.currentTimeMillis() + timeoutMs(spark)
    var held = tryAcquire(spark, tablePath, scope)
    // exponential backoff (~10 ms doubling to a 250 ms cap, jittered to
    // de-synchronize spinners): each attempt lists the lease dir + reads the
    // top lease, so a fixed 10–25 ms spin against a dead holder burned
    // hundreds of object-store round-trips before the TTL freed it — the
    // cap keeps worst-case extra latency after a release at a quarter second
    // on this millisecond-sized administrative path
    var backoffMs = 10L
    while (held.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(backoffMs + scala.util.Random.nextInt(15))
      backoffMs = math.min(backoffMs * 2, 250L)
      held = tryAcquire(spark, tablePath, scope)
    }
    val h = held.getOrElse(throw GraftException.conflict(
      s"Could not acquire the '$scope' metadata mutex at $tablePath. Retryable: " +
        "another process is rewriting the same side-car file; retry shortly."))
    try body
    finally {
      try CommitLog.fs(spark, tablePath).delete(h.file, false)
      catch { case _: Exception => () } // expiry unblocks the next writer
    }
  }
}
