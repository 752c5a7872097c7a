package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}

/** Retained pre-images of rewrite commits — the Hudi cleaner's
  * KEEP_LATEST_COMMITS analogue that makes time travel ([[KeyedTable.readAsOf]])
  * and rollback-across-rewrites possible on a COW table.
  *
  * Every rewrite commit (upsert/delete on COW, compact, cluster, materialize —
  * anything that goes through stageAndSwap) MOVES the partition directories it
  * replaces into `<table>/.graft/archive/<commit>/data/<partition-dir>` instead
  * of deleting them, and compaction moves absorbed delta batches to
  * `.../archive/<commit>/deltas/<deltaCommit>/`. Renames, not copies: archiving
  * costs O(#partitions) namenode metadata ops, zero data movement — the same
  * cost the old eager delete paid.
  *
  * Invariant the readers rely on: `archive/<ct>/data/<p>` is the state of
  * partition `p` immediately BEFORE commit `ct`. Between any instant `t` and
  * the first rewrite commit after `t`, only append-type commits can have
  * touched `p` (a rewrite would itself have archived), so
  * state(p, t) = pre-image of first rewrite after t, filtered to
  * `_hoodie_commit_time <= t`.
  *
  * Retention: [[KeyedTable.cleanArchive]] keeps the newest
  * [[KeyedTable.ArchiveRetention]] archived commits (auto-trimmed after each
  * rewrite, like Hudi's inline cleaner); reads/rollbacks past the horizon fail
  * with an explicit retention error rather than returning wrong data.
  */
object Archive {

  def root(tablePath: String): Path =
    new Path(s"$tablePath/${CommitLog.LogDirName}/archive")

  def dir(tablePath: String, commitTime: String): Path =
    new Path(root(tablePath), commitTime)

  def dataDir(tablePath: String, commitTime: String): Path =
    new Path(dir(tablePath, commitTime), "data")

  def deltasDir(tablePath: String, commitTime: String): Path =
    new Path(dir(tablePath, commitTime), "deltas")

  /** Move one replaced path (a partition dir, or a root data file of an
    * unpartitioned table) into commit `ct`'s archive under `relPath`.
    */
  def stash(fs: FileSystem, tablePath: String, ct: String, relPath: String, src: Path): Unit = {
    val dest = new Path(dataDir(tablePath, ct), relPath)
    if (!fs.exists(dest.getParent)) fs.mkdirs(dest.getParent)
    fs.rename(src, dest)
  }

  /** Move an absorbed delta batch dir into the compaction commit's archive. */
  def stashDelta(fs: FileSystem, tablePath: String, ct: String, deltaCommit: String, src: Path): Unit = {
    val dd = deltasDir(tablePath, ct)
    if (!fs.exists(dd)) fs.mkdirs(dd)
    fs.rename(src, new Path(dd, deltaCommit))
  }

  /** Mark `ct` as an archived (restorable) rewrite even if it replaced
    * nothing — a rewrite that only CREATED partitions is rolled back by
    * deleting them, and the marker is what distinguishes it from an
    * append-type commit (which cannot be undone by directory ops).
    */
  def mark(fs: FileSystem, tablePath: String, ct: String): Unit = {
    val d = dataDir(tablePath, ct)
    if (!fs.exists(d)) fs.mkdirs(d)
  }

  def exists(fs: FileSystem, tablePath: String, ct: String): Boolean =
    fs.exists(dir(tablePath, ct))

  /** Archived commit times, ascending. O(#archived commits) metadata ops. */
  def commits(fs: FileSystem, tablePath: String): Seq[String] = {
    val r = root(tablePath)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Archived delta-batch commit times stashed under compaction `ct`. */
  def archivedDeltaCommits(fs: FileSystem, tablePath: String, ct: String): Seq[String] = {
    val dd = deltasDir(tablePath, ct)
    if (!fs.exists(dd)) Seq.empty
    else fs.listStatus(dd).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }
}
