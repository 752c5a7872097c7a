package graft.table

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.GraftException

/** Incrementally-maintained aggregate rollup over a keyed table — the
  * materialized-view table service (Hudi users build exactly this by hand
  * with incremental queries; the reference recomputes aggregates from
  * scratch per run, pyspark_script.py:173-204's count flow).
  *
  * The maintained state is a PARTIAL-aggregate table: one row per
  * (partition_path, group key) holding a row count and per-column DECIMAL
  * sums. [[sync]] asks the commit log which partitions were touched since
  * the stored watermark (O(#commits) metadata, no scan), recomputes partials
  * for JUST those partitions from the delta-merged restricted snapshot
  * ([[KeyedTable.readPartitions]]), and splices them into the state;
  * [[result]] re-aggregates the partials by the group keys. Maintenance cost
  * is O(changed partitions' data + state size) — on a 100 TB table with a
  * trickle of hot partitions each sync touches only those, never the table.
  * Partition-level recompute also makes DELETES and partition drops exact
  * for free (the recomputed partial simply reflects the rows that remain —
  * no subtract-the-before-image bookkeeping, which plain sum/count deltas
  * would need and MIN/MAX could not support at all).
  *
  * Sums run in DECIMAL(30,4) so partial-then-total summation is exact and
  * order-independent — the incremental result is bit-identical to a full
  * recompute, and the q40 oracle hash-checks exactly that. Scale 4 (not
  * more) on purpose: double→decimal conversion at high scale keeps digits
  * of the value's binary-representation noise, which different engines
  * round differently; 4 fractional digits sits far above the noise floor
  * of currency-like measures and converts identically everywhere (the
  * repo-wide oracle-portability convention).
  *
  * State swap is crash-safe: new partials land in a fresh
  * `partials_<instant>` directory, the tiny state JSON flips to it via
  * temp-file + atomic rename, and only then is the old directory deleted —
  * readers see the old state or the new, never a torn one.
  */
object IncrementalAgg {

  final case class SyncResult(touched: Seq[String], watermark: String)

  private val mapper = new ObjectMapper()

  private def stateFile(destPath: String) = new Path(destPath, "_aggstate.json")

  private final case class State(
      since: String, dataDir: String, groupCols: Seq[String], sumCols: Seq[String])

  private def readState(spark: SparkSession, destPath: String): Option[State] = {
    val fs = CommitLog.fs(spark, destPath)
    // the tmp file is fully written+closed before the publish delete+rename;
    // if a crash hit the window between them, the tmp IS the newest state
    val f = Seq(stateFile(destPath), new Path(destPath, "_aggstate.json.tmp"))
      .find(fs.exists(_))
    f.map { p =>
      val in = fs.open(p)
      val node = try mapper.readTree(in) finally in.close()
      State(
        node.get("since").asText(), node.get("dataDir").asText(),
        node.get("groupCols").elements().asScala.map(_.asText()).toSeq,
        node.get("sumCols").elements().asScala.map(_.asText()).toSeq)
    }
  }

  private def writeState(spark: SparkSession, destPath: String, s: State): Unit = {
    val fs = CommitLog.fs(spark, destPath)
    val n = mapper.createObjectNode()
    n.put("since", s.since): Unit
    n.put("dataDir", s.dataDir): Unit
    val ga = n.putArray("groupCols"); s.groupCols.foreach(c => ga.add(c): Unit)
    val sa = n.putArray("sumCols"); s.sumCols.foreach(c => sa.add(c): Unit)
    val tmp = new Path(destPath, "_aggstate.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    fs.delete(stateFile(destPath), false)
    if (!fs.rename(tmp, stateFile(destPath)))
      throw GraftException.unexpected(s"Could not publish agg state at $destPath")
  }

  private def partialsOf(
      rows: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      sumCols.map(c => sum(col(c).cast(DecimalType(30, 4))).as(s"sum_$c"))
    rows.groupBy((col(MetaColumns.PartitionPath) +: groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Bring the rollup at `destPath` up to the table tip. First call builds
    * the full state; later calls recompute only partitions the commit log
    * reports touched since the watermark. Returns the touched partition
    * list and the new watermark.
    */
  def sync(
      spark: SparkSession,
      tablePath: String,
      destPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String]): SyncResult = {
    require(groupCols.nonEmpty, "IncrementalAgg needs at least one group column")
    val st = CommitLog.requireState(spark, tablePath)
    val tip = st.latest.commitTime
    val prior0 = readState(spark, destPath)
    prior0.filter(p => p.groupCols != groupCols || p.sumCols != sumCols).foreach(p =>
      throw GraftException.config(
        s"IncrementalAgg at $destPath maintains groupCols=${p.groupCols.mkString(",")} " +
          s"sumCols=${p.sumCols.mkString(",")}; cannot sync different columns " +
          "(build a new rollup instead)."))
    // A rollback/restore of the base table deletes the watermark commit from
    // the log; incremental maintenance cannot subtract unknown history, so
    // rebuild from scratch instead of silently serving pre-rollback state.
    // The guard is EXISTENCE of the stored watermark instant in the commit
    // log, not `since <= tip`: if a rollback is followed by any new commit
    // before the next sync, the new instant exceeds the old watermark and a
    // tip-comparison would wrongly accept partials that still bake in the
    // rolled-back changes. (A log truncated by archival also fails the
    // existence check — a conservative full rebuild, never a wrong answer.)
    val prior = prior0.filter(p => st.commits.exists(_.commitTime == p.since))

    val touched: Seq[String] = prior match {
      case None => st.partitionModes.keys.toSeq.sorted
      case Some(p) => st.commits.filter(_.commitTime > p.since)
        .flatMap(_.partitions.map(_.path)).distinct.sorted
    }
    if (touched.isEmpty && prior.isDefined)
      return SyncResult(Seq.empty, prior.get.since)

    val partials =
      partialsOf(KeyedTable.readPartitions(spark, tablePath, touched), groupCols, sumCols)
    val next = prior match {
      case Some(p) =>
        spark.read.parquet(new Path(destPath, p.dataDir).toString)
          .filter(!col(MetaColumns.PartitionPath).isin(touched: _*))
          .unionByName(partials)
      case None => partials
    }
    val newDir = s"partials_$tip"
    next.write.mode("overwrite").parquet(new Path(destPath, newDir).toString)
    writeState(spark, destPath, State(tip, newDir, groupCols, sumCols))
    prior0.filter(_.dataDir != newDir).foreach(p =>
      CommitLog.fs(spark, destPath).delete(new Path(destPath, p.dataDir), true))
    SyncResult(touched, tip)
  }

  /** The rollup answer: partials re-aggregated by the group keys — a state
    * scan (|groups| × |partitions| rows at most), never a table scan.
    */
  def result(spark: SparkSession, destPath: String): DataFrame = {
    val st = readState(spark, destPath).getOrElse(throw GraftException.config(
      s"No IncrementalAgg state at $destPath — run sync first."))
    val aggs = sum(col("cnt")).as("cnt") +:
      st.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    spark.read.parquet(new Path(destPath, st.dataDir).toString)
      .groupBy(st.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
