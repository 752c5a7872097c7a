package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

/** MERGE_ON_READ delta storage (SURVEY §2.9 H6 — the reference declares the
  * table type at pyspark_script.py:66/app.py:118 but never implements it; we
  * give it real semantics): each upsert/delete on a MOR table lands as a
  * partitioned parquet "log" batch under `<table>/.graft/deltas/<commit>/`
  * instead of rewriting base files. Readers merge base+deltas by record key;
  * [[KeyedTable.compact]] folds live deltas back into the base and removes
  * them.
  *
  * Directory truth, like the rest of the table: a delta batch is live iff its
  * directory still exists; compaction deletes the directories it absorbed,
  * so no tombstone bookkeeping is needed and a killed compaction never
  * loses deltas (swap first, delete after).
  *
  * Scale posture: delta batches are partitioned by the table's partition
  * columns, so the read-time merge touches ONLY partitions that have deltas
  * — every other partition streams straight from base parquet with no
  * shuffle. The merge itself is one window shuffle bounded by
  * |delta-touched base rows| + |delta rows|, the same work Hudi's
  * MOR snapshot read does.
  */
object Deltas {
  /** Marker column carried only in delta files: true = the key is deleted. */
  val DeletedCol = "_graft_deleted"

  def root(tablePath: String): Path = new Path(s"$tablePath/${CommitLog.LogDirName}/deltas")

  def dir(tablePath: String, commitTime: String): Path =
    new Path(root(tablePath), commitTime)

  /** Commit times of live (uncompacted) delta batches — a directory listing,
    * O(#delta commits) namenode metadata ops.
    */
  def liveCommits(spark: SparkSession, tablePath: String): Seq[String] = {
    val fs = CommitLog.fs(spark, tablePath)
    val r = root(tablePath)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Live AND committed delta batches — what readers merge and compaction
    * folds. A delta directory without its commit JSON (the writer died or
    * lost an OCC conflict between [[write]] and the publish) must be
    * invisible to every consumer except fsck, which sweeps it — otherwise
    * uncommitted rows leak into snapshots between the failure and the sweep,
    * breaking commit atomicity.
    */
  def committedLive(
      spark: SparkSession, tablePath: String, st: CommitLog.TableState): Seq[String] = {
    val committed = st.commits.map(_.commitTime).toSet
    liveCommits(spark, tablePath).filter(committed)
  }

  /** Write one delta batch. `rows` must already carry the meta columns and
    * the [[DeletedCol]] marker.
    */
  def write(rows: DataFrame, tablePath: String, commitTime: String,
      partitionFields: Seq[String]): Unit = {
    // shuffle onto the partition value first: one delta file per partition
    // per batch instead of tasks × partitions small files
    val shaped = if (partitionFields.isEmpty) rows
      else rows.repartition(partitionFields.map(col): _*)
    val w = shaped.write.mode("overwrite").format("parquet")
    (if (partitionFields.nonEmpty) w.partitionBy(partitionFields: _*) else w)
      .save(dir(tablePath, commitTime).toString)
  }

  /** The delta-file schema: table schema + the deleted marker. */
  def schemaOf(tableSchema: StructType): StructType =
    StructType(tableSchema.fields :+ StructField(DeletedCol, BooleanType, nullable = false))

  /** Read the given live delta batches (all partitions). Each batch dir is
    * its own partition-discovery root, so they are read separately and
    * unioned — the union is a no-shuffle concatenation.
    */
  def read(spark: SparkSession, tablePath: String, tableSchema: StructType,
      commits: Seq[String]): DataFrame =
    readDirs(spark, tableSchema, commits.map(c => dir(tablePath, c).toString))

  /** Same, from explicit batch directories — lets [[KeyedTable.readAsOf]]
    * mix live delta dirs with ones archived by a later compaction.
    */
  def readDirs(spark: SparkSession, tableSchema: StructType, dirs: Seq[String]): DataFrame = {
    val s = schemaOf(tableSchema)
    dirs.map(d => spark.read.schema(s).parquet(d)
        .select(s.fieldNames.map(col).toSeq: _*))
      .reduce(_ unionByName _)
  }

  /** Partition paths touched by the given live delta commits, resolved from
    * the commit log (no data scan).
    */
  def touchedPartitions(st: CommitLog.TableState, liveCommits: Seq[String]): Seq[String] = {
    val live = liveCommits.toSet
    st.commits.filter(c => live.contains(c.commitTime))
      .flatMap(_.partitions.map(_.path)).distinct.sorted
  }

  /** Snapshot-merge base rows with delta rows: the winner per
    * (partition path, record key) is the row with the greatest
    * (_hoodie_commit_time, precombine); deleted winners drop out. Base rows
    * always lose to delta rows of the same key because delta commit times
    * are strictly newer than the base file's commit time
    * ([[CommitLog.newCommitTime]] is monotonic), and compaction preserves
    * the winning row's commit time.
    *
    * Plan shape: the base side is an ANTI-JOIN against the delta key set —
    * when the delta batch is small (the normal MOR state between
    * compactions) AQE broadcasts it and base rows stream through WITHOUT a
    * shuffle; only the delta rows themselves take a window shuffle to
    * resolve their per-key winner. The old formulation windowed base ∪
    * deltas together, shuffling every base row of every delta-touched
    * partition on each snapshot read — the difference between O(|deltas|)
    * and O(|touched partitions|) read cost at scale.
    */
  def merge(base: DataFrame, deltas: DataFrame, precombine: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = Seq(MetaColumns.PartitionPath, MetaColumns.RecordKey)
    val deltaKeys = deltas.select(keyCols.map(col): _*).distinct()
    // base rows whose key has no delta stream through untouched (anti-join,
    // broadcast by AQE when the batch is small — no shuffle of base); only
    // rows CONTESTED by a delta enter the window, where commit time still
    // decides the winner — an append/insert can land base rows NEWER than a
    // live delta, so delta precedence must be resolved by (commit time,
    // precombine), never assumed
    val untouched = base.join(deltaKeys, keyCols, "left_anti")
    val contested = base.join(deltaKeys, keyCols, "left_semi")
      .withColumn(DeletedCol, lit(false))
      .unionByName(deltas.select(base.columns.map(col).toSeq :+ col(DeletedCol): _*))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(MetaColumns.CommitTime).desc, col(precombine).desc)
    val winners = contested
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(DeletedCol))
      .drop("__rn", DeletedCol)
    untouched.unionByName(winners)
  }
}
