package graft.table

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

import graft.model.GraftException

/** Per-file bloom filters over the record key — the Hudi BLOOM-index
  * analogue (SURVEY §2 H7/J4: upsert key location). One column-pruned scan
  * of `_hoodie_record_key` builds a bloom per base file (each scan task
  * sees one file split, so filters build map-side and merge by file — no
  * row shuffle); the sidecar parquet under the commit log is O(#files).
  * `candidateFiles` then answers "which files MIGHT contain any of these
  * keys" without touching data: a point lookup or a small global-upsert
  * batch opens the handful of files whose bloom fires instead of scanning
  * the table — on a 100 TB table the difference between a sub-second
  * probe and a full-table join.
  *
  * Safety mirrors [[StatsIndex]]: a file is only skipped when its bloom
  * PROVES (up to the fpp, which only yields false KEEPS, never false
  * skips) no key matches; files appended after the index build are kept
  * unseen, so a stale index is slower, never wrong.
  */
object BloomIndex {

  final case class BloomRow(file: String, key_count: Long, fpp: Double, bloom: Array[Byte])

  def bloomRoot(tablePath: String): Path =
    new Path(s"$tablePath/${CommitLog.LogDirName}/bloom")

  def bloomDir(tablePath: String, commitTime: String): Path =
    new Path(bloomRoot(tablePath), commitTime)

  /** input_file_name() URI-encodes; the fs listing does not. One canonical
    * form so sidecar keys and live listings always compare equal.
    */
  private def normalizePath(s: String): String =
    try new Path(new java.net.URI(s)).toString
    catch { case _: Exception => new Path(s).toString }

  // ----------------------------------------------------------------- build

  /** Build blooms for every live base file and commit an `index_bloom`
    * instant. `fpp` trades sidecar size for extra false-positive file
    * opens on lookup (1% ≈ 1.2 bytes/key).
    */
  def build(spark: SparkSession, tablePath: String, fpp: Double = 0.01): String = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val st = CommitLog.requireState(spark, tablePath)
    val schema = StructType.fromDDL(st.latest.schemaDdl)
    val fs = CommitLog.fs(spark, tablePath)
    val files = StatsIndex.listBaseFiles(fs, tablePath)
    val ct = CommitLog.newCommitTime()
    val dir = bloomDir(tablePath, ct)

    import spark.implicits._
    val rows: DataFrame =
      if (files.isEmpty) spark.emptyDataset[BloomRow].toDF()
      else {
        val keyed = spark.read.schema(schema).option("basePath", tablePath)
          .parquet(files: _*)
          .select(input_file_name().as("f"), col(MetaColumns.RecordKey).as("k"))
        // per-file row counts size each bloom exactly; O(#files) on the driver
        val counts = keyed.groupBy("f").count().collect()
          .map(r => normalizePath(r.getString(0)) -> r.getLong(1)).toMap
        val bCounts = spark.sparkContext.broadcast(counts)
        keyed.as[(String, String)].rdd
          .mapPartitions { it =>
            // a scan task covers one file split → usually exactly one bloom
            val acc = scala.collection.mutable.HashMap.empty[String, (BloomFilter, Long)]
            it.foreach { case (rawF, k) =>
              val f = normalizePath(rawF)
              val (bf, n) = acc.getOrElseUpdate(f,
                (BloomFilter.create(math.max(1L, bCounts.value.getOrElse(f, 1L)), fpp), 0L))
              bf.putString(k)
              acc.update(f, (bf, n + 1))
            }
            acc.iterator
          }
          .reduceByKey((x, y) => (x._1.mergeInPlace(y._1), x._2 + y._2))
          .map { case (f, (bf, n)) =>
            val bos = new ByteArrayOutputStream()
            bf.writeTo(bos)
            BloomRow(f, n, fpp, bos.toByteArray)
          }.toDF()
      }

    rows.coalesce(1).write.mode("overwrite").parquet(dir.toString)

    CommitLog.write(spark, tablePath, CommitLog.CommitInfo(
      commitTime = ct, operation = "index_bloom", tableName = st.latest.tableName,
      tableType = st.latest.tableType, keyFields = st.latest.keyFields,
      precombineField = st.latest.precombineField, partitionFields = st.latest.partitionFields,
      partitions = Seq.empty, recordCount = files.size.toLong,
      schemaDdl = st.latest.schemaDdl, sourcePath = None))

    if (fs.exists(bloomRoot(tablePath)))
      fs.listStatus(bloomRoot(tablePath)).map(_.getPath)
        .filter(_.getName < ct).foreach(fs.delete(_, true))
    ct
  }

  def latestIndex(spark: SparkSession, tablePath: String): Option[String] =
    CommitLog.commits(spark, tablePath).filter(_.operation == "index_bloom")
      .lastOption.map(_.commitTime)
      .filter(ct => CommitLog.fs(spark, tablePath).exists(bloomDir(tablePath, ct)))

  // ----------------------------------------------------------------- probe

  /** Files that might contain ANY of `keys` (record-key strings, the
    * `_hoodie_record_key` format). The probe distributes over the sidecar
    * with the keys broadcast — suited to point lookups and bounded update
    * batches; for huge key sets skip the index and scan (the caller's
    * `maxKeys` guard). No index → every live file is a candidate.
    */
  def candidateFiles(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String]): StatsIndex.PruneResult = {
    val fs = CommitLog.fs(spark, tablePath)
    val live = StatsIndex.listBaseFiles(fs, tablePath)
    latestIndex(spark, tablePath) match {
      case None => StatsIndex.PruneResult(live, live.size, 0, None)
      case Some(ct) =>
        val bKeys = spark.sparkContext.broadcast(keys.toArray)
        import spark.implicits._
        // collect the NON-candidates: provably key-free files
        val skip = spark.read.parquet(bloomDir(tablePath, ct).toString)
          .select("file", "bloom").as[(String, Array[Byte])]
          .mapPartitions { it =>
            it.filterNot { case (_, bytes) =>
              val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
              bKeys.value.exists(bf.mightContainString)
            }.map(_._1)
          }.collect().toSet
        val kept = live.filterNot(skip)
        StatsIndex.PruneResult(kept, live.size, live.size - kept.size, Some(ct))
    }
  }

  /** Point lookup by record key, bloom-pruned: on an indexed table this
    * opens only the files whose bloom fires. Keys are `_hoodie_record_key`
    * strings (single key field: the stringified value; composite:
    * "k1:v1,k2:v2"). Live MOR deltas and METADATA_ONLY partitions fall
    * back to the merged snapshot — correct, unpruned.
    */
  def readByKeys(spark: SparkSession, tablePath: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "readByKeys needs at least one key")
    val st = CommitLog.requireState(spark, tablePath)
    val pred = col(MetaColumns.RecordKey).isin(keys: _*)
    if (Deltas.liveCommits(spark, tablePath).nonEmpty || st.metadataOnlyPartitions.nonEmpty)
      return KeyedTable.read(spark, tablePath).filter(pred)
    val schema = StructType.fromDDL(st.latest.schemaDdl)
    val pr = candidateFiles(spark, tablePath, keys)
    if (pr.kept.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).option("basePath", tablePath)
      .parquet(pr.kept: _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
      .filter(pred)
  }
}
