package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Index-sidecar observability (the T40 complement of T38's lock rows): one
  * row per live index column, describing WHAT is indexed and HOW FRESH the
  * sidecar is — without reading sidecar parquet. `index.auto` maintains
  * sidecars invisibly; an operator deciding whether a slow point lookup is
  * an index problem needs column / instant / coverage / fpp / bytes at a
  * glance. Served through BOTH SQL surfaces from this ONE code path (the
  * `show_lock` + `.locks` pattern): the `.indexes` meta relation (typed,
  * joinable) and the `CALL graft.system.show_indexes` procedure (strings).
  *
  * Freshness reads as `covered_files` vs `live_files`: a sidecar only ever
  * covers the base files that existed at its build instant; files appended
  * since are KEPT by every prune (safe, just unpruned), so covered < live
  * means the index is stale by exactly that tail. Pure metadata: a commit-
  * log fold, one recursive file listing, and the tiny `_index.json` markers
  * — no data or sidecar-parquet scan, O(#files) namenode work like any
  * snapshot read.
  */
object IndexDescribe {

  /** One live index column. `column` is the CURRENT logical name (null when
    * the indexed column has since been dropped — the sidecar still serves
    * asOf reads); `physical_column` is the stored identity. `fpp` is bloom-
    * only. `covered_files` is -1 for a legacy sidecar without a marker.
    */
  final case class IndexRow(
      kind: String,
      column: String,
      physical_column: String,
      instant: String,
      covered_files: Long,
      live_files: Long,
      fpp: Option[Double],
      bytes: Long,
      auto: Boolean)

  private final case class Marker(files: Long, fpp: Option[Double], column: Option[String])

  /** Parse a sidecar dir's `_index.json` (both shapes: stats
    * `{"columns":[..],"files":n}`, bloom `{"column":..,"files":n,"fpp":p}`).
    */
  private def markerOf(fs: FileSystem, dir: Path): Option[Marker] = {
    val p = new Path(dir, "_index.json")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val node = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    finally in.close()
    Some(Marker(
      Option(node.get("files")).map(_.asLong()).getOrElse(-1L),
      Option(node.get("fpp")).map(_.asDouble()),
      Option(node.get("column")).map(_.asText())))
  }

  private def dirBytes(fs: FileSystem, dir: Path): Long =
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).filter(_.isFile).map(_.getLen).sum

  /** Every live index sidecar of the table, stats rows first then bloom,
    * each sorted by physical column. Empty when the table has no index.
    */
  def rows(spark: SparkSession, tablePath: String): Seq[IndexRow] = {
    val st = CommitLog.requireState(spark, tablePath)
    val m = st.columnMapping
    val fs = CommitLog.fs(spark, tablePath)
    val live = StatsIndex.listBaseFiles(fs, tablePath).size.toLong
    val auto = TableProperties.get(spark, tablePath)
      .get(TableProperties.IndexAuto).exists(_.equalsIgnoreCase("true"))

    val stats = StatsIndex.latestIndex(spark, tablePath).toSeq.flatMap { ct =>
      val dir = StatsIndex.statsDir(tablePath, ct)
      val covered = markerOf(fs, dir).map(_.files).getOrElse(-1L)
      val bytes = dirBytes(fs, dir)
      StatsIndex.indexedColumns(spark, tablePath).sorted.map { phys =>
        IndexRow("stats", m.logicalOf(phys).orNull, phys, ct,
          covered, live, None, bytes, auto)
      }
    }

    val bloomRootDir = BloomIndex.bloomRoot(tablePath)
    val bloom =
      if (!fs.exists(bloomRootDir)) Seq.empty
      else {
        // sidecars without a marker predate it and indexed the record key
        val physCols = fs.listStatus(bloomRootDir).map(_.getPath)
          .map(d => markerOf(fs, d).flatMap(_.column).getOrElse(MetaColumns.RecordKey))
          .distinct.sorted.toSeq
        physCols.flatMap { phys =>
          BloomIndex.latestIndex(spark, tablePath, phys).map { ct =>
            val dir = BloomIndex.bloomDir(tablePath, ct)
            val mk = markerOf(fs, dir)
            IndexRow("bloom", m.logicalOf(phys).orNull, phys, ct,
              mk.map(_.files).getOrElse(-1L), live,
              mk.flatMap(_.fpp), dirBytes(fs, dir), auto)
          }
        }
      }
    stats ++ bloom
  }
}
