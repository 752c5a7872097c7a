package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.TableType
import graft.table.KeyedTable

/** Standing IVF ANN index AS a keyed graft table — the scale leg of
  * similarity search, the way [[DedupIndex]] is the scale leg of near-dup
  * screening.
  *
  * [[Similarity.ivfTopK]] (x07) retrains/reassigns per query run: correct,
  * but at 100 TB you cannot re-run Lloyd (or even re-assign the corpus) per
  * batch. Here the trained state — the `nlist` refined centroids AND every
  * corpus vector's cell assignment — is persisted ONCE into a keyed MOR
  * graft table, and every batch after that:
  *
  *  1. [[probe]]: queries pick their `nprobe` nearest cells against the
  *     tiny broadcast centroid set and re-rank exactly against ONLY the
  *     stored vectors of those cells (a bucket join on the cell id) —
  *     zero Lloyd iterations, zero corpus re-assignment, O(queries ·
  *     probed-cell volume) work;
  *  2. [[append]]: new vectors are assigned against the STORED centroids
  *     (one broadcast argmax pass over the batch, no retraining) and land
  *     as one keyed upsert — the next probe automatically searches them.
  *
  * The index inherits the whole table stack: `asOf` probes reproduce a
  * historical search exactly (x62's spec pins probe ≡ ivfTopK over the
  * same centroids), CDC streams index growth, OCC serializes concurrent
  * appenders, compaction folds delta batches. Recall is the IVF trade
  * (nprobe/nlist) — identical to x07's, since the plan shape is identical;
  * only WHERE the centroids and assignments come from changed (storage
  * instead of recomputation).
  *
  * Layout: one table, hive-partitioned by `kind` so probes prune to the
  * half they need — `kind='centroid'` rows `(k = cent_id, cell = cent_id,
  * v = centroid)` (nlist rows, broadcast side), `kind='vector'` rows
  * `(k = vec_id, cell = assigned cent_id, v = embedding)` (corpus-sized,
  * the bucket-join side).
  */
object AnnIndex {

  val KindCol = "kind"
  val CentroidKind = "centroid"
  val VectorKind = "vector"

  /** Assign each vector `(vec_id, v)` its nearest centroid by cosine — the
    * broadcast + map-side argmax shape (n·nlist scored rows collapse inside
    * the scan task, nothing vector-sized shuffles).
    */
  private def assignCells(vectors: DataFrame, cents: DataFrame): DataFrame =
    vectors.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("cent_id"),
        Similarity.cosine(col("v"), col("cv")).as("csim"))
      .groupBy("vec_id")
      .agg(Similarity.argmaxById(col("csim"), col("cent_id")).as("cell"),
        first(col("v")).as("v")) // v is constant per vec_id

  private def vectorRows(assigned: DataFrame): DataFrame =
    assigned.select(lit(VectorKind).as(KindCol), col("vec_id").as("k"),
      col("cell"), col("v"))

  /** Train ONCE and persist: `iters` rounds of deterministic Lloyd over the
    * corpus (decimal-summed — centroids are bit-stable across runs), one
    * assignment pass, one table create. The only place Lloyd ever runs.
    */
  def build(
      spark: SparkSession, tablePath: String, corpus: DataFrame,
      nlist: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val vecs = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val cents = Similarity.kmeansCentroids(corpus, nlist, iters, idCol, vecCol)
    val centRows = cents.select(lit(CentroidKind).as(KindCol),
      col("cent_id").cast("long").as("k"), col("cent_id").cast("long").as("cell"),
      col("cv").as("v"))
    val rows = centRows.unionByName(vectorRows(assignCells(vecs, cents)))
    // born with compact.auto: a standing index LIVES on streamed appends —
    // the unbounded-delta-chain shape the policy hook exists for; the stamp
    // is atomic with the create (no crash window without it)
    KeyedTable.create(spark, tablePath, rows,
      tableName = "graft_ann_index",
      keyFields = Seq(KindCol, "k"), precombineField = "k",
      partitionFields = Seq(KindCol), tableType = TableType.MergeOnRead,
      properties = Map(graft.table.TableProperties.CompactAuto -> "true"))
    ()
  }

  /** The stored centroid set `(cent_id, cv)` at the live tip (or `asOf`). */
  def centroids(
      spark: SparkSession, tablePath: String,
      asOf: Option[String] = None): DataFrame =
    readIndex(spark, tablePath, asOf)
      .filter(col(KindCol) === CentroidKind)
      .select(col("k").as("cent_id"), col("v").as("cv"))

  private def readIndex(
      spark: SparkSession, tablePath: String, asOf: Option[String]): DataFrame =
    asOf.map(KeyedTable.readAsOf(spark, tablePath, _))
      .getOrElse(KeyedTable.read(spark, tablePath))

  /** Per-cell vector counts of the stored index, hottest first — the IVF
    * health signal: a skewed distribution (one cell holding most vectors)
    * means probes of that cell degrade toward a scan and the centroids
    * deserve a retrain/split; appends drifting the corpus show up here
    * before they show up as latency. One grouped count over the vector
    * partition — no vector bytes move.
    */
  def cellStats(
      spark: SparkSession, tablePath: String,
      asOf: Option[String] = None): DataFrame =
    readIndex(spark, tablePath, asOf)
      .filter(col(KindCol) === VectorKind)
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("n_vectors").desc, col("cell").asc)

  /** Retrain the coarse quantizer IN PLACE from the STORED vectors — the
    * remedy [[cellStats]]' skew signal calls for: appends assign against
    * frozen centroids, so a drifting corpus piles into few cells and those
    * probes degrade toward a scan. `retrain` re-runs deterministic Lloyd
    * over the vector partition (`nlist = 0` keeps the current list count;
    * pass a larger one to SPLIT a hot index), reassigns every vector, and
    * lands new centroids + reassignments + stale-centroid tombstones as
    * ONE commit ([[KeyedTable.mergeRows]] — images beat same-key
    * tombstones, so shrinking nlist retires the surplus centroid rows in
    * the same instant). No read ever sees a half-retrained index: probes
    * before the commit use the old geometry, after it the new; an `asOf`
    * probe at a pre-retrain instant still reproduces the historical search
    * exactly, and rollback restores the old geometry wholesale.
    */
  def retrain(
      spark: SparkSession, tablePath: String,
      nlist: Int = 0, iters: Int = 2): Unit = {
    val t = KeyedTable.read(spark, tablePath)
    val vecs = t.filter(col(KindCol) === VectorKind)
      .select(col("k").as("vec_id"), col("v"))
    val oldCentKeys = t.filter(col(KindCol) === CentroidKind)
      .select(lit(CentroidKind).as(KindCol), col("k"))
    val n = if (nlist > 0) nlist else oldCentKeys.count().toInt
    require(n > 0, "retrain needs nlist > 0 (or an index with existing centroids)")
    val cents = Similarity.kmeansCentroids(vecs, n, iters, "vec_id", "v")
    val centRows = cents.select(lit(CentroidKind).as(KindCol),
      col("cent_id").cast("long").as("k"), col("cent_id").cast("long").as("cell"),
      col("cv").as("v"))
    val images = centRows.unionByName(vectorRows(assignCells(vecs, cents)))
    KeyedTable.mergeRows(spark, tablePath, oldCentKeys, images)
    ()
  }

  /** Index a new vector batch WITHOUT retraining: assign against the stored
    * centroids (broadcast argmax over the batch only) and upsert — one MOR
    * delta commit, O(batch) cost, re-delivered ids fold to one entry.
    */
  def append(
      spark: SparkSession, tablePath: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val vecs = batch.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val assigned = assignCells(vecs, centroids(spark, tablePath))
    KeyedTable.upsert(spark, tablePath, vectorRows(assigned))
  }

  /** Takedown leg: drop `ids`' VECTOR rows from the standing index — one
    * keyed tombstone delta (O(|ids|)), so a corpus deletion (PII takedown)
    * propagates: the removed vector never surfaces from a [[probe]] again
    * and stops occupying its cell in [[cellStats]]. Centroids are
    * untouched — they are trained state, not corpus rows (the FAISS
    * posture: removing list entries never retrains the quantizer; a
    * drifted index is [[retrain]]'s job). History is retained, not
    * rewritten: an `asOf` probe BEFORE the removal still reproduces the
    * historical search, tombstone semantics a takedown audit wants; pair
    * with `cleanArchive` when the bytes themselves must go. Re-appending
    * the id later re-serves it (the newer delta wins).
    */
  def remove(
      spark: SparkSession, tablePath: String, ids: DataFrame,
      idCol: String = "vec_id"): Unit =
    KeyedTable.delete(spark, tablePath,
      ids.select(lit(VectorKind).as(KindCol), col(idCol).cast("long").as("k"))
        .distinct())

  /** Streaming twin of [[append]] ([[DedupIndex.ingestStream]]'s shape):
    * every micro-batch of `vectors` (a streaming DataFrame) is assigned
    * against the stored centroids and upserted — the standing index grows
    * with the ingest stream, probes always see the latest appended batch.
    * Exactly-once note: foreachBatch delivers at-least-once, and the batch
    * body is IDEMPOTENT by construction — assignment against the (never
    * retrained) centroids is deterministic and the upsert is keyed by
    * vec_id, so a crash-replay re-lands the same entries.
    */
  def ingestStream(
      vectors: DataFrame,
      indexPath: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        if (!b.isEmpty) append(b.sparkSession, indexPath, b.toDF(), idCol, vecCol)
        ()
      }
      .start()

  /** ANN top-k of `queries` against the STORED index: nprobe nearest cells
    * per query (broadcast centroids), then an exact cosine re-rank over
    * only the stored vectors of the probed cells (broadcast bucket join —
    * the probe set is queries·nprobe rows). No training, no corpus
    * re-assignment, no table write; `asOf` reproduces a historical search
    * against the index as it stood then. Output matches
    * [[Similarity.bruteForceTopK]]'s shape: (query_id, vec_id, sim, rank).
    */
  def probe(
      spark: SparkSession, tablePath: String, queries: DataFrame, k: Int,
      nprobe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      asOf: Option[String] = None): DataFrame = {
    val t = readIndex(spark, tablePath, asOf)
    val cents = t.filter(col(KindCol) === CentroidKind)
      .select(col("k").as("cent_id"), col("v").as("cv"))
    val vecs = t.filter(col(KindCol) === VectorKind)
      .select(col("k").as("vec_id"), col("cell"), col("v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents), lit(true))
      .select(col("query_id"), col("qv"), col("cent_id"),
        Similarity.cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    vecs.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
  }
}
