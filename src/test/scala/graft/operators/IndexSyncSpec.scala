package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.TableType
import graft.table.{CommitLog, KeyedTable}

/** Derived-index consistency from a base table's CDC feed: corpus deletes
  * must tombstone index entries (no ghost screening / no ghost hits),
  * corpus upserts must (re)index, replayed intervals must converge, and a
  * quiet corpus must deliver nothing.
  */
class IndexSyncSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("embeddings"))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("dedup leg: a corpus takedown stops screening, a corpus insert starts; " +
      "no-change pulls deliver nothing; a replayed interval converges") {
    val dir = tmpDir("idx-sync-dedup")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      tableName = "sync_corpus", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idx,
      KeyedTable.read(spark, corpusTbl), "doc_id", "text")
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime

    // corpus mutations: takedown doc 1, insert doc 3
    KeyedTable.delete(spark, corpusTbl, Seq(1L).toDF("doc_id"))
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))

    val applied = IndexSync.syncDedup(spark, corpusTbl, idx, s"$dir/ckpt",
      "doc_id", "text", startAt = Some(tip0))
    assert(applied.nonEmpty, "the mutated interval must deliver")

    // the index mirrors the corpus end state
    assert(ids(KeyedTable.read(spark, idx)) === Set(2L, 3L))
    // ghost gone: the removed doc's content re-sent is NOVEL...
    assert(DedupIndex.probe(spark, idx,
      Seq((101L, textA)).toDF("doc_id", "text"), "doc_id", "text").isEmpty)
    // ...and the inserted doc's content now SCREENS
    assert(DedupIndex.probe(spark, idx,
      Seq((102L, textC + " tail")).toDF("doc_id", "text"),
      "doc_id", "text").count() === 1)

    // quiet corpus: nothing delivered, index untouched
    val commits = CommitLog.commits(spark, idx).map(_.commitTime)
    assert(IndexSync.syncDedup(spark, corpusTbl, idx, s"$dir/ckpt",
      "doc_id", "text").isEmpty)
    assert(CommitLog.commits(spark, idx).map(_.commitTime) === commits)

    // at-least-once replay: a FRESH checkpoint re-delivers the same
    // interval; re-applying it must not change the index's LOGICAL state
    // (keyed tombstones + keyed upserts are idempotent; the re-landed
    // entry's _hoodie_commit_time meta legitimately moves — it IS a write)
    def dataState() = KeyedTable.read(spark, idx)
      .select("doc_id", DedupIndex.SigCol, DedupIndex.ShCol)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val before = dataState()
    assert(IndexSync.syncDedup(spark, corpusTbl, idx, s"$dir/ckpt2",
      "doc_id", "text", startAt = Some(tip0)).nonEmpty)
    assert(dataState() === before, "replaying the interval diverged the index")
  }

  test("ANN leg: corpus deletes leave the probe, inserts join it, and the synced " +
      "index answers like a recompute over the corpus end state") {
    val dir = tmpDir("idx-sync-ann")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    KeyedTable.create(spark, corpusTbl,
      emb.filter(col("vec_id") >= 25).select("vec_id", "embedding"),
      tableName = "sync_emb", keyFields = Seq("vec_id"),
      precombineField = "vec_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    AnnIndex.build(spark, idx, KeyedTable.read(spark, corpusTbl), nlist = 8, iters = 1)
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime

    KeyedTable.delete(spark, corpusTbl, Seq(25L, 26L).toDF("vec_id"))
    KeyedTable.upsert(spark, corpusTbl,
      emb.filter(col("vec_id").isin(10L, 11L)).select("vec_id", "embedding"))
    assert(IndexSync.syncAnn(spark, corpusTbl, idx, s"$dir/ckpt",
      startAt = Some(tip0)).nonEmpty)

    val queries = emb.filter(col("vec_id") < 3)
    // reachability: the full probe serves the inserts, never the deletes
    val full = AnnIndex.probe(spark, idx, queries.limit(1), k = 100000, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(Set(10L, 11L).subsetOf(full), "synced inserts must be searchable")
    assert(full.intersect(Set(25L, 26L)).isEmpty, "synced deletes still probed")
    // the synced index ≡ an ivf recompute over the corpus END STATE with
    // the same stored centroids
    def pairs(df: DataFrame) = df.select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 8))
    val ivf = Similarity.ivfTopK(
      KeyedTable.read(spark, corpusTbl).select("vec_id", "embedding"),
      queries, k = 10, nlist = 8, nprobe = 8,
      centroids = Some(AnnIndex.centroids(spark, idx)))
    assert(got === pairs(ivf))
  }

  test("PQ leg: deletes drop code AND vector rows, inserts encode against the " +
      "stored codebooks, and the probe never serves a deleted id") {
    val dir = tmpDir("idx-sync-pq")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    KeyedTable.create(spark, corpusTbl,
      emb.filter(col("vec_id") >= 25).select("vec_id", "embedding"),
      tableName = "sync_emb_pq", keyFields = Seq("vec_id"),
      precombineField = "vec_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    PqIndex.build(spark, idx, KeyedTable.read(spark, corpusTbl),
      dim = 64, m = 16, iters = 1, nlist = 8)
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    val n0 = emb.filter(col("vec_id") >= 25).count()

    KeyedTable.delete(spark, corpusTbl, Seq(30L, 31L, 32L).toDF("vec_id"))
    KeyedTable.upsert(spark, corpusTbl,
      emb.filter(col("vec_id").isin(5L, 6L)).select("vec_id", "embedding"))
    assert(IndexSync.syncPq(spark, corpusTbl, idx, s"$dir/ckpt",
      startAt = Some(tip0)).nonEmpty)

    val t = KeyedTable.read(spark, idx)
    val n = n0 - 3 + 2
    assert(t.filter(col(PqIndex.KindCol) === PqIndex.CodeKind).count() === n * 16)
    assert(t.filter(col(PqIndex.KindCol) === PqIndex.VectorKind).count() === n)
    val queries = emb.filter(col("vec_id") < 3)
    val served = PqIndex.probe(spark, idx, queries.limit(1), k = 100000,
      dim = 64, m = 16, shortlist = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(Set(5L, 6L).subsetOf(served))
    assert(served.intersect(Set(30L, 31L, 32L)).isEmpty)
  }
}
