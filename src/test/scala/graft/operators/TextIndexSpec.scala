package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.TableType
import graft.table.{CommitLog, KeyedTable}

/** Standing inverted index: probes must be pure read-side work bit-identical
  * to the bm25TopK recompute, appends must REPLACE a re-upserted doc's
  * postings atomically, removals must take a doc out of ranking (and df/N)
  * while history stays asOf-able, and a registered index must follow its
  * corpus hands-off.
  */
class TextIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf = spark.read.parquet(sf("documents")).select("doc_id", "text")

  private val queries = Seq(
    (1L, "fast join query"), (2L, "stream window batch")).toDF("query_id", "qtext")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("query_id", "doc_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("probe ≡ bm25TopK over the same corpus (both idf variants), commits " +
      "nothing, and the build(half) + append(half) path serves the full corpus") {
    val idx = s"${tmpDir("text-idx")}/idx"
    TextIndex.build(spark, idx, docsDf.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
    TextIndex.append(spark, idx, docsDf.filter(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val commits0 = CommitLog.commits(spark, idx).map(_.commitTime)
    for (ln <- Seq(true, false)) {
      val got = rows(TextIndex.probe(spark, idx, queries, k = 10, lnIdf = ln))
      val recompute = rows(Retrieval.bm25TopK(
        docsDf, col("doc_id"), col("text"), queries, k = 10, lnIdf = ln))
      assert(got === recompute, s"lnIdf=$ln: stored postings diverge from recompute")
      assert(got.nonEmpty)
    }
    assert(CommitLog.commits(spark, idx).map(_.commitTime) === commits0,
      "probe must not write to the index table")
  }

  test("append REPLACES a re-upserted doc's postings as one commit: removed " +
      "terms stop matching the instant new terms start") {
    val idx = s"${tmpDir("text-replace")}/idx"
    val v1 = Seq((1L, "apple banana"), (2L, "cherry date")).toDF("doc_id", "text")
    TextIndex.build(spark, idx, v1, "doc_id", "text")
    val q = Seq((1L, "banana"), (2L, "mango")).toDF("query_id", "qtext")
    def hits(qid: Long) = TextIndex.probe(spark, idx, q, k = 10)
      .filter(col("query_id") === qid).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(hits(1L) === Set(1L) && hits(2L) === Set.empty[Long])
    // doc 1 v2 drops 'banana', gains 'mango'
    val nonCompact0 = CommitLog.commits(spark, idx).count(_.operation != "compact")
    TextIndex.append(spark, idx, Seq((1L, "apple mango")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(CommitLog.commits(spark, idx).count(_.operation != "compact")
      === nonCompact0 + 1, "replace-append must be ONE commit")
    assert(hits(1L) === Set.empty[Long], "a removed term kept matching (stale posting)")
    assert(hits(2L) === Set(1L), "the new term must match")
  }

  test("remove takes the doc out of ranking AND the df/N statistics; asOf " +
      "pre-removal reproduces the historical ranking; re-append re-serves") {
    val idx = s"${tmpDir("text-remove")}/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    TextIndex.build(spark, idx, docs, "doc_id", "text")
    val q = Seq((1L, "alpha")).toDF("query_id", "qtext")
    val before = rows(TextIndex.probe(spark, idx, q, k = 10))
    assert(before.map(_._2) === Set(1L, 2L))
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    TextIndex.remove(spark, idx, Seq(1L).toDF("doc_id"), "doc_id")
    val after = rows(TextIndex.probe(spark, idx, q, k = 10))
    assert(after.map(_._2) === Set(2L), "removed doc still ranks")
    // stats shifted: doc 2's score changes because N/avgdl/df dropped doc 1
    val recompute = rows(Retrieval.bm25TopK(
      docs.filter(col("doc_id") =!= 1L), col("doc_id"), col("text"), q, k = 10))
    assert(after === recompute,
      "post-removal ranking must equal a recompute over the remaining corpus")
    assert(rows(TextIndex.probe(spark, idx, q, k = 10, asOf = Some(tip0)))
      === before, "asOf pre-removal must reproduce the historical ranking")
    TextIndex.append(spark, idx, Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(rows(TextIndex.probe(spark, idx, q, k = 10)) === before)
  }

  test("streaming ingest: micro-batches replace-append; end state ≡ batch " +
      "appends; a redelivered batch (including a re-worded doc) changes nothing") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val dir = tmpDir("text-stream")
    val idx = s"$dir/idx"
    TextIndex.build(spark, idx,
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text")
    val b1 = Seq((3L, "alpha epsilon"), (4L, "zeta"))
    val b2 = Seq((3L, "eta theta"), (5L, "beta")) // doc 3 RE-WORDED mid-stream
    val stream = MemoryStream[(Long, String)]
    val q = TextIndex.ingestStream(
      stream.toDF().toDF("doc_id", "text"), idx, tmpDir("text-ckpt"),
      "doc_id", "text")
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable() // source-level redelivery
    } finally q.stop()
    val queries = Seq((1L, "alpha"), (2L, "eta"), (3L, "epsilon"))
      .toDF("query_id", "qtext")
    val streamed = rows(TextIndex.probe(spark, idx, queries, k = 10))
    // end state ≡ the equivalent batch sequence on a fresh index
    val idx2 = s"$dir/idx2"
    TextIndex.build(spark, idx2,
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text")
    TextIndex.append(spark, idx2, b1.toDF("doc_id", "text"), "doc_id", "text")
    TextIndex.append(spark, idx2, b2.toDF("doc_id", "text"), "doc_id", "text")
    assert(streamed === rows(TextIndex.probe(spark, idx2, queries, k = 10)))
    // doc 3's v1 term (epsilon, query 3) no longer matches ANYTHING — the
    // mid-stream replace retired it — while its v2 term (eta, query 2) serves
    assert(!streamed.exists(t => t._1 == 3L),
      s"epsilon still matches re-worded doc 3: $streamed")
    assert(streamed.exists(t => t._1 == 2L && t._2 == 3L), "doc 3 v2 must match eta")
  }

  test("a text index registered on its corpus follows publishes hands-off") {
    val dir = tmpDir("text-sync")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    val docs = Seq((1L, "apple banana"), (2L, "cherry date"), (3L, "elder fig"))
      .toDF("doc_id", "text")
    KeyedTable.create(spark, corpusTbl, docs,
      tableName = "text_sync_corpus", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    TextIndex.build(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    SyncRegistry.register(spark, corpusTbl, "text",
      SyncRegistry.TextSpec(idx, "doc_id", "text"),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    // corpus: delete doc 2, re-word doc 1, insert doc 4 — NO sync call
    KeyedTable.delete(spark, corpusTbl, Seq(2L).toDF("doc_id"))
    KeyedTable.upsert(spark, corpusTbl,
      Seq((1L, "grape kiwi"), (4L, "banana lemon")).toDF("doc_id", "text"))
    val q = Seq((1L, "banana"), (2L, "cherry"), (3L, "grape"))
      .toDF("query_id", "qtext")
    val got = TextIndex.probe(spark, idx, q, k = 10)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 4L), (3L, 1L)),
      s"index must mirror the corpus end state, got $got")
  }
}
