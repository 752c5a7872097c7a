package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TableType
import graft.table.KeyedTable

/** Standing INVERTED INDEX as a keyed graft table — the scale leg of text
  * retrieval, the way [[DedupIndex]]/[[AnnIndex]]/[[PqIndex]] are the scale
  * legs of their operators. [[Retrieval.bm25TopK]] re-tokenizes the corpus
  * per query run: correct, but at 100 TB the O(corpus tokens) pass
  * dominates every search. Here the postings — per-(term, doc) term
  * frequencies and per-doc lengths — persist ONCE, and:
  *
  *  1. [[probe]] serves BM25 from STORAGE: the query-term filter pushes
  *     into the posting scan (`term` is a key prefix — clustered scans and
  *     blooms apply), and the scoring core is [[Retrieval.bm25Score]], so
  *     probe ≡ bm25TopK over the same corpus BIT-FOR-BIT (spec-pinned);
  *  2. [[append]] (re)indexes a doc batch with REPLACE semantics: one
  *     mergeRows commit tombstones every existing posting/doclen key of the
  *     batch's ids and lands the new entries — a re-upserted doc's REMOVED
  *     terms stop matching in the same instant its new terms start (plain
  *     keyed upsert could not retire them);
  *  3. [[remove]] is the takedown leg: all of an id's posting/doclen keys
  *     tombstone in one delta — the doc never ranks again, history stays
  *     `asOf`-able (the x67/x68 compliance posture).
  *
  * Registered as `kind = text` in the [[SyncRegistry]], the index follows
  * its corpus hands-off like the other three. Layout — one table,
  * hive-partitioned by `kind`, keyed (kind, term, id):
  * `kind='posting'` rows (term, id = doc id, tf); `kind='doclen'` rows
  * (term = '', id, tf = token count). N and avgdl derive from the doclen
  * partition at probe time (one column-pruned count/sum — the cellStats
  * pattern; they change with every append, so storing them would just be
  * a cache of the same scan).
  */
object TextIndex {

  val KindCol = "kind"
  val PostingKind = "posting"
  val DoclenKind = "doclen"

  private def entriesOf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = Retrieval.tokens(docs, col(idCol), col(textCol))
    val post = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .select(lit(PostingKind).as(KindCol), col("term"),
        col("doc_id").as("id"), col("tf"),
        lit(null).cast("array<string>").as("terms"))
    // the doclen row doubles as the doc's FORWARD list (its distinct terms):
    // replace-append/remove enumerate a doc's posting keys from this ONE
    // key-addressed row instead of scanning the posting partition — the
    // piece that keeps those tombstone sets O(batch docs' rows), not O(index)
    val dl = terms.groupBy("doc_id")
      .agg(count(lit(1)).as("tf"), collect_set(col("term")).as("terms"))
      .select(lit(DoclenKind).as(KindCol), lit("").as("term"),
        col("doc_id").as("id"), col("tf"), col("terms"))
    post.unionByName(dl)
  }

  /** Build ONCE from the corpus: one tokenization pass, one table create.
    * MOR keyed table (appends are delta commits), `compact.auto` at birth
    * like every standing index.
    */
  def build(
      spark: SparkSession, tablePath: String, corpus: DataFrame,
      idCol: String, textCol: String): Unit = {
    KeyedTable.create(spark, tablePath, entriesOf(corpus, idCol, textCol),
      tableName = "graft_text_index",
      keyFields = Seq(KindCol, "term", "id"), precombineField = "id",
      partitionFields = Seq(KindCol), tableType = TableType.MergeOnRead)
    graft.table.TableProperties.set(spark, tablePath,
      Map(graft.table.TableProperties.CompactAuto -> "true"))
  }

  private def readIndex(
      spark: SparkSession, tablePath: String, asOf: Option[String]): DataFrame =
    asOf.map(KeyedTable.readAsOf(spark, tablePath, _))
      .getOrElse(KeyedTable.read(spark, tablePath))

  /** All stored keys belonging to `ids` — the tombstone set for both
    * replace-append and takedown. Enumerated from the ids' DOCLEN rows
    * (each carries its doc's forward term list), so the cost is one
    * kind-pruned scan of the doclen partition semi-joined to the id set —
    * never a pass over the posting partition, which is ~avg-doc-length
    * times larger. Ids never indexed simply contribute no keys.
    */
  private def keysOf(t: DataFrame, ids: DataFrame, idCol: String): DataFrame = {
    val dlRows = t.filter(col(KindCol) === DoclenKind)
      .select(col("id"), col("terms"))
      .join(broadcast(ids.select(col(idCol).as("id")).distinct()), Seq("id"), "left_semi")
    dlRows.select(lit(PostingKind).as(KindCol),
        explode(col("terms")).as("term"), col("id"))
      .unionByName(dlRows.select(lit(DoclenKind).as(KindCol),
        lit("").as("term"), col("id")))
  }

  /** (Re)index a doc batch with REPLACE semantics as ONE commit: every
    * existing posting/doclen key of the batch's ids tombstones and the new
    * entries land together ([[KeyedTable.mergeRows]], images beat same-key
    * tombstones) — a re-upserted doc's removed terms stop matching in the
    * same instant its new terms start, and no probe ever sees half a doc.
    */
  def append(
      spark: SparkSession, tablePath: String, docs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val dels = keysOf(KeyedTable.read(spark, tablePath),
      docs.select(col(idCol)), idCol)
    KeyedTable.mergeRows(spark, tablePath, dels, entriesOf(docs, idCol, textCol))
    ()
  }

  /** Streaming twin of [[append]] ([[AnnIndex.ingestStream]]'s shape): every
    * micro-batch of `docs` (a streaming DataFrame) replace-appends into the
    * standing index — probes always see the latest ingested batch.
    * Exactly-once note: foreachBatch delivers at-least-once, and the batch
    * body is IDEMPOTENT — replace-append tombstones the batch ids' old keys
    * and lands entries derived deterministically from the batch, so a
    * crash-replay re-lands the same state.
    */
  def ingestStream(
      docs: DataFrame,
      indexPath: String,
      checkpointDir: String,
      idCol: String,
      textCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        if (!b.isEmpty) append(b.sparkSession, indexPath, b.toDF(), idCol, textCol)
        ()
      }
      .start()

  /** Takedown leg: tombstone every posting/doclen key of `ids` — one keyed
    * delta, O(the ids' postings). The doc never ranks again and stops
    * counting toward df/N/avgdl; history is retained, not rewritten (an
    * `asOf` probe before the removal reproduces the historical ranking;
    * pair with `cleanArchive` when the bytes must go). Re-appending
    * re-serves.
    */
  def remove(
      spark: SparkSession, tablePath: String, ids: DataFrame,
      idCol: String): Unit = {
    KeyedTable.delete(spark, tablePath,
      keysOf(KeyedTable.read(spark, tablePath), ids, idCol))
    ()
  }

  /** BM25 top-k against the STORED postings — [[Retrieval.bm25TopK]]'s
    * exact scoring core with the posting/doclen sides served from storage
    * (bit-identical over the same corpus, spec-pinned). No tokenization,
    * no table writes; `asOf` reproduces a historical ranking.
    */
  def probe(
      spark: SparkSession, tablePath: String, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75, lnIdf: Boolean = true,
      asOf: Option[String] = None): DataFrame = {
    val t = readIndex(spark, tablePath, asOf)
    // push the query terms into the posting SCAN as a literal IN filter:
    // parquet row-group min/max prune it (decisively so after a
    // clusterSort("term") layout pass), where the scoring core's broadcast
    // join alone would still read every posting row group. The collect is
    // bounded by the QUERY's distinct terms (not the corpus vocabulary) and
    // capped — past 1000 terms the semi-join path stands alone. Semantics
    // are unchanged either way: the scoring core only ever looks at
    // query-term postings.
    val qterms = queries
      .select(explode(split(col(queries.columns(1)), "\\s+")).as("term"))
      .distinct().limit(1001).collect().map(_.getString(0)).toSeq
    val postAll = t.filter(col(KindCol) === PostingKind)
      .select(col("term"), col("id").as("doc_id"), col("tf"))
    val post =
      if (qterms.size <= 1000) postAll.filter(col("term").isin(qterms: _*))
      else postAll
    val dl = t.filter(col(KindCol) === DoclenKind)
      .select(col("id").as("doc_id"), col("tf").as("dl"))
    Retrieval.bm25Score(post, dl, queries, k, k1, b, lnIdf)
  }
}
