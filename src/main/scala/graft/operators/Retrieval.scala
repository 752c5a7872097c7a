package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text retrieval over the corpus — the search leg of the pipeline set
  * (find the documents about X; pull exemplars for a curriculum bucket;
  * audit what a takedown id's content ranked for). BM25 (Robertson/Spärck
  * Jones), the bag-of-words ranking function every retrieval stack speaks.
  *
  * Scale shape: one O(corpus tokens) pass builds tf/dl (two grouped
  * counts); the query side is a POSTING-LIST join — the distinct query
  * terms (tiny, broadcast) prune the tf table map-side, document-frequency
  * joins restrict to those same terms, and scoring shuffles only the
  * surviving (query, doc) postings, never the corpus. k winners per query
  * via one rank window. At 100 TB the tf/dl pass is the one-time index
  * build; persist it with the table stack if queries outlive the job.
  *
  * Determinism: per-term contributions are IEEE-exact expressions (same
  * bits in any engine given the same integers), but SUMMING doubles is
  * order-sensitive — so contributions quantize to DECIMAL(38,12) and the
  * sum is exact, with ONE double cast at the end (the repo-wide oracle
  * discipline). `lnIdf = true` (default) is textbook BM25 idf
  * (ln((N−df+0.5)/(df+0.5) + 1)); libm's ln is NOT bit-portable across
  * engines, so oracle-checked paths use `lnIdf = false` — the raw odds
  * ratio (N−df+0.5)/(df+0.5), rational arithmetic only. Per-term idf ORDER
  * is identical (ln is monotone); summed rankings are a (documented)
  * variant, not textbook BM25.
  */
object Retrieval {

  /** Whitespace bag-of-tokens: `(doc_id, term)` one row per token. The one
    * tokenization every BM25 face shares — recompute and stored postings
    * must agree on it or the index silently diverges from the operator.
    */
  private[operators] def tokens(
      docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"), explode(split(textCol, "\\s+")).as("term"))

  /** The scoring core over materialized postings: `post` = (term, doc_id,
    * tf), `dl` = (doc_id, dl), `queries` = (query_id, qtext). Shared by
    * [[bm25TopK]] (postings built in-plan) and [[TextIndex.probe]]
    * (postings served from storage), so the two are bit-identical by
    * construction.
    */
  private[operators] def bm25Score(
      post: DataFrame, dl: DataFrame, queries: DataFrame,
      k: Int, k1: Double, b: Double, lnIdf: Boolean): DataFrame = {
    // N and avgdl: one tiny broadcast row. avgdl as exact-long-sum / count
    // (a single double division — engine-portable; built-in avg orderings
    // are not)
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val qterms = queries
      .select(col(queries.columns.head).as("query_id"),
        explode(split(col(queries.columns(1)), "\\s+")).as("term"))
      .distinct()
    // df restricted to the query terms BEFORE grouping: the vocabulary is
    // corpus-sized, the query vocabulary is not
    val dfreq = post.join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idfRaw = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val idf = if (lnIdf) log(idfRaw + lit(1.0)) else idfRaw
    val contrib = post
      .join(broadcast(qterms), Seq("term")) // postings of query terms only
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("c",
        (idf * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
          .cast(DecimalType(38, 12)))
    val w = Window.partitionBy("query_id").orderBy(col("sc").desc, col("doc_id").asc)
    contrib.groupBy("query_id", "doc_id").agg(sum(col("c")).as("sc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("sc").cast("double").as("score"))
  }

  /** BM25 top-k: `queries` is (query_id, qtext); returns
    * (query_id, doc_id, rank, score) with rank 1..k per query, ties broken
    * by doc_id. Duplicate terms in a query count once (the standard
    * bag-of-TERMS form).
    */
  def bm25TopK(
      docs: DataFrame, idCol: Column, textCol: Column, queries: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      lnIdf: Boolean = true): DataFrame = {
    val terms = tokens(docs, idCol, textCol)
    val post = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    bm25Score(post, dl, queries, k, k1, b, lnIdf)
  }
}
