package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text retrieval over the corpus — the search leg of the pipeline set
  * (find the documents about X; pull exemplars for a curriculum bucket;
  * audit what a takedown id's content ranked for). BM25 (Robertson/Spärck
  * Jones), the bag-of-words ranking function every retrieval stack speaks,
  * plus the two legs users reach for next: PHRASE queries (positional
  * intersection — "exact phrase", not bag-of-terms) and FIELD-BOOSTED
  * BM25F-lite (title-weight-3 style multi-column scoring).
  *
  * Scale shape: one O(corpus tokens) pass builds tf/dl (two grouped
  * counts); the query side is a POSTING-LIST join — the distinct query
  * terms (tiny, broadcast) prune the tf table map-side, document-frequency
  * joins restrict to those same terms, and scoring shuffles only the
  * surviving (query, doc) postings, never the corpus. k winners per query
  * via one rank window. At 100 TB the tf/dl pass is the one-time index
  * build; persist it with the table stack ([[TextIndex]]) if queries
  * outlive the job.
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
  * variant, not textbook BM25. Phrase ranking is all-integer (occurrence
  * counts) — exact on any engine.
  */
object Retrieval {

  /** Whitespace bag-of-tokens: `(doc_id, term)` one row per token. The one
    * tokenization every BM25 face shares — recompute and stored postings
    * must agree on it or the index silently diverges from the operator.
    */
  private[operators] def tokens(
      docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"), explode(split(textCol, "\\s+")).as("term"))

  /** [[tokens]] with 1-based token positions: `(doc_id, pos, term)` — the
    * input of phrase scoring and the positional posting build.
    */
  private[operators] def tokensWithPos(
      docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"),
        posexplode(split(textCol, "\\s+")).as(Seq("p0", "term")))
      .select(col("doc_id"), (col("p0") + lit(1)).cast("long").as("pos"),
        col("term"))

  /** One row per (query, DISTINCT term): the standard bag-of-TERMS query
    * form (duplicate words in a query count once).
    */
  private def queryTerms(queries: DataFrame): DataFrame =
    queries
      .select(col(queries.columns.head).as("query_id"),
        explode(split(col(queries.columns(1)), "\\s+")).as("term"))
      .distinct()

  /** The shared ranking tail: exact-decimal sum per (query, doc), one rank
    * window (ties by doc_id), k winners, one double cast at the end.
    */
  private def rankTopK(contrib: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("sc").desc, col("doc_id").asc)
    contrib.groupBy("query_id", "doc_id").agg(sum(col("c")).as("sc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("sc").cast("double").as("score"))
  }

  /** The scoring core over materialized postings: `post` = (term, doc_id,
    * tf), `dl` = (doc_id, dl), `queries` = (query_id, qtext). Shared by
    * [[bm25TopK]] / [[bm25fTopK]] (postings built in-plan); the stored twin
    * is [[bm25ScoreStored]] — keep their expression SHAPES identical or the
    * two faces drift bitwise.
    */
  private[operators] def bm25Score(
      post: DataFrame, dl: DataFrame, queries: DataFrame,
      k: Int, k1: Double, b: Double, lnIdf: Boolean): DataFrame = {
    // N and avgdl: one tiny broadcast row. avgdl as exact-long-sum / count
    // (a single double division — engine-portable; built-in avg orderings
    // are not)
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val qterms = queryTerms(queries)
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
    rankTopK(contrib, k)
  }

  /** [[bm25Score]] over STORED postings that carry their doc's length
    * denormalized (`post` = (term, doc_id, tf, dl)) and corpus stats
    * maintained incrementally beside them — so a probe touches NOTHING
    * sized by the corpus: no doclen-relation join, no full-partition stats
    * aggregate. Bit-identical to [[bm25Score]] given the same integers:
    * `n`/`avgdl` enter as literals computed with the same long→double casts
    * and single division, and every expression shape matches.
    */
  private[operators] def bm25ScoreStored(
      post: DataFrame, queries: DataFrame,
      k: Int, k1: Double, b: Double, lnIdf: Boolean,
      n: Long, sumDl: Long): DataFrame = {
    val avgdl = sumDl.toDouble / n.toDouble // same IEEE ops as bm25Score's agg
    val qterms = queryTerms(queries)
    val dfreq = post.join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idfRaw = (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val idf = if (lnIdf) log(idfRaw + lit(1.0)) else idfRaw
    val contrib = post
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .withColumn("c",
        (idf * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl)))))
          .cast(DecimalType(38, 12)))
    rankTopK(contrib, k)
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

  /** Field-boosted BM25F-lite: score over SEVERAL text columns with integer
    * per-field weights — the "title counts 3×" ranking every curation user
    * asks for right after plain BM25. The simple-variant BM25F fold
    * (Robertson/Zaragoza): weighted term frequency tf′(t,d) = Σ_f w_f ·
    * tf_f(t,d) and weighted length dl′(d) = Σ_f w_f · len_f(d) feed the
    * UNCHANGED BM25 formula (one idf over "term appears in any field"),
    * which is exactly [[bm25Score]] over postings built from
    * weight-annotated tokens — integer weights keep tf′/dl′ exact longs,
    * so the oracle discipline (rational idf, DECIMAL sums) carries over
    * unchanged. Equivalent by construction to [[bm25TopK]] over documents
    * with each field's text repeated w_f times (spec-pinned).
    */
  def bm25fTopK(
      docs: DataFrame, idCol: Column, fields: Seq[(Column, Int)],
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75,
      lnIdf: Boolean = true): DataFrame = {
    require(fields.nonEmpty, "bm25fTopK needs at least one (field, weight)")
    require(fields.forall(_._2 > 0), "field weights must be positive integers")
    val wtok = fields.map { case (c, w) =>
      docs.select(idCol.as("doc_id"), explode(split(c, "\\s+")).as("term"),
        lit(w.toLong).as("wt"))
    }.reduce(_ unionByName _)
    val post = wtok.groupBy("doc_id", "term").agg(sum(col("wt")).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"))
    val dl = wtok.groupBy("doc_id").agg(sum(col("wt")).as("dl"))
    bm25Score(post, dl, queries, k, k1, b, lnIdf)
  }

  /** The phrase-matching core over positional tokens: `tok` = (doc_id, pos,
    * term) — built in-plan by [[phraseTopK]] or exploded from stored
    * positional postings by [[TextIndex.phraseTopK]], so the two faces are
    * identical by construction. A phrase of L words matches at anchor
    * position p iff word i sits at p+i for every slot i < L; the classic
    * adjacency-join form: each (slot i, term) row joins the token table on
    * term, anchors = pos − i, and an anchor hit by ALL L DISTINCT slots is
    * one occurrence (count-distinct handles repeated words — "batch batch"
    * needs slots 0 AND 1, which one token row cannot satisfy alone).
    *
    * `slop` widens the anchor equality to a band — the "within a few words,
    * in order" query between exact phrases and free proximity windows: word
    * i may sit anywhere in `[p+i, p+i+slop]`, i.e. each token supports the
    * anchors `[pos−i−slop, pos−i]` (one `sequence` explode of slop+1
    * candidates per token — the same count-distinct-slots rule then applies
    * unchanged, so slop=0 degenerates to exact adjacency: a 1-element
    * sequence). Order stays enforced (slot i's band never reaches before
    * the anchor), anchors below position 1 are discarded, and an
    * OCCURRENCE is a distinct matching anchor — a deterministic,
    * all-integer count on any engine.
    *
    * Ranking is n_occ DESC with doc_id ties — all-integer, exact on any
    * engine. Cost: |tok restricted to phrase terms| × (slop+1), shuffled by
    * (query, doc, anchor) — never the corpus.
    */
  private[operators] def phraseScore(
      tok: DataFrame, phrases: DataFrame, k: Int, slop: Int = 0): DataFrame = {
    require(slop >= 0, "slop must be >= 0")
    val slots = phrases.select(col(phrases.columns.head).as("query_id"),
      posexplode(split(col(phrases.columns(1)), "\\s+")).as(Seq("i", "term")))
    val qlen = slots.groupBy("query_id").agg(count(lit(1)).as("len"))
    val anchors = tok.join(broadcast(slots), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        explode(sequence(col("pos") - col("i") - lit(slop),
          col("pos") - col("i"))).as("anchor"), col("i"))
      .filter(col("anchor") >= lit(1L))
      .groupBy("query_id", "doc_id", "anchor")
      .agg(countDistinct(col("i")).as("hit"))
    val occ = anchors.join(broadcast(qlen), Seq("query_id"))
      .filter(col("hit") === col("len"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy("query_id").orderBy(col("n_occ").desc, col("doc_id").asc)
    occ.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_occ"), col("rank"))
  }

  /** Minimal-window proximity over positional tokens — the other classic
    * positional-index operator: for each doc containing ALL of a query's
    * distinct terms, the TIGHTEST span covering one occurrence of every
    * term (the standard sorted-lists minimal-window semantics), ranked
    * span ASC (tighter co-occurrence = more related), ties by doc_id;
    * docs missing any term are absent. All-integer scoring — exact on any
    * engine. Shape: the classic ONE-PASS SWEEP — per (query, doc) the
    * query-term tokens collect into one position-sorted event list, and a
    * running last-seen position per query-term slot folds over it
    * (`functions.aggregate`): once every slot has been seen, the minimal
    * window ENDING at an event is `pos − min(lastSeen) + 1`, and the span
    * is the minimum over events (every optimal window ends at an
    * occurrence of its latest term, so sweeping window-ends loses
    * nothing). O(P·L) per doc — P = the doc's query-term occurrences,
    * L = distinct query terms — instead of a per-(start, term) band join's
    * O(P²) row inflation: a long doc dense in one frequent query term
    * ("the …") stays linear in its postings. Everything is restricted to
    * query-term tokens first, so cost tracks those position lists, never
    * the corpus.
    */
  private[operators] def proximityScore(
      tok: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val qterms = queryTerms(queries)
    // dense slot index per (query, term): the sweep state is one
    // last-seen cell per slot
    val slots = qterms.withColumn("j",
      (row_number().over(Window.partitionBy("query_id").orderBy("term")) - lit(1))
        .cast("int"))
    val qlen = slots.groupBy("query_id").agg(count(lit(1)).cast("int").as("len"))
    // per (query, doc): the query-term occurrences as ONE sorted event
    // list — positions are unique within a doc, so the order is total and
    // the fold below is deterministic
    val evs = tok.join(broadcast(slots), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("j")))).as("evs"))
    // state = (last-seen position per slot, best span so far); -1 = unset.
    // Positions are 1-based, so min(last) >= 1 ⇔ every slot seen.
    val sweep = aggregate(
      col("evs"),
      struct(array_repeat(lit(-1L), col("len")).as("last"), lit(-1L).as("best")),
      (st, e) => {
        val last = transform(st.getField("last"),
          (v, i) => when(i === e.getField("j"), e.getField("pos")).otherwise(v))
        val mn = array_min(last)
        val w = e.getField("pos") - mn + lit(1L)
        struct(last.as("last"),
          when(mn >= lit(1L) &&
              (st.getField("best") === lit(-1L) || w < st.getField("best")), w)
            .otherwise(st.getField("best")).as("best"))
      },
      st => st.getField("best"))
    val spans = evs.join(broadcast(qlen), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), sweep.as("span"))
      .filter(col("span") > lit(0L))
    val w = Window.partitionBy("query_id").orderBy(col("span").asc, col("doc_id").asc)
    spans.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("span"), col("rank"))
  }

  /** Minimal-window proximity top-k: `queries` is (query_id, qtext);
    * returns (query_id, doc_id, span, rank) — span = the tightest window
    * (in token positions, inclusive) covering every distinct query term,
    * rank 1..k per query by span ASC with doc_id ties. The in-plan
    * recompute face; [[TextIndex.proximityTopK]] answers the same query
    * from stored positional postings.
    */
  def proximityTopK(
      docs: DataFrame, idCol: Column, textCol: Column, queries: DataFrame,
      k: Int): DataFrame =
    proximityScore(tokensWithPos(docs, idCol, textCol), queries, k)

  /** Exact-phrase top-k: `phrases` is (query_id, phrase); returns
    * (query_id, doc_id, n_occ, rank) — docs ranked by occurrence count of
    * the CONSECUTIVE word sequence (not the bag of its words), rank ties by
    * doc_id, docs with zero occurrences absent. `slop > 0` relaxes
    * adjacency to an in-order ≤slop-gap band per word ([[phraseScore]]).
    * The in-plan recompute face; [[TextIndex.phraseTopK]] answers the same
    * query from stored positional postings without touching the corpus.
    */
  def phraseTopK(
      docs: DataFrame, idCol: Column, textCol: Column, phrases: DataFrame,
      k: Int, slop: Int = 0): DataFrame =
    phraseScore(tokensWithPos(docs, idCol, textCol), phrases, k, slop)
}
