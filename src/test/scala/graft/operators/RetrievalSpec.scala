package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BM25 retrieval: ranking semantics (coverage and saturation), k and
  * tie-break contracts, and the two idf variants' shared ordering on
  * single-term queries.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // doc 1: both query terms, short — the clear winner
    (1L, "alpha beta gamma"),
    // doc 2: one query term, repeated (tf saturation must not beat coverage)
    (2L, "alpha alpha alpha alpha alpha alpha alpha alpha"),
    // doc 3: one query term once, long doc (length-normalized down)
    (3L, "alpha " + (1 to 20).map(i => s"filler$i").mkString(" ")),
    // doc 4: no query terms
    (4L, "delta epsilon zeta")).toDF("doc_id", "text")

  private def ranks(lnIdf: Boolean): Seq[(Long, Long, Long)] =
    Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq((1L, "alpha beta")).toDF("query_id", "qtext"), k = 10, lnIdf = lnIdf)
      .select("query_id", "doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  test("coverage beats saturation, length normalization demotes, absent terms " +
      "never rank; both idf variants agree here") {
    for (ln <- Seq(true, false)) {
      val r = ranks(ln)
      assert(r.map(_._2).toSet === Set(1L, 2L, 3L), s"lnIdf=$ln: $r")
      assert(r === Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L)),
        s"lnIdf=$ln ranking: $r (doc1 covers both terms; doc2's 8x tf " +
          "saturates below coverage; doc3 is length-normalized under doc2)")
    }
  }

  test("k bounds each query independently and ties break by doc_id") {
    val twins = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta"),
      (4L, "gamma")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(twins, col("doc_id"), col("text"),
        Seq((7L, "alpha"), (8L, "gamma")).toDF("query_id", "qtext"), k = 2)
      .select("query_id", "doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // query 7: docs 1-3 are identical scorers; k=2 keeps the two lowest ids
    assert(out === Seq((7L, 1L, 1L), (7L, 2L, 2L), (8L, 4L, 1L)), out.toString)
  }

  test("duplicate query terms count once (bag of terms, not bag of tokens)") {
    val once = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
      Seq((1L, "alpha")).toDF("query_id", "qtext"), k = 10)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val thrice = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
      Seq((1L, "alpha alpha alpha")).toDF("query_id", "qtext"), k = 10)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(once === thrice)
  }

  test("bm25fTopK is BIT-identical to bm25TopK over field-repeated text (the " +
      "BM25F-lite fold) and a boosted field outranks body matches") {
    // equal body lengths: with weight 3 every dl′ = 3 + 3, so the 'alpha'
    // ordering is pure weighted-tf — tag hit (3) > body tf 2 > body tf 1
    val fielded = Seq(
      (1L, "alpha beta gamma", "news"),
      (2L, "epsilon zeta eta", "alpha"),
      (3L, "alpha alpha beta", "web"),
      (4L, "eta theta iota", "web")).toDF("doc_id", "body", "tag")
    val qs = Seq((1L, "alpha"), (2L, "web beta")).toDF("query_id", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "rank", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    for (ln <- Seq(true, false)) {
      val f = rows(Retrieval.bm25fTopK(fielded, col("doc_id"),
        Seq(col("body") -> 1, col("tag") -> 3), qs, k = 10, lnIdf = ln))
      // the defining equivalence of the simple BM25F fold: weight w ≡ the
      // field's text repeated w times in a single-field document — tf′, dl′,
      // and df all coincide, so every score bit must match
      val folded = fielded.withColumn("all",
        concat_ws(" ", col("body"), col("tag"), col("tag"), col("tag")))
      val r = rows(Retrieval.bm25TopK(folded, col("doc_id"), col("all"),
        qs, k = 10, lnIdf = ln))
      assert(f === r, s"lnIdf=$ln: BM25F diverged from its repeated-text fold")
      // tag='alpha' at weight 3 beats body-tf matches for query 'alpha'
      assert(f.filter(_._1 == 1L).minBy(_._3)._2 === 2L,
        s"lnIdf=$ln: the boosted tag field must dominate: $f")
    }
  }

  test("proximityTopK ranks by the MINIMAL window covering every query term " +
      "(span asc, doc_id ties); docs missing a term are absent; duplicate " +
      "query words collapse") {
    val d = Seq(
      (1L, "alpha x x x beta"), // span 5
      (2L, "x alpha beta x"), // span 2 — tightest
      (3L, "beta x alpha x x beta x x x x alpha"), // best window = 3 (pos 9? no: alpha@3,beta@6 -> 4; beta@1,alpha@3 -> 3)
      (4L, "alpha x x x x x x"), // beta missing: absent
      (5L, "beta beta alpha")).toDF("doc_id", "text")
    val out = Retrieval.proximityTopK(d, col("doc_id"), col("text"),
        Seq((1L, "alpha beta"), (2L, "alpha beta alpha")).toDF("query_id", "qtext"),
        k = 10)
      .select("query_id", "doc_id", "span", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val q1 = Set((1L, 2L, 2L, 1L), (1L, 5L, 2L, 2L), (1L, 3L, 3L, 3L),
      (1L, 1L, 5L, 4L))
    // duplicate 'alpha' collapses: query 2 ≡ query 1
    assert(out === q1 ++ q1.map(t => (2L, t._2, t._3, t._4)), s"got $out")
  }

  test("phrase slop: slop=0 is exact adjacency, each extra slop admits one " +
      "more in-order gap, reordering never matches, and occurrences stay " +
      "distinct-anchor counts") {
    val d = Seq(
      (1L, "alpha beta"), // exact
      (2L, "alpha x beta"), // one gap: slop >= 1 only
      (3L, "beta alpha"), // reordered: never, at any slop
      (4L, "alpha x x beta"), // two gaps: slop >= 2 only
      (5L, "alpha beta alpha x beta")).toDF("doc_id", "text") // 2 exact+gapped mixes
    val q = Seq((1L, "alpha beta")).toDF("query_id", "phrase")
    def hits(slop: Int): Map[Long, Long] =
      Retrieval.phraseTopK(d, col("doc_id"), col("text"), q, k = 10, slop = slop)
        .select("doc_id", "n_occ").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(0) === Map(1L -> 1L, 5L -> 1L), "slop=0 must be exact adjacency")
    // slop=1: doc 5 gains the (alpha@3, beta@5) gapped pair — anchors 1 and 3
    assert(hits(1) === Map(1L -> 1L, 2L -> 1L, 5L -> 2L))
    // slop=2: doc 5's gapped pair validates anchors 2 AND 3 (an occurrence
    // is a distinct matching anchor BY DEFINITION — wider slop can admit
    // more anchors per physical co-occurrence, deterministically)
    assert(hits(2) === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 3L))
    assert(!hits(2).contains(3L), "reordered words must never match (order is enforced)")
  }

  test("proximity sweep matches an exhaustive brute force on dense repeated " +
      "terms (the O(P*L) fold vs all O(P^2) windows)") {
    // docs dense in one frequent term — exactly the shape that made the
    // old per-(start, term) band join quadratic; the sweep must still
    // produce the true minimal window
    val texts = Seq(
      1L -> "the the the alpha the the beta the the the",
      2L -> "alpha the the the the the the the the beta",
      3L -> "the alpha beta the alpha the the beta the alpha",
      4L -> "beta the the the alpha beta the alpha the the",
      5L -> "the the the the the the the the the the")
    val d = texts.toDF("doc_id", "text")
    val qs = Seq((1L, "alpha beta"), (2L, "the alpha beta")).toDF("query_id", "qtext")
    // brute force: every (start, end) window over the token list, keep the
    // tightest containing all query terms
    def brute(text: String, terms: Set[String]): Option[Long] = {
      val w = text.split("\\s+")
      val spans = for {
        a <- w.indices; b <- a until w.length
        if terms.subsetOf(w.slice(a, b + 1).toSet)
      } yield (b - a + 1).toLong
      if (spans.isEmpty) None else Some(spans.min)
    }
    val expect = (for {
      (q, qt) <- Seq(1L -> Set("alpha", "beta"), 2L -> Set("the", "alpha", "beta"))
      (id, text) <- texts
      s <- brute(text, qt)
    } yield (q, id) -> s).toMap
    val got = Retrieval.proximityTopK(d, col("doc_id"), col("text"), qs, k = 10)
      .select("query_id", "doc_id", "span").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect, s"sweep spans diverged from brute force: $got vs $expect")
  }

  test("proximity sweep semantics on a constructed doc: the window ends at " +
      "each event, width = pos - min(lastSeen) + 1, min over events") {
    // alpha@2, beta@5, alpha@7, gamma@8: windows covering all three are
    // [2..8] (7) and [5..8] (4) — the sweep must find 4, which only a
    // LAST-seen (not first-seen) fold produces
    val d = Seq((1L, "x alpha x x beta x alpha gamma")).toDF("doc_id", "text")
    val out = Retrieval.proximityTopK(d, col("doc_id"), col("text"),
        Seq((1L, "alpha beta gamma")).toDF("query_id", "qtext"), k = 1)
      .select("span").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(4L), s"got $out")
  }

  test("phraseTopK ranks by occurrence count of the CONSECUTIVE sequence, " +
      "ties by doc_id; zero-occurrence docs are absent") {
    val d = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "beta alpha"),
      (3L, "alpha beta"),
      (4L, "alpha gamma beta")).toDF("doc_id", "text")
    val out = Retrieval.phraseTopK(d, col("doc_id"), col("text"),
        Seq((1L, "alpha beta")).toDF("query_id", "phrase"), k = 10)
      .select("query_id", "doc_id", "n_occ", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((1L, 1L, 2L, 1L), (1L, 3L, 1L, 2L)), s"got $out")
  }
}
