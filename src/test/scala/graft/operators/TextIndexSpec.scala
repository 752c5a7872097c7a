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

  /** Total task input RECORDS of `action` — stage-level input metrics, the
    * Bench StageMetricsListener pattern (flush via reflection:
    * waitUntilEmpty is private[spark] in source, public in bytecode).
    * Records (not bytes) isolate row-group pruning from layout-dependent
    * compression and footer overhead: a pruned group's rows never reach the
    * reader, so recordsRead IS the scan-input size the prune saves.
    */
  private def recordsRead(action: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) acc.addAndGet(m.inputMetrics.recordsRead)
        ()
      }
    }
    def flush(): Unit = {
      val sc = spark.sparkContext
      sc.getClass.getMethods.find(_.getName == "listenerBus")
        .map(_.invoke(sc)).foreach { bus =>
          bus.getClass.getMethods
            .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
            .foreach(_.invoke(bus))
        }
    }
    flush()
    spark.sparkContext.addSparkListener(l)
    try { action; flush() } finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  test("probe touches nothing corpus-sized: it serves with every doclen file " +
      "VANDALIZED (proof it opens none of them) and the query terms push " +
      "into the posting scan as literals") {
    val idx = s"${tmpDir("text-scanshape")}/idx"
    TextIndex.build(spark, idx, docsDf.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
    TextIndex.append(spark, idx, docsDf.filter(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val df = TextIndex.probe(spark, idx, queries, k = 10, lnIdf = false)
    val want = rows(df)
    assert(want.nonEmpty)
    // the pushed IN: query-term literals sit in the executed plan's posting
    // filter (collect() above finalized the adaptive plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("fast") && plan.contains("stream"),
      s"query-term literals absent - the IN prune is not reaching the scan:\n$plan")
    // the one remaining O(corpus) term the r12 verdict flagged: N/avgdl came
    // from a full doclen aggregate and dl from a corpus-sized join — now dl
    // rides each posting and (N, Σdl) are 2 keyed stats rows. PROOF the
    // probe reads no doclen input at all: overwrite every parquet file of
    // the doclen partition (base AND delta dirs) with garbage — any read
    // that opened one would die on the magic bytes — and probe again
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val vandalized = Files.walk(Paths.get(idx)).iterator().asScala
      .filter(p => p.toString.contains(s"${TextIndex.KindCol}=${TextIndex.DoclenKind}")
        && p.toString.endsWith(".parquet"))
      .map { p => Files.write(p, "not a parquet file".getBytes); p }
      .size
    assert(vandalized > 0, "fixture: no doclen files found to vandalize")
    assert(rows(TextIndex.probe(spark, idx, queries, k = 10, lnIdf = false))
      === want, "probe result changed - it must not depend on doclen files")
    // the phrase probe shares the posting-only scan shape
    TextIndex.phraseTopK(spark, idx,
      Seq((1L, "fast join")).toDF("query_id", "phrase"), k = 10).collect()
  }

  test("optimize clusters postings by term: the pushed IN then actually skips " +
      "row groups (scan input records drop) and the ranking is unchanged") {
    val idx = s"${tmpDir("text-optimize")}/idx"
    // 10× the sf0.001 corpus so posting data dominates footer overhead and
    // the prune's byte signal is unambiguous
    val big = docsDf.crossJoin(spark.range(10).select(col("id").as("rep")))
      .select((col("doc_id") * 10 + col("rep")).as("doc_id"), col("text"))
    TextIndex.build(spark, idx, big, "doc_id", "text")
    val q = Seq((1L, "vector")).toDF("query_id", "qtext")
    def run(): Set[(Long, Long, Long, Double)] =
      rows(TextIndex.probe(spark, idx, q, k = 10, lnIdf = false))
    val want = run()
    assert(want.nonEmpty)
    val before = recordsRead { run(); () }
    // term-clustered row groups: every group covers a tight term range, so
    // the single-term pushed filter prunes all but ~one via parquet min/max
    // — the probe's scan input shrinks from the whole posting partition to
    // roughly the query term's postings
    TextIndex.optimize(spark, idx, maxRecordsPerFile = 2000)
    val after = recordsRead { assert(run() === want); () }
    assert(after * 5 < before,
      s"term-clustered probe scanned $after records vs $before unclustered - " +
        "the layout pass is not pruning row groups")
  }

  test("layout.auto: appends degrade the term-clustered layout, the birth-" +
      "stamped hook restores the row-group prune hands-off, and a broken " +
      "stamp never fails a data publish") {
    import graft.table.{MaintenanceLog, TableProperties}
    val idx = s"${tmpDir("text-layout-auto")}/idx"
    val big = docsDf.crossJoin(spark.range(10).select(col("id").as("rep")))
      .select((col("doc_id") * 10 + col("rep")).as("doc_id"), col("text"))
    TextIndex.build(spark, idx, big, "doc_id", "text")
    // spec-scale triggers: fire after 2 data commits, split rewrite files
    // small enough that min/max pruning has ranges to work with
    TableProperties.set(spark, idx, Map(
      TableProperties.LayoutAutoCommits -> "2",
      TableProperties.LayoutAutoMaxRecords -> "2000"))
    val q = Seq((1L, "vector")).toDF("query_id", "qtext")
    def run(): Set[(Long, Long, Long, Double)] =
      rows(TextIndex.probe(spark, idx, q, k = 10, lnIdf = false))
    assert(run().nonEmpty)
    val degraded = recordsRead { run(); () } // unclustered bootstrap layout
    TextIndex.append(spark, idx,
      Seq((9000001L, "vector alpha")).toDF("doc_id", "text"), "doc_id", "text")
    assert(!CommitLog.commits(spark, idx).exists(_.operation == "cluster"),
      "one data commit is below the threshold - the hook must not fire yet")
    TextIndex.append(spark, idx,
      Seq((9000002L, "vector beta")).toDF("doc_id", "text"), "doc_id", "text")
    // commit count met, but the two tiny appends are a negligible fraction
    // of the big posting partition: the DEFAULT ratio guard (0.02) blocks
    // the full-partition rewrite - the 100 TB posture (a probe's unpruned
    // tail is proportional to the pending fraction, so below the ratio the
    // degradation is cheaper than the rewrite)
    assert(!CommitLog.commits(spark, idx).exists(_.operation == "cluster"),
      "tiny pending rows must not trigger a full partition rewrite")
    TableProperties.set(spark, idx, Map(TableProperties.LayoutAutoRatio -> "0"))
    TextIndex.append(spark, idx,
      Seq((9000003L, "vector delta")).toDF("doc_id", "text"), "doc_id", "text")
    // ratio lifted: the next publish re-clusters with NOBODY calling optimize
    assert(CommitLog.commits(spark, idx).exists(_.operation == "cluster"),
      "the layout hook must have fired a cluster rewrite")
    val want = run()
    val after = recordsRead { assert(run() === want); () }
    assert(after * 5 < degraded,
      s"hands-off re-clustered probe scanned $after records vs $degraded " +
        "degraded - the hook is not restoring the prune")
    // failure posture: a stamp naming a nonexistent column must journal and
    // leave the data publish standing
    TableProperties.set(spark, idx, Map(
      TableProperties.LayoutAuto -> "no_such_column",
      TableProperties.LayoutAutoCommits -> "1"))
    TextIndex.append(spark, idx,
      Seq((9000004L, "gamma")).toDF("doc_id", "text"), "doc_id", "text")
    assert(MaintenanceLog.read(spark, idx).exists(e =>
      e.service == TableProperties.LayoutAuto && e.outcome == "skipped"),
      "hook failure must journal as skipped, not fail the publish")
    assert(TextIndex.probe(spark, idx,
      Seq((1L, "gamma")).toDF("query_id", "qtext"), k = 10)
      .collect().nonEmpty, "the publish under the broken stamp must have landed")
  }

  test("phraseTopK: stored-postings probe ≡ in-plan recompute; phrases match " +
      "CONSECUTIVE words (a bag-of-terms reordering does NOT rank); repeated-" +
      "word phrases need every slot") {
    val idx = s"${tmpDir("text-phrase")}/idx"
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta alpha gamma"), // the bag of query 1, wrong order
      (3L, "alpha beta alpha beta"), // two occurrences
      (4L, "batch batch batch"), // repeated-word phrase: two anchors
      (5L, "alpha gamma beta")).toDF("doc_id", "text")
    // build(subset) + append(rest): the replace-append leg stays inside the
    // phrase surface too
    TextIndex.build(spark, idx, docs.filter(col("doc_id") <= 3), "doc_id", "text")
    TextIndex.append(spark, idx, docs.filter(col("doc_id") > 3), "doc_id", "text")
    val phrases = Seq((1L, "alpha beta"), (2L, "batch batch"), (3L, "gamma beta"))
      .toDF("query_id", "phrase")
    def occ(df: DataFrame): Set[(Long, Long, Long, Long)] =
      df.select("query_id", "doc_id", "n_occ", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = occ(TextIndex.phraseTopK(spark, idx, phrases, k = 10))
    assert(got === occ(Retrieval.phraseTopK(
      docs, col("doc_id"), col("text"), phrases, k = 10)),
      "stored positional postings diverge from the recompute")
    // the slop face shares the stored positions too: probe ≡ recompute, and
    // slop=1 admits the in-order gapped match exact adjacency rejects
    // (doc 5 "alpha gamma beta" for phrase "alpha beta")
    val slopped = occ(TextIndex.phraseTopK(spark, idx, phrases, k = 10, slop = 1))
    assert(slopped === occ(Retrieval.phraseTopK(
      docs, col("doc_id"), col("text"), phrases, k = 10, slop = 1)),
      "stored slop-phrase probe diverges from the recompute")
    assert(slopped.exists(t => t._1 == 1L && t._2 == 5L),
      s"slop=1 must admit the gapped alpha-gamma-beta match: $slopped")
    assert(!got.exists(t => t._1 == 1L && t._2 == 5L),
      "exact adjacency must NOT admit the gapped match")
    assert(got === Set(
      (1L, 3L, 2L, 1L), // two occurrences outrank...
      (1L, 1L, 1L, 2L), // ...one; docs 2 and 5 hold the bag but NOT the phrase
      (2L, 4L, 2L, 1L), // "batch batch" anchors at positions 1 and 2
      (3L, 5L, 1L, 1L)), s"got $got")
    // the proximity face shares the stored positions: probe ≡ recompute,
    // and the tighter co-occurrence outranks the looser one
    val pq = Seq((1L, "alpha gamma")).toDF("query_id", "qtext")
    def spans(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.select("query_id", "doc_id", "span", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val gotProx = spans(TextIndex.proximityTopK(spark, idx, pq, k = 10))
    assert(gotProx === spans(Retrieval.proximityTopK(
      docs, col("doc_id"), col("text"), pq, k = 10)))
    assert(gotProx === Seq((1L, 1L, 3L, 3L), (1L, 2L, 2L, 1L), (1L, 5L, 2L, 2L)),
      s"got $gotProx")
    // asOf: both positional probes reproduce historical answers — a
    // re-worded doc 5 shifts the live results, the pre-append snapshot not
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    TextIndex.append(spark, idx,
      Seq((5L, "gamma alpha")).toDF("doc_id", "text"), "doc_id", "text")
    assert(spans(TextIndex.proximityTopK(spark, idx, pq, k = 10,
      asOf = Some(tip0))) === gotProx, "asOf proximity diverged")
    assert(occ(TextIndex.phraseTopK(spark, idx, phrases, k = 10,
      asOf = Some(tip0))) === got, "asOf phrase diverged")
  }

  test("racing appends cannot lose a stats delta: every write leg touches the " +
      "stats partition, so the OCC aborts the stale writer (retryable) and a " +
      "retry converges to the exact recompute") {
    import graft.model.CommitConflictException
    val idx = s"${tmpDir("text-race")}/idx"
    val a = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val b = Seq((3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val c = Seq((4L, "eta"), (5L, "theta iota")).toDF("doc_id", "text")
    TextIndex.build(spark, idx, a, "doc_id", "text")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def race(batch: DataFrame): java.util.concurrent.Future[Boolean] =
      pool.submit({ () =>
        barrier.await()
        try { TextIndex.append(spark, idx, batch, "doc_id", "text"); true }
        catch { case _: CommitConflictException => false }
      }: java.util.concurrent.Callable[Boolean])
    val (fb, fc) = (race(b), race(c))
    val (okB, okC) = (fb.get(), fc.get())
    pool.shutdown()
    // either both serialized cleanly or the loser aborted RETRYABLE — a
    // silent lost (N, Σdl) update is the one forbidden outcome, and the
    // recompute equivalence below would expose it
    if (!okB) TextIndex.append(spark, idx, b, "doc_id", "text")
    if (!okC) TextIndex.append(spark, idx, c, "doc_id", "text")
    val q = Seq((1L, "alpha delta eta theta")).toDF("query_id", "qtext")
    val all = a.unionByName(b).unionByName(c)
    assert(rows(TextIndex.probe(spark, idx, q, k = 10, lnIdf = false)) ===
      rows(Retrieval.bm25TopK(all, col("doc_id"), col("text"), q,
        k = 10, lnIdf = false)),
      s"stats diverged after racing appends (okB=$okB okC=$okC)")
  }

  test("randomized convergence: any seeded sequence of appends, re-words, and " +
      "removals leaves BM25, phrase, AND proximity probes ≡ recomputes over " +
      "the end-state corpus (stats, postings, and positions all exact)") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    def text(): String =
      Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val idx = s"${tmpDir("text-random")}/idx"
    val truth = scala.collection.mutable.Map.empty[Long, String]
    (1L to 6L).foreach(i => truth(i) = text())
    TextIndex.build(spark, idx, truth.toSeq.toDF("doc_id", "text"),
      "doc_id", "text")
    for (_ <- 1 to 10) {
      rnd.nextInt(3) match {
        case 0 | 1 => // append 1-3 docs: new ids and/or re-words
          val batch = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(10))
            .distinct.map(i => (i, text()))
          batch.foreach { case (i, t) => truth(i) = t }
          TextIndex.append(spark, idx, batch.toDF("doc_id", "text"),
            "doc_id", "text")
        case _ if truth.nonEmpty => // remove 1-2 present docs
          val present = truth.keys.toSeq.sorted
          val picks = Seq.fill(1 + rnd.nextInt(2))(
            present(rnd.nextInt(present.size))).distinct
          picks.foreach(truth.remove)
          TextIndex.remove(spark, idx, picks.toDF("doc_id"), "doc_id")
        case _ => ()
      }
    }
    val docs = truth.toSeq.toDF("doc_id", "text")
    val qs = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "zeta eta theta"))
      .toDF("query_id", "qtext")
    for (ln <- Seq(true, false))
      assert(rows(TextIndex.probe(spark, idx, qs, k = 10, lnIdf = ln)) ===
        rows(Retrieval.bm25TopK(docs, col("doc_id"), col("text"), qs,
          k = 10, lnIdf = ln)), s"BM25 diverged (lnIdf=$ln) after random ops")
    def ints(df: DataFrame, c: String): Set[(Long, Long, Long, Long)] =
      df.select("query_id", "doc_id", c, "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ints(TextIndex.phraseTopK(spark, idx, qs, k = 10), "n_occ") ===
      ints(Retrieval.phraseTopK(docs, col("doc_id"), col("text"), qs, k = 10),
        "n_occ"), "phrase diverged after random ops")
    assert(ints(TextIndex.proximityTopK(spark, idx, qs, k = 10), "span") ===
      ints(Retrieval.proximityTopK(docs, col("doc_id"), col("text"), qs, k = 10),
        "span"), "proximity diverged after random ops")
  }

  test("FIELDED index: bm25fProbe ≡ the bm25fTopK recompute (both idf " +
      "variants) across build+append, remove shifts the per-field stats, " +
      "and mode guards refuse loudly") {
    val idx = s"${tmpDir("text-fielded")}/idx"
    val docs = Seq(
      (1L, "alpha beta gamma", "news"),
      (2L, "epsilon zeta eta", "alpha"),
      (3L, "alpha alpha beta", "web"),
      (4L, "eta theta iota", "web"),
      (5L, "beta beta", "news")).toDF("doc_id", "body", "tag")
    val fields = Seq("body" -> "body", "tag" -> "tag")
    val weights = Seq("body" -> 1, "tag" -> 3)
    TextIndex.buildFielded(spark, idx, docs.filter(col("doc_id") <= 3),
      "doc_id", fields)
    TextIndex.appendFielded(spark, idx, docs.filter(col("doc_id") > 3), "doc_id")
    val qs = Seq((1L, "alpha"), (2L, "web beta")).toDF("query_id", "qtext")
    def recompute(d: DataFrame, ln: Boolean) = rows(Retrieval.bm25fTopK(
      d, col("doc_id"), Seq(col("body") -> 1, col("tag") -> 3), qs,
      k = 10, lnIdf = ln))
    for (ln <- Seq(true, false))
      assert(rows(TextIndex.bm25fProbe(spark, idx, qs, weights, k = 10,
        lnIdf = ln)) === recompute(docs, ln),
        s"lnIdf=$ln: fielded probe diverged from the recompute")
    // re-worded doc REPLACES (its old terms stop matching) and the
    // per-field stats step; a removal shifts them again — both must keep
    // matching the recompute over the logical corpus
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    val docs2 = docs.filter(col("doc_id") =!= 2L)
      .unionByName(Seq((2L, "kappa", "books")).toDF("doc_id", "body", "tag"))
    TextIndex.appendFielded(spark, idx,
      Seq((2L, "kappa", "books")).toDF("doc_id", "body", "tag"), "doc_id")
    assert(rows(TextIndex.bm25fProbe(spark, idx, qs, weights, k = 10,
      lnIdf = false)) === recompute(docs2, false), "re-word diverged")
    TextIndex.remove(spark, idx, Seq(3L).toDF("doc_id"), "doc_id")
    assert(rows(TextIndex.bm25fProbe(spark, idx, qs, weights, k = 10,
      lnIdf = false)) === recompute(docs2.filter(col("doc_id") =!= 3L), false),
      "post-removal fielded stats diverged")
    // asOf reproduces the historical WEIGHTED ranking with the historical
    // per-field stats (the stats rows are table rows, so time travel is free)
    assert(rows(TextIndex.bm25fProbe(spark, idx, qs, weights, k = 10,
      lnIdf = false, asOf = Some(tip0))) === recompute(docs, false),
      "asOf fielded probe must serve the historical ranking")
    // guards: single-field faces refuse a fielded table and vice versa
    import graft.model.GraftException
    assert(intercept[GraftException] {
      TextIndex.probe(spark, idx, qs, k = 10)
    }.getMessage.contains("FIELDED"))
    assert(intercept[GraftException] {
      TextIndex.phraseTopK(spark, idx,
        Seq((1L, "alpha beta")).toDF("query_id", "phrase"), k = 10)
    }.getMessage.contains("FIELDED"))
    assert(intercept[GraftException] {
      TextIndex.append(spark, idx,
        Seq((9L, "x", "y")).toDF("doc_id", "body", "tag"), "doc_id", "body")
    }.getMessage.contains("FIELDED"))
    val single = s"${tmpDir("text-fielded")}/single"
    TextIndex.build(spark, single,
      Seq((1L, "alpha")).toDF("doc_id", "text"), "doc_id", "text")
    assert(intercept[GraftException] {
      TextIndex.bm25fProbe(spark, single, qs, weights, k = 10)
    }.getMessage.contains("single-field"))
    // weights must cover exactly the stored fields
    assert(intercept[IllegalArgumentException] {
      TextIndex.bm25fProbe(spark, idx, qs, Seq("body" -> 1), k = 10)
    }.getMessage.contains("exactly"))
  }

  test("GROUPED index: per-group doc counts ride the stats rows - append " +
      "steps them (including a source MOVE on re-word), remove steps down, " +
      "the probe serves with BOTH data partitions vandalized, asOf sees " +
      "history, and mode guards refuse loudly") {
    import graft.model.GraftException
    val dir = tmpDir("text-grouped")
    val idx = s"$dir/idx"
    val v1 = Seq(
      (1L, "alpha beta", "web"), (2L, "gamma", "web"),
      (3L, "delta epsilon", "news")).toDF("doc_id", "text", "source")
    TextIndex.build(spark, idx, v1, "doc_id", "text", groupCol = Some("source"))
    def counts(asOf: Option[String] = None): Map[String, (Long, Long)] =
      TextIndex.groupCounts(spark, idx, asOf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // (doc count, token count) per group: web = docs 1+2 (2+1 tokens)
    assert(counts() === Map("web" -> (2L, 3L), "news" -> (1L, 2L)))
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    // append: a new doc in news + doc 1 MOVES web -> books in one commit
    // (its 2 tokens leave web, its NEW 1-token body lands in books)
    TextIndex.append(spark, idx,
      Seq((4L, "zeta", "news"), (1L, "eta", "books"))
        .toDF("doc_id", "text", "source"), "doc_id", "text")
    assert(counts() === Map(
      "web" -> (1L, 1L), "news" -> (2L, 3L), "books" -> (1L, 1L)),
      "a re-worded doc that changed source must move between group rows")
    // remove web's last doc: the group leaves the live view entirely
    TextIndex.remove(spark, idx, Seq(2L).toDF("doc_id"), "doc_id")
    assert(counts() === Map("news" -> (2L, 3L), "books" -> (1L, 1L)))
    // the BM25 probe is undisturbed by the grouped layout
    val q = Seq((1L, "zeta eta")).toDF("query_id", "qtext")
    val live = Seq((1L, "eta", "books"), (3L, "delta epsilon", "news"),
      (4L, "zeta", "news")).toDF("doc_id", "text", "source")
    assert(rows(TextIndex.probe(spark, idx, q, k = 10, lnIdf = false)) ===
      rows(Retrieval.bm25TopK(live, col("doc_id"), col("text"), q,
        k = 10, lnIdf = false)),
      "BM25 on a grouped index must equal the recompute")
    assert(counts(Some(tip0)) === Map("web" -> (2L, 3L), "news" -> (1L, 2L)),
      "asOf must serve the historical group counts")
    // the probe reads ONLY stats rows: vandalize EVERY posting and doclen
    // parquet file - any read opening one dies on the magic bytes
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val vandalized = Files.walk(Paths.get(idx)).iterator().asScala
      .filter(p => (p.toString.contains(s"${TextIndex.KindCol}=${TextIndex.PostingKind}")
          || p.toString.contains(s"${TextIndex.KindCol}=${TextIndex.DoclenKind}"))
        && p.toString.endsWith(".parquet"))
      .map { p => Files.write(p, "not a parquet file".getBytes); p }
      .size
    assert(vandalized > 0, "fixture: no data files found to vandalize")
    assert(counts() === Map("news" -> (2L, 3L), "books" -> (1L, 1L)),
      "groupCounts must not depend on posting/doclen files")
    // guards: a grouped index refuses a group-less batch; a plain index
    // refuses groupCounts
    assert(intercept[GraftException] {
      TextIndex.append(spark, idx,
        Seq((9L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    }.getMessage.contains("GROUPED"))
    val plain = s"$dir/plain"
    TextIndex.build(spark, plain,
      Seq((1L, "alpha")).toDF("doc_id", "text"), "doc_id", "text")
    assert(intercept[GraftException] {
      TextIndex.groupCounts(spark, plain)
    }.getMessage.contains("not GROUPED"))
  }

  test("GROUPED + FIELDED compose: per-group doc/token counts step through " +
      "buildFielded/appendFielded/remove, tokens span ALL fields, and " +
      "BM25F scoring is undisturbed") {
    val idx = s"${tmpDir("text-grouped-fielded")}/idx"
    val docs = Seq(
      (1L, "alpha beta", "x", "web"), // 3 tokens across fields
      (2L, "gamma", "y", "web"), // 2
      (3L, "delta epsilon", "z", "news")). // 3
      toDF("doc_id", "body", "tag", "src")
    TextIndex.buildFielded(spark, idx, docs, "doc_id",
      Seq("body" -> "body", "tag" -> "tag"), groupCol = Some("src"))
    def counts(): Map[String, (Long, Long)] =
      TextIndex.groupCounts(spark, idx).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts() === Map("web" -> (2L, 5L), "news" -> (1L, 3L)))
    // append: new doc in news + doc 1 MOVES web -> books (tokens follow)
    TextIndex.appendFielded(spark, idx,
      Seq((4L, "zeta", "w", "news"), (1L, "eta", "q", "books"))
        .toDF("doc_id", "body", "tag", "src"), "doc_id")
    assert(counts() === Map(
      "web" -> (1L, 2L), "news" -> (2L, 5L), "books" -> (1L, 2L)),
      "fielded group counts must move with a source-changing re-word")
    TextIndex.remove(spark, idx, Seq(2L).toDF("doc_id"), "doc_id")
    assert(counts() === Map("news" -> (2L, 5L), "books" -> (1L, 2L)))
    // scoring face untouched by the composed mode
    val live = Seq(
      (1L, "eta", "q", "books"), (3L, "delta epsilon", "z", "news"),
      (4L, "zeta", "w", "news")).toDF("doc_id", "body", "tag", "src")
    val qs = Seq((1L, "zeta q")).toDF("query_id", "qtext")
    val weights = Seq("body" -> 1, "tag" -> 2)
    assert(rows(TextIndex.bm25fProbe(spark, idx, qs, weights, k = 10,
      lnIdf = false)) ===
      rows(Retrieval.bm25fTopK(live, col("doc_id"),
        Seq(col("body") -> 1, col("tag") -> 2), qs, k = 10, lnIdf = false)),
      "BM25F on a grouped fielded index must equal the recompute")
    // a grouped fielded index refuses a group-less batch
    import graft.model.GraftException
    assert(intercept[GraftException] {
      TextIndex.appendFielded(spark, idx,
        Seq((9L, "x", "y")).toDF("doc_id", "body", "tag"), "doc_id")
    }.getMessage.contains("GROUPED"))
  }

  test("FIELDED index with positionsFor: phrase AND proximity serve the " +
      "stamped field's token stream (≡ single-field recompute over that " +
      "column) across build+append+re-word, BM25F is undisturbed, and a " +
      "positionless fielded index refuses with both remedies") {
    import graft.model.GraftException
    val dir = tmpDir("text-fielded-pos")
    val idx = s"$dir/idx"
    val docs = Seq(
      (1L, "alpha beta gamma", "news"),
      (2L, "beta alpha", "alpha"), // tag holds a phrase word: must NOT count
      (3L, "alpha beta alpha beta", "web"),
      (4L, "gamma alpha beta", "web")).toDF("doc_id", "body", "tag")
    TextIndex.buildFielded(spark, idx, docs.filter(col("doc_id") <= 2),
      "doc_id", Seq("body" -> "body", "tag" -> "tag"),
      positionsFor = Some("body"))
    TextIndex.appendFielded(spark, idx, docs.filter(col("doc_id") > 2), "doc_id")
    val phrases = Seq((1L, "alpha beta")).toDF("query_id", "phrase")
    def occ(df: DataFrame): Set[(Long, Long, Long, Long)] =
      df.select("query_id", "doc_id", "n_occ", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // phrase over the BODY token stream only - doc 2's tag 'alpha' adds
    // nothing, its body "beta alpha" is the reordered bag
    val got = occ(TextIndex.phraseTopK(spark, idx, phrases, k = 10))
    assert(got === occ(Retrieval.phraseTopK(
      docs, col("doc_id"), col("body"), phrases, k = 10)),
      "fielded positional phrase must equal the single-field body recompute")
    assert(got.map(_._2) === Set(1L, 3L, 4L), s"got $got")
    // proximity face shares the stored field positions
    val pq = Seq((1L, "alpha gamma")).toDF("query_id", "qtext")
    def spans(df: DataFrame) =
      df.select("query_id", "doc_id", "span", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans(TextIndex.proximityTopK(spark, idx, pq, k = 10)) ===
      spans(Retrieval.proximityTopK(docs, col("doc_id"), col("body"), pq, k = 10)))
    // a re-word through the fielded append keeps positions fresh
    TextIndex.appendFielded(spark, idx,
      Seq((1L, "beta alpha gamma", "news")).toDF("doc_id", "body", "tag"), "doc_id")
    val docs2 = docs.filter(col("doc_id") =!= 1L).unionByName(
      Seq((1L, "beta alpha gamma", "news")).toDF("doc_id", "body", "tag"))
    assert(occ(TextIndex.phraseTopK(spark, idx, phrases, k = 10)) ===
      occ(Retrieval.phraseTopK(docs2, col("doc_id"), col("body"), phrases, k = 10)),
      "re-worded positions must serve the new body stream")
    // BM25F scoring is undisturbed by the positional payload
    val qs = Seq((1L, "alpha"), (2L, "web beta")).toDF("query_id", "qtext")
    assert(rows(TextIndex.bm25fProbe(spark, idx, qs,
      Seq("body" -> 1, "tag" -> 3), k = 10, lnIdf = false)) ===
      rows(Retrieval.bm25fTopK(docs2, col("doc_id"),
        Seq(col("body") -> 1, col("tag") -> 3), qs, k = 10, lnIdf = false)))
    // a fielded index WITHOUT the stamp refuses the positional faces with
    // both remedies named
    val bare = s"$dir/bare"
    TextIndex.buildFielded(spark, bare, docs, "doc_id",
      Seq("body" -> "body", "tag" -> "tag"))
    val e = intercept[GraftException] {
      TextIndex.phraseTopK(spark, bare, phrases, k = 10)
    }
    assert(e.getMessage.contains("positionsFor")
      && e.getMessage.contains("two-index"), e.getMessage)
  }

  test("a FIELDED index registered on its corpus follows publishes hands-off " +
      "(the sync dispatches on the text.fields stamp, not the spec)") {
    val dir = tmpDir("text-fielded-sync")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    val docs = Seq(
      (1L, "apple banana", "fruit"),
      (2L, "carrot", "veg"),
      (3L, "date elder", "fruit")).toDF("doc_id", "body", "tag")
    KeyedTable.create(spark, corpusTbl, docs,
      tableName = "fielded_sync_corpus", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    TextIndex.buildFielded(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", Seq("body" -> "body", "tag" -> "tag"))
    // a plain TextSpec: the apply must still re-index per-field (stamp wins)
    SyncRegistry.register(spark, corpusTbl, "ft",
      SyncRegistry.TextSpec(idx, "doc_id", "body"),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    KeyedTable.delete(spark, corpusTbl, Seq(2L).toDF("doc_id"))
    KeyedTable.upsert(spark, corpusTbl,
      Seq((4L, "fig grape", "fruit"), (1L, "kiwi", "veg"))
        .toDF("doc_id", "body", "tag"))
    val end = Seq(
      (1L, "kiwi", "veg"), (3L, "date elder", "fruit"),
      (4L, "fig grape", "fruit")).toDF("doc_id", "body", "tag")
    val qs = Seq((1L, "fruit"), (2L, "carrot"), (3L, "kiwi"))
      .toDF("query_id", "qtext")
    val weights = Seq("body" -> 1, "tag" -> 2)
    assert(rows(TextIndex.bm25fProbe(spark, idx, qs, weights, k = 10,
      lnIdf = false)) ===
      rows(Retrieval.bm25fTopK(end, col("doc_id"),
        Seq(col("body") -> 1, col("tag") -> 2), qs, k = 10, lnIdf = false)),
      "fielded index must mirror the corpus end state hands-off")
  }

  test("a GROUPED text index registered on its corpus steps its per-group " +
      "doc/token stats hands-off through the CDC sync (the apply derives " +
      "the group column from the text.group stamp, not the spec)") {
    val dir = tmpDir("text-grouped-sync")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    val docs = Seq(
      (1L, "apple banana", "fruit"), (2L, "carrot", "veg"),
      (3L, "date elder", "fruit")).toDF("doc_id", "text", "source")
    KeyedTable.create(spark, corpusTbl, docs,
      tableName = "grouped_sync_corpus", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    TextIndex.build(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text", groupCol = Some("source"))
    SyncRegistry.register(spark, corpusTbl, "gt",
      SyncRegistry.TextSpec(idx, "doc_id", "text"),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    // corpus: delete the only veg doc, re-word doc 1 MOVING it to veg,
    // insert doc 4 - NO sync call anywhere
    KeyedTable.delete(spark, corpusTbl, Seq(2L).toDF("doc_id"))
    KeyedTable.upsert(spark, corpusTbl,
      Seq((1L, "grape kiwi melon", "veg"), (4L, "banana lemon", "fruit"))
        .toDF("doc_id", "text", "source"))
    val counts = TextIndex.groupCounts(spark, idx).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // live membership: fruit = docs 3 (2 tokens) + 4 (2); veg = doc 1 (3)
    assert(counts === Map("fruit" -> (2L, 4L), "veg" -> (1L, 3L)),
      s"grouped stats must mirror the corpus end state hands-off: $counts")
    // the scoring face mirrors the end state too
    val q = Seq((1L, "banana"), (2L, "carrot"), (3L, "grape"))
      .toDF("query_id", "qtext")
    val got = TextIndex.probe(spark, idx, q, k = 10)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 4L), (3L, 1L)), s"got $got")
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
