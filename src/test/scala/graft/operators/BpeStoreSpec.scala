package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.CommitLog

/** Versioned tokenizer state: each training run is one commit on a keyed
  * graft table, older runs stay loadable via asOf, and the stored state
  * drives x52's token-budget counter hook.
  */
class BpeStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def trainOn(corpus: Seq[String], k: Int) = {
    val words = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", Bpe.charSyms(col("word")))
    Bpe.train(vocab, k)
  }

  test("two training runs land as two commits; asOf loads each state") {
    val tbl = s"${tmpDir("bpe-store")}/tok"
    val (m1, v1) = trainOn(Seq("aaab aaab abab", "aaab abab abab"), k = 2)
    assert(BpeStore.save(spark, tbl, m1, v1) === 1L)
    val afterRun1 = CommitLog.requireState(spark, tbl).latest.commitTime

    val (m2, v2) = trainOn(Seq("xyxy xyxy zz", "xyxy zz zz zz"), k = 3)
    assert(BpeStore.save(spark, tbl, m2, v2) === 2L)

    // the live tip serves run 2, byte-identical merge table
    val tip = BpeStore.load(spark, tbl)
    assert(tip.run === 2L)
    assert(tip.merges === m2)
    // time travel serves run 1 exactly as trained
    val old = BpeStore.load(spark, tbl, asOf = Some(afterRun1))
    assert(old.run === 1L)
    assert(old.merges === m1)
    // the stored vocab round-trips: counting under the loaded segmentation
    // equals counting under the in-memory training output
    val words = Seq((7L, "aaab abab zz")).toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
    def counts(v: org.apache.spark.sql.DataFrame, m: Seq[Bpe.Merge]) =
      Bpe.tokenCounts(words, v, m).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(counts(old.vocab, old.merges) === counts(v1, m1))
    // runs are one commit each on the shared table
    assert(CommitLog.commits(spark, tbl).map(_.operation) === Seq("bootstrap", "bulk_insert"))
  }

  test("tokenizer hot-swap: a CDC stream on the store reloads the newest run per commit") {
    val tbl = s"${tmpDir("bpe-hot")}/tok"
    val (m1, v1) = trainOn(Seq("aa aa ab"), k = 1)
    BpeStore.save(spark, tbl, m1, v1)
    // the long-running-scorer pattern: hold the current tokenizer in a
    // reference, tail the store's CDC feed, reload on every commit
    val current = new java.util.concurrent.atomic.AtomicReference(BpeStore.load(spark, tbl))
    val q = spark.readStream.format("graft").load(tbl)
      .writeStream.option("checkpointLocation", tmpDir("bpe-hot-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (df.limit(1).count() > 0) current.set(BpeStore.load(spark, tbl)); ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(current.get().run === 1L)

      val (m2, v2) = trainOn(Seq("zz zz zy zy zy"), k = 2)
      BpeStore.save(spark, tbl, m2, v2)
      q.processAllAvailable()
      assert(current.get().run === 2L)
      assert(current.get().merges === m2)
      // the swapped state drives the counter hook immediately: run 2
      // learned (z,y)→zy, so each 'zy' is ONE token
      val n = Seq((1L, "zy zy")).toDF("doc_id", "text")
        .select(Bpe.counterOf(current.get().merges)(col("text"))).head().getLong(0)
      assert(n === 2L)
    } finally q.stop()
  }

  test("the stored tokenizer drives tokenBudgetSelect through the counter hook") {
    val tbl = s"${tmpDir("bpe-store-hook")}/tok"
    val corpus = Seq("aaaa aaaa bbbb", "aaaa bbbb bbbb", "cccc aaaa")
    val (m, v) = trainOn(corpus, k = 3)
    BpeStore.save(spark, tbl, m, v)
    val st = BpeStore.load(spark, tbl)

    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the hook counter (on-the-fly segmentation under the STORED merges)
    // must agree with the vocab-join counter for in-vocabulary text —
    // greedy training applies merges in the same rank order segment() does
    val viaHook = docs.select(col("doc_id"),
        Bpe.counterOf(st.merges)(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val words = docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
    val viaJoin = Bpe.tokenCounts(words, st.vocab, st.merges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaHook === viaJoin)

    // budget selection under the stored tokenizer: the budget is counted in
    // REAL tokens, so the selected docs' hook counts sum within it
    val sel = Curation.tokenBudgetSelect(
      docs, col("doc_id"), col("text"), budget = 6L, Bpe.counterOf(st.merges))
    val picked = sel.select("doc_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(picked.nonEmpty)
    assert(picked.map(_._2).sum <= 6L)
    picked.foreach { case (id, n) => assert(viaHook(id) === n) }
  }
}
