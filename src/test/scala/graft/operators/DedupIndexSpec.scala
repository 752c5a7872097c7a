package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.CommitLog

/** Table-backed standing dedup index: results must be BIT-IDENTICAL to the
  * recompute-everything formulation ([[Dedup.dedupAgainst]]), and the index
  * must be REUSED across batches (appends only — never a corpus rescan or
  * rebuild).
  */
class DedupIndexSpec extends SparkTestBase {

  private def docs = spark.read.parquet(sf("documents")).select("doc_id", "source", "text")

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("probe + append hash-match the recompute semantics across two batches") {
    val dir = tmpDir("dedup-index")
    val idx = s"$dir/idx"
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch1 = docs.filter(col("doc_id") % 10 === 0)
    val batch2 = docs.filter(col("doc_id") % 10 === 5)

    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")
    val commitsAfterBoot = CommitLog.commits(spark, idx)
    assert(commitsAfterBoot.map(_.operation) === Seq("bootstrap"))

    // batch 1: survivors must equal the recompute screen against the corpus
    val s1 = DedupIndex.dedupAndAppend(spark, idx, batch1, "doc_id", "text")
    val expect1 = Dedup.dedupAgainst(corpus, batch1, "doc_id", "text")
    assert(ids(s1) === ids(expect1))
    assert(ids(s1).nonEmpty && ids(s1) != ids(batch1)) // the screen dropped something

    // batch 2: the index GREW by batch 1's survivors, so the recompute
    // baseline is corpus ∪ survivors1 — the incremental contract
    val s2 = DedupIndex.dedupAndAppend(spark, idx, batch2, "doc_id", "text")
    val expect2 = Dedup.dedupAgainst(corpus.unionByName(s1), batch2, "doc_id", "text")
    assert(ids(s2) === ids(expect2))

    // reuse, not rebuild: exactly one delta append per batch after the one
    // bootstrap; nothing rewrote the corpus entries. compact.auto (on by
    // default for standing indexes) may FOLD deltas after either append —
    // folding rewrites files, never logical state, so it is filtered here
    val ops = CommitLog.commits(spark, idx).map(_.operation)
    assert(ops.filterNot(_ == "compact") ===
      Seq("bootstrap", "delta_commit", "delta_commit"))
    // the index now holds corpus + survivors of both batches, keyed by id
    val n = graft.table.KeyedTable.read(spark, idx).count()
    assert(n === corpus.count() + ids(s1).size + ids(s2).size)
  }

  test("dedupAndAppend is replay-idempotent: a re-screened batch reproduces its survivors") {
    val dir = tmpDir("dedup-index-replay")
    val idx = s"$dir/idx"
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")
    val s1 = DedupIndex.dedupAndAppend(spark, idx, batch, "doc_id", "text")
    val n = graft.table.KeyedTable.read(spark, idx).count()
    // the at-least-once replay: the SAME batch again — every previous
    // survivor now sits in the index under its own id, but SELF-matches
    // are excluded from the screen, so the replay reproduces the SAME
    // survivor set (a doc never screens itself out) and the index does
    // not grow (the upsert re-lands the same keyed entries)
    val replay = DedupIndex.dedupAndAppend(spark, idx, batch, "doc_id", "text")
    assert(ids(replay) === ids(s1))
    assert(graft.table.KeyedTable.read(spark, idx).count() === n)
    assert(ids(s1).nonEmpty)
  }

  test("replay keeps WITHIN-batch near-duplicates: the probe excludes every batch id, " +
      "not just self-pairs") {
    import spark.implicits._
    val dir = tmpDir("dedup-index-within")
    val idx = s"$dir/idx"
    val corpus = Seq((1L,
      "rivers carve stones beneath quiet mountains while herons wade the shallows at dawn"))
      .toDF("doc_id", "text")
    // B1/B2: mutually near-identical, absent from the corpus — the gate
    // screens batch-vs-corpus, so BOTH survive run 1 by contract
    val t = (1 to 30).map(i => s"tok$i").mkString(" ")
    val batch = Seq((101L, t), (102L, t + " extra")).toDF("doc_id", "text")
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")
    val s1 = DedupIndex.dedupAndAppend(spark, idx, batch, "doc_id", "text")
    assert(ids(s1) === Set(101L, 102L))
    // at-least-once replay AFTER the append: both ids now sit in the index;
    // with only a_id =!= b_id exclusion, B1's index entry would screen B2
    // out and vice versa — the batch-id exclusion reproduces run 1 exactly
    val replay = DedupIndex.dedupAndAppend(spark, idx, batch, "doc_id", "text")
    assert(ids(replay) === Set(101L, 102L))
    // and the ingestBatch face converges to the same survivor directory
    val out = s"$dir/survivors"
    DedupIndex.ingestBatch(batch, 3L, idx, "doc_id", "text", Some(out))
    assert(ids(spark.read.parquet(s"$out/batch=3")) === Set(101L, 102L))
  }

  test("ingest replay converges from a crash in EITHER window of the batch body") {
    val dir = tmpDir("dedup-index-crash")
    val idx = s"$dir/idx"
    val out = s"$dir/survivors"
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0).toDF()
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")
    val expect = Dedup.dedupAgainst(corpus, batch, "doc_id", "text")
    val corpusN = corpus.count()

    // crash A — BETWEEN the survivors write and the index append: the
    // batch directory is published but the index never grew
    DedupIndex.ingestBatch(batch, 7L, idx, "doc_id", "text", Some(out),
      skipIndexAppend = true)
    assert(ids(spark.read.parquet(s"$out/batch=7")) === ids(expect))
    assert(graft.table.KeyedTable.read(spark, idx).count() === corpusN)
    // the checkpoint replays the batch: identical directory contents, and
    // the pending index append lands
    DedupIndex.ingestBatch(batch, 7L, idx, "doc_id", "text", Some(out))
    assert(ids(spark.read.parquet(s"$out/batch=7")) === ids(expect))
    assert(graft.table.KeyedTable.read(spark, idx).count() === corpusN + ids(expect).size)

    // crash B — AFTER the index append, before the checkpoint commit: the
    // full replay must NOT overwrite the published survivors with zero
    // rows (self-matches are excluded from the screen)
    DedupIndex.ingestBatch(batch, 7L, idx, "doc_id", "text", Some(out))
    assert(ids(spark.read.parquet(s"$out/batch=7")) === ids(expect))
    assert(graft.table.KeyedTable.read(spark, idx).count() === corpusN + ids(expect).size)
  }

  test("streaming ingest gate: chained micro-batches screen against the growing index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val dir = tmpDir("dedup-index-stream")
    val idx = s"$dir/idx"
    val out = s"$dir/survivors"
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val b1 = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect().toSeq
    val b2 = docs.filter(col("doc_id") % 10 === 5)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect().toSeq
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")

    val stream = MemoryStream[(Long, String, String)]
    val q = DedupIndex.ingestStream(
      stream.toDF().toDF("doc_id", "source", "text"), idx, tmpDir("dedup-ckpt"),
      "doc_id", "text", survivorsPath = Some(out))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // end state identical to the two explicit dedupAndAppend calls (pinned
    // by the first test + the x53 oracle): recompute the expectation
    val s1 = Dedup.dedupAgainst(corpus, docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text")
    val s2 = Dedup.dedupAgainst(corpus.unionByName(s1),
      docs.filter(col("doc_id") % 10 === 5), "doc_id", "text")
    val survivors = spark.read.parquet(out)
    assert(ids(survivors) === (ids(s1) ++ ids(s2)))
    assert(graft.table.KeyedTable.read(spark, idx).count() ===
      corpus.count() + ids(s1).size + ids(s2).size)
  }

  test("fixture guard: two-sided band collisions reach EVERY true >=0.5 cross pair " +
      "(x23/x53's oracles recompute exhaustively; this pins the engine's LSH recall at 1.0 " +
      "on the fixture so a fixture regeneration that breaks the coupling fails HERE, " +
      "not as an inscrutable oracle hash mismatch)") {
    import org.apache.spark.sql.functions.split
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def sh(df: DataFrame, as: String) = df.select(col("doc_id").as(as),
      Dedup.shingles(split(col("text"), "\\s+"), 3).as(s"sh_$as"))
    // exhaustive truth: every cross pair at Jaccard >= 0.5 (sf0.001 is small
    // enough for the quadratic join to be cheap)
    val truth = sh(corpus, "a_id").crossJoin(sh(batch, "b_id"))
      .filter(Dedup.jaccard(col("sh_a_id"), col("sh_b_id")) >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDupsAgainst(corpus, batch, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture lost its planted cross dups — regenerate expectations")
    assert(lsh === truth)

    // the x68 takedown shape: corpus minus the %10=3 removals, probed by the
    // %10=0 delivery ∪ the removed docs' content (identical shingles under
    // shifted ids, so the original ids stand in for them here)
    val corpus68 = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 10 =!= 3)
    val batch68 = docs.filter(col("doc_id") % 10 === 0 || col("doc_id") % 10 === 3)
    val truth68 = sh(corpus68, "a_id").crossJoin(sh(batch68, "b_id"))
      .filter(Dedup.jaccard(col("sh_a_id"), col("sh_b_id")) >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh68 = Dedup.minhashNearDupsAgainst(corpus68, batch68, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh68 === truth68)

    // the x69 sync shape: corpus end state = (%5!=0 minus %10=3) plus the
    // inserted %10=0 docs, probed by the %10=5 delivery ∪ the deleted
    // docs' content (original ids stand in for the shifted re-sends)
    val corpus69 = docs.filter(
      (col("doc_id") % 5 =!= 0 && col("doc_id") % 10 =!= 3) || col("doc_id") % 10 === 0)
    val batch69 = docs.filter(col("doc_id") % 10 === 5 || col("doc_id") % 10 === 3)
    val truth69 = sh(corpus69, "a_id").crossJoin(sh(batch69, "b_id"))
      .filter(Dedup.jaccard(col("sh_a_id"), col("sh_b_id")) >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh69 = Dedup.minhashNearDupsAgainst(corpus69, batch69, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh69 === truth69)

    // the x70 auto-sync shape (x69's residues shifted): corpus end state =
    // (%5!=1 minus %10=4) plus the inserted %10=1 docs, probed by the
    // %10=6 delivery ∪ the deleted docs' content (original ids stand in)
    val corpus70 = docs.filter(
      (col("doc_id") % 5 =!= 1 && col("doc_id") % 10 =!= 4) || col("doc_id") % 10 === 1)
    val batch70 = docs.filter(col("doc_id") % 10 === 6 || col("doc_id") % 10 === 4)
    val truth70 = sh(corpus70, "a_id").crossJoin(sh(batch70, "b_id"))
      .filter(Dedup.jaccard(col("sh_a_id"), col("sh_b_id")) >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh70 = Dedup.minhashNearDupsAgainst(corpus70, batch70, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh70 === truth70)
  }

  test("remove: a taken-down doc's ghost no longer screens re-sent content, " +
      "its entry leaves live reads, and asOf pre-removal still has it") {
    import spark.implicits._
    val dir = tmpDir("dedup-index-remove")
    val idx = s"$dir/idx"
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, "web", textA), (2L, "web", textB))
      .toDF("doc_id", "source", "text")
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")
    val tip0 = CommitLog.commits(spark, idx).last.commitTime

    // today doc 1's entry screens a verbatim re-send of its content
    val resend = Seq((101L, "web", textA)).toDF("doc_id", "source", "text")
    assert(DedupIndex.probe(spark, idx, resend, "doc_id", "text").count() === 1)

    // takedown: one tombstone delta; doc 1 leaves live reads but not history
    DedupIndex.remove(spark, idx, Seq(1L).toDF("doc_id"), "doc_id")
    assert(CommitLog.commits(spark, idx).map(_.operation)
      .filterNot(_ == "compact") === Seq("bootstrap", "delete"))
    assert(ids(graft.table.KeyedTable.read(spark, idx)) === Set(2L))
    assert(ids(graft.table.KeyedTable.readAsOf(spark, idx, tip0)) === Set(1L, 2L),
      "asOf before the takedown must still reproduce the old screening state")

    // the ghost is gone: the SAME content re-sent after the takedown is
    // NOVEL — it probes clean, survives the gate, and (re)enters the index
    assert(DedupIndex.probe(spark, idx, resend, "doc_id", "text").isEmpty)
    val survivors = DedupIndex.dedupAndAppend(spark, idx, resend, "doc_id", "text")
    assert(ids(survivors) === Set(101L))
    assert(ids(graft.table.KeyedTable.read(spark, idx)) === Set(2L, 101L))
    // and the re-entered content screens the NEXT delivery again
    val next = Seq((202L, "web", textA + " tail")).toDF("doc_id", "source", "text")
    assert(DedupIndex.dedupAndAppend(spark, idx, next, "doc_id", "text").isEmpty)
  }

  test("rebuild re-parameterizes in place as ONE commit; rebuildTo + cutover " +
      "stage the same change with the old index serving until the swap; " +
      "history stays asOf-able at the live path") {
    import spark.implicits._
    import graft.table.{KeyedTable, TableProperties}
    val dir = tmpDir("dedup-rebuild")
    val idx = s"$dir/idx"
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text",
      shingleN = 3, numHashes = 16)
    assert(TableProperties.get(spark, idx).get(DedupIndex.ShingleNProp)
      === Some("3"))
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    val sigLen0 = KeyedTable.read(spark, idx)
      .select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .head().getInt(0)
    assert(sigLen0 === 16)

    // corpus moved on: doc 2 gone, doc 3 new — rebuild under (4, 32) must
    // land new-parameter images AND retire doc 2, as one commit
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val corpus2 = Seq((1L, textA), (3L, textC)).toDF("doc_id", "text")
    // compact.auto (birth default) may fold the delta afterwards — a file
    // rewrite, never a logical change — so count non-compact commits
    val commits0 = CommitLog.commits(spark, idx).count(_.operation != "compact")
    DedupIndex.rebuild(spark, idx, corpus2, "doc_id", "text",
      shingleN = 4, numHashes = 32)
    assert(CommitLog.commits(spark, idx).count(_.operation != "compact")
      === commits0 + 1, "not ONE commit")
    val t = KeyedTable.read(spark, idx)
    assert(t.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(t.select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .collect().forall(_.getInt(0) === 32), "entries not under the new numHashes")
    assert(TableProperties.get(spark, idx).get(DedupIndex.NumHashesProp)
      === Some("32"))
    // the new parameters screen: doc 3's content probed under (4, 32) dups
    assert(DedupIndex.probe(spark, idx, Seq((103L, textC)).toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 4, numHashes = 32).count() === 1)
    // history: asOf before the rebuild still answers under the OLD model
    assert(KeyedTable.readAsOf(spark, idx, tip0)
      .select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .collect().forall(_.getInt(0) === 16))

    // staged flow: rebuildTo a fresh staging index under (5, 8) while the
    // live one keeps screening under (4, 32) — in-flight batches see OLD
    val staging = s"$dir/staging"
    DedupIndex.rebuildTo(spark, staging, corpus2, "doc_id", "text",
      shingleN = 5, numHashes = 8)
    assert(KeyedTable.read(spark, idx)
      .select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .head().getInt(0) === 32, "live index changed before cutover")
    val tip1 = CommitLog.commits(spark, idx).last.commitTime
    DedupIndex.cutover(spark, idx, staging)
    val after = KeyedTable.read(spark, idx)
    assert(after.select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .collect().forall(_.getInt(0) === 8), "cutover did not swap the entries")
    assert(TableProperties.get(spark, idx).get(DedupIndex.NumHashesProp)
      === Some("8"), "cutover did not carry the parameter stamps")
    // the next batch screens under the NEW parameters at the LIVE path
    assert(DedupIndex.probe(spark, idx, Seq((104L, textA)).toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 5, numHashes = 8).count() === 1)
    // pre-cutover history still asOf-able at the live path
    assert(KeyedTable.readAsOf(spark, idx, tip1)
      .select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .collect().forall(_.getInt(0) === 32))
    // key-mismatch cutover refuses
    val other = s"$dir/other"
    DedupIndex.bootstrap(spark, other,
      Seq((9L, textA)).toDF("other_id", "text"), "other_id", "text")
    val e = intercept[IllegalArgumentException] {
      DedupIndex.cutover(spark, idx, other)
    }
    assert(e.getMessage.contains("key mismatch"))

    // an UNSTAMPED staging index (pre-stamp binary) must not leave the live
    // table's old stamps standing over the new-parameter entries — the
    // registry sync reads stamps first, and stale ones would append
    // old-parameter entries into the cut-over index forever
    val unstamped = s"$dir/unstamped"
    DedupIndex.rebuildTo(spark, unstamped, corpus2, "doc_id", "text",
      shingleN = 2, numHashes = 4)
    TableProperties.unset(spark, unstamped,
      Seq(DedupIndex.ShingleNProp, DedupIndex.NumHashesProp))
    DedupIndex.cutover(spark, idx, unstamped)
    val props = TableProperties.get(spark, idx)
    assert(!props.contains(DedupIndex.ShingleNProp) &&
      !props.contains(DedupIndex.NumHashesProp),
      "cutover from an unstamped staging index left stale stamps standing")
    assert(KeyedTable.read(spark, idx)
      .select(org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)))
      .collect().forall(_.getInt(0) === 4), "entries did not swap")
  }

  test("an all-duplicate batch appends nothing and the index stays unchanged") {
    val dir = tmpDir("dedup-index-nop")
    val idx = s"$dir/idx"
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    DedupIndex.bootstrap(spark, idx, corpus, "doc_id", "text")
    // verbatim copies of corpus docs under shifted ids: every one must drop
    val copies = corpus.select((col("doc_id") + 500000).as("doc_id"),
      col("source"), col("text"))
    val survivors = DedupIndex.dedupAndAppend(spark, idx, copies, "doc_id", "text")
    assert(survivors.isEmpty)
    assert(CommitLog.commits(spark, idx).map(_.operation) === Seq("bootstrap"))
  }
}
