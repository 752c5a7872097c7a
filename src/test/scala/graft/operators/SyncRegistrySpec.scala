package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{GraftException, TableType}
import graft.streaming.ChangeStream
import graft.table.{CommitLog, KeyedTable, MaintenanceLog, TableProperties}

/** The hands-off face of derived-index consistency: registered indexes must
  * follow corpus publishes with NO explicit sync call, one shared
  * checkpoint must feed them all atomically, a mispointed checkpoint must
  * fail loudly, registration must catch an older-basis index up, and
  * unregistering must stop the follow.
  */
class SyncRegistrySpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("embeddings"))

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")

  test("one corpus publish propagates to a registered dedup AND ann index " +
      "hands-off; the journal records the interval; unregister stops the follow") {
    val dir = tmpDir("sync-reg")
    val corpusTbl = s"$dir/corpus"
    val dedupIdx = s"$dir/dedup"
    val annIdx = s"$dir/ann"
    // corpus carries text AND an embedding per doc so both index kinds hang
    // off the same table — the realistic multi-index shape
    val docs = emb.filter(col("vec_id") >= 25)
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .withColumn("text", concat_ws(" ",
        (1 to 30).map(i => concat(lit(s"w$i-"), col("doc_id"))): _*))
    KeyedTable.create(spark, corpusTbl, docs,
      tableName = "reg_corpus", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, dedupIdx,
      KeyedTable.read(spark, corpusTbl), "doc_id", "text")
    AnnIndex.build(spark, annIdx, KeyedTable.read(spark, corpusTbl),
      nlist = 8, iters = 1, idCol = "doc_id", vecCol = "embedding")
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    SyncRegistry.register(spark, corpusTbl, "dedup",
      SyncRegistry.DedupSpec(dedupIdx, "doc_id", "text"), basis = Some(tip0))
    SyncRegistry.register(spark, corpusTbl, "ann",
      SyncRegistry.AnnSpec(annIdx, "doc_id", "embedding"), basis = Some(tip0))
    assert(SyncRegistry.registered(spark, corpusTbl).map(_._1) === Seq("ann", "dedup"))

    // ONE delete publish + ONE upsert publish on the corpus — no sync call
    KeyedTable.delete(spark, corpusTbl, Seq(30L, 31L).toDF("doc_id"))
    val inserted = emb.filter(col("vec_id").isin(10L, 11L))
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .withColumn("text", lit(textC))
    KeyedTable.upsert(spark, corpusTbl, inserted)

    // dedup index followed: members = corpus end state
    assert(ids(KeyedTable.read(spark, dedupIdx)) ===
      ids(KeyedTable.read(spark, corpusTbl)))
    // removed content (docs 30/31's unique text) re-sent is NOVEL — the
    // takedown reached the derived minhash state with nobody syncing
    val removedText = docs.filter(col("doc_id") === 30L)
      .select((col("doc_id") + 900).as("doc_id"), col("text"))
    assert(DedupIndex.probe(spark, dedupIdx, removedText,
      "doc_id", "text").isEmpty, "ghost entry still screening after takedown")
    // inserted content screens its dup
    assert(DedupIndex.probe(spark, dedupIdx,
      KeyedTable.read(spark, corpusTbl).filter(col("doc_id") === 10L)
        .select(col("doc_id") + 900, col("text").as("text"))
        .toDF("doc_id", "text"),
      "doc_id", "text").count() >= 1)
    // ann index followed: deletes unreachable, inserts searchable
    val served = AnnIndex.probe(spark, annIdx,
      emb.filter(col("vec_id") < 1), k = 100000, nprobe = 8,
      idCol = "vec_id", vecCol = "embedding")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(Set(10L, 11L).subsetOf(served), "synced inserts must be searchable")
    assert(served.intersect(Set(30L, 31L)).isEmpty, "synced deletes still probed")

    // journal: the hook recorded the applied interval over both indexes
    val entry = MaintenanceLog.read(spark, corpusTbl).find(_.service == "index.sync")
    assert(entry.exists(_.outcome == "ok"), s"journal: $entry")
    assert(entry.exists(_.detail.contains("indexes=[ann,dedup]")), s"journal: $entry")

    // unregister the ann index: the next publish reaches only dedup
    SyncRegistry.unregister(spark, corpusTbl, "ann")
    KeyedTable.delete(spark, corpusTbl, Seq(35L).toDF("doc_id"))
    assert(!ids(KeyedTable.read(spark, dedupIdx)).contains(35L))
    assert(AnnIndex.probe(spark, annIdx, emb.filter(col("vec_id") < 1),
      k = 100000, nprobe = 8, idCol = "vec_id", vecCol = "embedding")
      .filter(col("vec_id") === 35L).count() === 1,
      "an unregistered index must stop following")
  }

  test("a reshaping pq retrain does not strand the sync: post-retrain corpus " +
      "publishes encode appends under the STORED geometry, not the " +
      "registration-time one") {
    val dir = tmpDir("sync-reg-pq-retrain")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/pq"
    KeyedTable.create(spark, corpusTbl,
      emb.filter(col("vec_id") >= 25).select("vec_id", "embedding"),
      tableName = "reg_pq", keyFields = Seq("vec_id"),
      precombineField = "vec_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    PqIndex.build(spark, idx, KeyedTable.read(spark, corpusTbl),
      dim = 64, m = 16, iters = 1, nlist = 4)
    SyncRegistry.register(spark, corpusTbl, "pq",
      SyncRegistry.PqSpec(idx, "vec_id", "embedding"),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    // reshape: m 16 → 8 (one merge commit; the registry spec is untouched)
    PqIndex.retrain(spark, idx, dim = 64, m = 8, codebookSize = 16, iters = 1)
    // the next corpus publish must encode the appended ids under m = 8 —
    // a configured-geometry sync would write 16 phantom subspace codes
    KeyedTable.upsert(spark, corpusTbl,
      emb.filter(col("vec_id").isin(5L, 6L)).select("vec_id", "embedding"))
    val codes = KeyedTable.read(spark, idx)
      .filter(col(PqIndex.KindCol) === PqIndex.CodeKind && col("id").isin(5L, 6L))
    assert(codes.count() === 2 * 8, "appends not under the retrained m")
    assert(codes.select("s").distinct().count() === 8)
    // and the synced entries actually serve
    val served = PqIndex.probe(spark, idx, emb.filter(col("vec_id") < 1),
      k = 100000, dim = 64, m = 8, shortlist = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(Set(5L, 6L).subsetOf(served))
  }

  test("a library-level dedup rebuild does not strand the sync: post-rebuild " +
      "publishes append under the index's STAMPED parameters, not the " +
      "registration-time ones") {
    val dir = tmpDir("sync-reg-dedup-rebuild")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      tableName = "reg_dd_rebuild", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text", shingleN = 3, numHashes = 16)
    SyncRegistry.register(spark, corpusTbl, "d",
      SyncRegistry.DedupSpec(idx, "doc_id", "text", shingleN = 3, numHashes = 16),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    // library rebuild under (4, 32) — nobody touches the registry spec
    DedupIndex.rebuild(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text", shingleN = 4, numHashes = 32)
    // the next corpus publish must append under the STAMPED (4, 32) — a
    // spec-parameter sync would write 16-hash signatures that never collide
    // with the rebuilt 32-hash entries
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))
    val sigLens = KeyedTable.read(spark, idx)
      .select(col("doc_id"), org.apache.spark.sql.functions.size(col(DedupIndex.SigCol)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sigLens === Map(1L -> 32, 2L -> 32, 3L -> 32), s"got $sigLens")
    // and the synced entry screens under the new parameters
    assert(DedupIndex.probe(spark, idx,
      Seq((903L, textC)).toDF("doc_id", "text"), "doc_id", "text",
      shingleN = 4, numHashes = 32).count() === 1)
  }

  test("replay converges: re-delivering an applied interval through a fresh " +
      "checkpoint leaves the registered index's logical state unchanged") {
    val dir = tmpDir("sync-reg-replay")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      tableName = "reg_replay", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    SyncRegistry.register(spark, corpusTbl, "d",
      SyncRegistry.DedupSpec(idx, "doc_id", "text"), basis = Some(tip0))
    KeyedTable.delete(spark, corpusTbl, Seq(1L).toDF("doc_id"))
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))
    assert(ids(KeyedTable.read(spark, idx)) === Set(2L, 3L))
    def dataState() = KeyedTable.read(spark, idx)
      .select("doc_id", DedupIndex.SigCol, DedupIndex.ShCol)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val before = dataState()
    // a crash between apply and watermark re-delivers: simulate with a
    // fresh-checkpoint explicit sync over the SAME interval
    assert(IndexSync.syncDedup(spark, corpusTbl, idx, s"$dir/ckpt2",
      "doc_id", "text", startAt = Some(tip0)).nonEmpty)
    assert(dataState() === before, "replaying the interval diverged the index")
  }

  test("registering with an older basis catches the index up over (basis, tip] " +
      "even when the shared watermark has already advanced") {
    val dir = tmpDir("sync-reg-basis")
    val corpusTbl = s"$dir/corpus"
    val idxA = s"$dir/a"
    val idxB = s"$dir/b"
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      tableName = "reg_basis", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idxA, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    SyncRegistry.register(spark, corpusTbl, "a",
      SyncRegistry.DedupSpec(idxA, "doc_id", "text"), basis = Some(tip0))
    // index B is built from THIS snapshot, then the corpus moves on while
    // B is still outside the registry — the watermark advances past B's basis
    DedupIndex.bootstrap(spark, idxB, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    val basisB = CommitLog.commits(spark, corpusTbl).last.commitTime
    KeyedTable.delete(spark, corpusTbl, Seq(1L).toDF("doc_id"))
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))
    assert(ids(KeyedTable.read(spark, idxA)) === Set(2L, 3L))
    assert(ids(KeyedTable.read(spark, idxB)) === Set(1L, 2L), "B lagging pre-register")
    // late registration with the build basis: catch-up closes the gap NOW
    SyncRegistry.register(spark, corpusTbl, "b",
      SyncRegistry.DedupSpec(idxB, "doc_id", "text"), basis = Some(basisB))
    assert(ids(KeyedTable.read(spark, idxB)) === Set(2L, 3L),
      "register(basis) must catch the index up")
    // and from here both follow ordinary publishes together
    KeyedTable.delete(spark, corpusTbl, Seq(2L).toDF("doc_id"))
    assert(ids(KeyedTable.read(spark, idxA)) === Set(3L))
    assert(ids(KeyedTable.read(spark, idxB)) === Set(3L))
  }

  test("a mispointed checkpoint fails loudly: the registry's shared checkpoint " +
      "refuses a different consumer, and an explicit sync refuses a checkpoint " +
      "stamped to another index/params") {
    val dir = tmpDir("sync-reg-identity")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA)).toDF("doc_id", "text"),
      tableName = "reg_ident", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    SyncRegistry.register(spark, corpusTbl, "d",
      SyncRegistry.DedupSpec(idx, "doc_id", "text"), basis = Some(tip0))
    // pointing an EXPLICIT per-index sync at the registry's checkpoint: the
    // stored identity is the registry's, not this consumer's
    val e1 = intercept[GraftException] {
      IndexSync.syncDedup(spark, corpusTbl, idx,
        SyncRegistry.checkpointDir(corpusTbl), "doc_id", "text")
    }
    assert(e1.getMessage.contains("belongs to"), e1.getMessage)
    // same explicit consumer, then the SAME checkpoint under different
    // params: partial-feed misuse, refused
    IndexSync.syncDedup(spark, corpusTbl, idx, s"$dir/ckpt",
      "doc_id", "text", startAt = Some(tip0))
    val e2 = intercept[GraftException] {
      IndexSync.syncDedup(spark, corpusTbl, idx, s"$dir/ckpt",
        "doc_id", "text", numHashes = 32)
    }
    assert(e2.getMessage.contains("belongs to"), e2.getMessage)
    // pre-stamp checkpoints ADOPT: a bare ChangeStream checkpoint written
    // before identities existed keeps working once a stamped pull touches it
    ChangeStream.pull(spark, corpusTbl, s"$dir/old-ckpt") { (_, _) => () }
    assert(ChangeStream.pull(spark, corpusTbl, s"$dir/old-ckpt",
      identity = Some("adopting consumer")) { (_, _) => () }.isEmpty)
    val e3 = intercept[GraftException] {
      ChangeStream.pull(spark, corpusTbl, s"$dir/old-ckpt",
        identity = Some("someone else")) { (_, _) => () }
    }
    assert(e3.getMessage.contains("belongs to"), e3.getMessage)
  }

  test("randomized convergence: any seeded interleaving of corpus upserts, " +
      "re-words, and deletes leaves the registered index data-identical to " +
      "a fresh bootstrap of the corpus end state") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir("sync-reg-random")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    def text(id: Long, v: Int) =
      (1 to 30).map(i => s"t$id-$v-$i").mkString(" ")
    KeyedTable.create(spark, corpusTbl,
      (1L to 8L).map(i => (i, text(i, 0))).toDF("doc_id", "text"),
      tableName = "reg_random", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    SyncRegistry.register(spark, corpusTbl, "d",
      SyncRegistry.DedupSpec(idx, "doc_id", "text"),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    for (step <- 1 to 10) {
      val present = ids(KeyedTable.read(spark, corpusTbl)).toSeq.sorted
      rnd.nextInt(3) match {
        case 0 => // insert/re-word 1-3 docs (ids 1..12, possibly existing)
          val picks = Seq.fill(1 + rnd.nextInt(3))(1L + rnd.nextInt(12))
            .distinct.map(i => (i, text(i, step)))
          KeyedTable.upsert(spark, corpusTbl, picks.toDF("doc_id", "text"))
        case 1 if present.nonEmpty => // delete 1-2 present docs
          val picks = Seq.fill(1 + rnd.nextInt(2))(
            present(rnd.nextInt(present.size))).distinct
          KeyedTable.delete(spark, corpusTbl, picks.toDF("doc_id"))
        case _ => // delete-then-reinsert inside separate publishes
          if (present.nonEmpty) {
            val p = present(rnd.nextInt(present.size))
            KeyedTable.delete(spark, corpusTbl, Seq(p).toDF("doc_id"))
            KeyedTable.upsert(spark, corpusTbl,
              Seq((p, text(p, step))).toDF("doc_id", "text"))
          }
      }
    }
    // the hook propagated every interval; entries are deterministic
    // functions of the corpus text, so index state must equal a FRESH
    // bootstrap of the end state, row for row
    def entries(path: String) = KeyedTable.read(spark, path)
      .select("doc_id", DedupIndex.SigCol, DedupIndex.ShCol)
      .collect().map(_.toString).toSet
    val fresh = s"$dir/fresh"
    DedupIndex.bootstrap(spark, fresh, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    assert(entries(idx) === entries(fresh),
      "registered index diverged from the corpus end state")
  }

  test("registry hygiene: self-registration refuses, unknown spec JSON fails " +
      "loudly, and a corpus with no registry pays one property read only") {
    val dir = tmpDir("sync-reg-hygiene")
    val corpusTbl = s"$dir/corpus"
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA)).toDF("doc_id", "text"),
      tableName = "reg_hyg", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    intercept[IllegalArgumentException] {
      SyncRegistry.register(spark, corpusTbl, "self",
        SyncRegistry.DedupSpec(corpusTbl, "doc_id", "text"))
    }
    TableProperties.set(spark, corpusTbl,
      Map(TableProperties.IndexSyncPrefix + "bad" -> """{"kind":"what"}"""))
    val e = intercept[GraftException] { SyncRegistry.registered(spark, corpusTbl) }
    assert(e.getMessage.contains("unknown index kind"), e.getMessage)
    TableProperties.unset(spark, corpusTbl,
      Seq(TableProperties.IndexSyncPrefix + "bad"))
    // no registry: publishes stay publishes (no checkpoint ever appears)
    KeyedTable.upsert(spark, corpusTbl, Seq((2L, textB)).toDF("doc_id", "text"))
    val fs = CommitLog.fs(spark, corpusTbl)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      SyncRegistry.checkpointDir(corpusTbl))))

    // a FAILED catch-up must not leave a registered-but-gapped index: the
    // skipped (basis, watermark] interval would stay silently missing from
    // that index forever (later syncs apply only NEW intervals)
    val idx2 = s"$dir/idx2"
    DedupIndex.bootstrap(spark, idx2,
      KeyedTable.read(spark, corpusTbl), "doc_id", "text")
    val basis0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))
    val e2 = intercept[Exception] {
      SyncRegistry.register(spark, corpusTbl, "gapped",
        SyncRegistry.DedupSpec(idx2, "doc_id", "no_such_column"),
        basis = Some(basis0))
    }
    assert(e2 != null)
    assert(SyncRegistry.registered(spark, corpusTbl).isEmpty,
      "a failed catch-up left a gapped registration behind")
  }

  test("a failed RE-register restores the prior working registration instead " +
      "of unregistering the name: the old index keeps following publishes") {
    val dir = tmpDir("sync-reg-restore")
    val corpusTbl = s"$dir/corpus"
    val idx = s"$dir/idx"
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      tableName = "reg_restore", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    DedupIndex.bootstrap(spark, idx, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    val tip0 = CommitLog.commits(spark, corpusTbl).last.commitTime
    SyncRegistry.register(spark, corpusTbl, "d",
      SyncRegistry.DedupSpec(idx, "doc_id", "text"), basis = Some(tip0))
    val good = SyncRegistry.registered(spark, corpusTbl)
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))
    assert(ids(KeyedTable.read(spark, idx)) === Set(1L, 2L, 3L))
    // RE-register the same name with a broken replacement spec whose
    // catch-up (non-empty: basis = tip0 is behind the corpus tip) fails:
    // the prior, still-consistent registration must come back — other
    // registered indexes keep advancing the shared watermark, so dropping
    // the name would leave the old index with a permanent silent gap
    val idx2 = s"$dir/idx2"
    DedupIndex.bootstrap(spark, idx2,
      KeyedTable.read(spark, corpusTbl), "doc_id", "text")
    intercept[Exception] {
      SyncRegistry.register(spark, corpusTbl, "d",
        SyncRegistry.DedupSpec(idx2, "doc_id", "no_such_column"),
        basis = Some(tip0))
    }
    assert(SyncRegistry.registered(spark, corpusTbl) === good,
      "failed re-register must restore the prior spec, not drop the name")
    // ...and the restored registration still follows publishes hands-off
    KeyedTable.delete(spark, corpusTbl, Seq(1L).toDF("doc_id"))
    assert(ids(KeyedTable.read(spark, idx)) === Set(2L, 3L),
      "the restored registration stopped following")
  }

  test("registry depth boundary: a registered index's own hook-driven " +
      "publishes do NOT cascade a second registry sync inside one hook; an " +
      "explicit syncNow walks the second level") {
    val dir = tmpDir("sync-reg-depth")
    val corpusTbl = s"$dir/corpus"
    val level1 = s"$dir/text-idx" // registered on the corpus; itself a corpus
    val level2 = s"$dir/dedup-of-idx" // registered on level1
    KeyedTable.create(spark, corpusTbl,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      tableName = "reg_depth", keyFields = Seq("doc_id"),
      precombineField = "doc_id", partitionFields = Seq.empty,
      tableType = TableType.MergeOnRead)
    TextIndex.build(spark, level1, KeyedTable.read(spark, corpusTbl),
      "doc_id", "text")
    SyncRegistry.register(spark, corpusTbl, "t",
      SyncRegistry.TextSpec(level1, "doc_id", "text"),
      basis = Some(CommitLog.commits(spark, corpusTbl).last.commitTime))
    // level2 hangs off the TEXT INDEX's rows (id + term columns exist in
    // level1's CDC feed; doclen rows are unique per id, a clean bootstrap
    // key); basis = level1's tip, so registration is quiet
    DedupIndex.bootstrap(spark, level2,
      KeyedTable.read(spark, level1)
        .filter(col(TextIndex.KindCol) === TextIndex.DoclenKind),
      "id", "term")
    SyncRegistry.register(spark, level1, "d2",
      SyncRegistry.DedupSpec(level2, "id", "term"),
      basis = Some(CommitLog.commits(spark, level1).last.commitTime))
    val fs = CommitLog.fs(spark, level1)
    val w0 = ChangeStream.readWatermark(
      fs, SyncRegistry.checkpointDir(level1))
    // a corpus publish syncs level1 (new commits land there through the
    // hook) — but level1's own registry must NOT run inside that hook
    KeyedTable.upsert(spark, corpusTbl, Seq((3L, textC)).toDF("doc_id", "text"))
    assert(CommitLog.commits(spark, level1).last.commitTime >
      w0.getOrElse(""), "level1 did not receive the synced publish")
    assert(ChangeStream.readWatermark(
      fs, SyncRegistry.checkpointDir(level1)) === w0,
      "depth-2 cascade ran inside one hook (guard broken)")
    // the documented shape for depth > 1: the explicit ordered walk —
    // level 0 (corpus registry: quiet, the hook already consumed it),
    // then level 1's registry applies its pending interval to level 2
    val walk = SyncRegistry.syncChain(spark, corpusTbl)
    assert(walk.map(_._1) ===
      Seq(new org.apache.hadoop.fs.Path(corpusTbl).toString,
        new org.apache.hadoop.fs.Path(level1).toString,
        new org.apache.hadoop.fs.Path(level2).toString), s"walk: $walk")
    assert(walk.head._2.isEmpty, "corpus level: hook already synced it")
    assert(walk(1)._2.nonEmpty, "level1's pending interval must apply")
    assert(walk(2)._2.isEmpty, "level2 has no registry of its own")
    assert(ChangeStream.readWatermark(
      fs, SyncRegistry.checkpointDir(level1)) !== w0)
    // a second walk is a no-op end to end (idempotent drain)
    assert(SyncRegistry.syncChain(spark, corpusTbl).forall(_._2.isEmpty))
  }
}
