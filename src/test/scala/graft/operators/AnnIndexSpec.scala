package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.CommitLog

/** Standing table-backed ANN index: the probe must be pure read-side work
  * (no Lloyd, no commits), bit-identical to the recompute-everything IVF
  * over the same centroids, and appends must extend the searched corpus
  * without retraining.
  */
class AnnIndexSpec extends SparkTestBase {

  private def emb = spark.read.parquet(sf("embeddings"))

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("probe ≡ ivfTopK over the same stored centroids; probe trains nothing " +
      "and commits nothing") {
    val idx = s"${tmpDir("ann-idx")}/idx"
    val corpus = emb.filter(col("vec_id") >= 20)
    val queries = emb.filter(col("vec_id") < 5)
    AnnIndex.build(spark, idx, corpus, nlist = 16, iters = 2)
    val commits0 = CommitLog.commits(spark, idx).map(_.commitTime)
    assert(CommitLog.commits(spark, idx).map(_.operation) === Seq("bootstrap"))

    // zero-Lloyd gate: Lloyd localCheckpoints its centroids every round
    // (persistent RDDs); a pure probe may not create ANY persisted RDD
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val got = AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10)
    val gotPairs = pairs(got)
    assert(spark.sparkContext.getPersistentRDDs.keySet === persistedBefore,
      "probe must not train (no Lloyd localCheckpoint) or cache anything")
    assert(CommitLog.commits(spark, idx).map(_.commitTime) === commits0,
      "probe must not write to the index table")

    // bit-identical to the recompute formulation over the SAME centroids:
    // storage changed where the state lives, not what the search returns
    val ivf = Similarity.ivfTopK(corpus, queries, k = 10, nlist = 16, nprobe = 10,
      centroids = Some(AnnIndex.centroids(spark, idx)))
    assert(gotPairs === pairs(ivf))
    assert(gotPairs.nonEmpty)

    // plan shape: the probe's joins are all broadcasts of bounded sides
    // (centroids, the queries·nprobe probe set) — never a pair explosion
    val plan = AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "probe planned a cartesian")
    assert(plan.contains("BroadcastExchange"), "probe lost its broadcast joins")
  }

  test("append assigns against stored centroids (no retraining), the next probe " +
      "searches the appended batch, and asOf reproduces the pre-append search") {
    val idx = s"${tmpDir("ann-append")}/idx"
    val corpus = emb.filter(col("vec_id") >= 50)
    val batch = emb.filter(col("vec_id") >= 25 && col("vec_id") < 50)
    val queries = emb.filter(col("vec_id") < 5)
    AnnIndex.build(spark, idx, corpus, nlist = 16, iters = 2)
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    val before = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10))

    val centsBefore = AnnIndex.centroids(spark, idx).collect().map(_.toString).sorted
    AnnIndex.append(spark, idx, batch)
    // one delta commit; centroids untouched (no retraining). compact.auto
    // (on by default for standing indexes) may fold the delta right after —
    // a file rewrite, never a logical change, so it is filtered here
    assert(CommitLog.commits(spark, idx).map(_.operation)
      .filterNot(_ == "compact") === Seq("bootstrap", "delta_commit"))
    assert(AnnIndex.centroids(spark, idx).collect().map(_.toString).sorted
      === centsBefore)

    // the post-append index ≡ an ivf run over corpus ∪ batch with the
    // same stored centroids — append is pure assignment, not a new model
    val after = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10))
    val ivf = Similarity.ivfTopK(corpus.unionByName(batch), queries,
      k = 10, nlist = 16, nprobe = 10,
      centroids = Some(AnnIndex.centroids(spark, idx)))
    assert(after === pairs(ivf))

    // every appended vector is reachable: a full probe (all cells, corpus-
    // sized k) must surface the whole batch
    val appendedIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val full = pairs(AnnIndex.probe(spark, idx, queries.limit(1), k = 100000,
      nprobe = 16)).map(_._2)
    assert(appendedIds.subsetOf(full), "appended vectors must be searchable")

    // time travel: the probe asOf the pre-append tip is the OLD search
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10,
      asOf = Some(tip0))) === before)

    // cell stats (the IVF health signal) account for every stored vector,
    // before and after the append
    val statsNow = AnnIndex.cellStats(spark, idx).collect()
    assert(statsNow.map(_.getLong(1)).sum === corpus.count() + batch.count())
    assert(AnnIndex.cellStats(spark, idx, asOf = Some(tip0))
      .collect().map(_.getLong(1)).sum === corpus.count())
  }

  test("streaming ingest: micro-batches grow the index; end state ≡ batch appends; " +
      "a redelivered batch changes nothing (keyed upsert idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val dir = tmpDir("ann-stream")
    val idx = s"$dir/idx"
    val corpus = emb.filter(col("vec_id") >= 50)
    AnnIndex.build(spark, idx, corpus, nlist = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 5)

    def rows(f: org.apache.spark.sql.Column) = emb.filter(f)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val b1 = rows(col("vec_id") >= 35 && col("vec_id") < 50)
    val b2 = rows(col("vec_id") >= 25 && col("vec_id") < 35)

    val stream = MemoryStream[(Long, Array[Float])]
    val q = AnnIndex.ingestStream(
      stream.toDF().toDF("vec_id", "embedding"), idx, tmpDir("ann-ckpt"))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      // a source-level redelivery folds into the same keyed entries
      stream.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10))
    // end state ≡ the equivalent batch appends (same centroids, same corpus)
    val idx2 = s"$dir/idx2"
    AnnIndex.build(spark, idx2, corpus, nlist = 16, iters = 2)
    AnnIndex.append(spark, idx2, emb.filter(col("vec_id") >= 25 && col("vec_id") < 50))
    assert(streamed === pairs(AnnIndex.probe(spark, idx2, queries, k = 10, nprobe = 10)))
    // one entry per vec_id despite the redelivery
    assert(AnnIndex.cellStats(spark, idx).collect().map(_.getLong(1)).sum ===
      corpus.count() + b1.size + b2.size)
  }

  test("remove: a taken-down vector never probes again, leaves cellStats, " +
      "asOf pre-removal still reproduces the old search, and a re-append re-serves it") {
    import spark.implicits._
    val idx = s"${tmpDir("ann-remove")}/idx"
    val corpus = emb.filter(col("vec_id") >= 25)
    val queries = emb.filter(col("vec_id") < 5)
    AnnIndex.build(spark, idx, corpus, nlist = 16, iters = 2)
    val before = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10))
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    // take down exactly what the index is SERVING — the pre-removal top
    // hits (the realistic compliance shape: the flagged doc was in results)
    val victims = before.map(_._2)
    assert(victims.nonEmpty)
    AnnIndex.remove(spark, idx, victims.toSeq.toDF("vec_id"))
    // one keyed tombstone delta, no rewrite of the corpus rows
    assert(CommitLog.commits(spark, idx).map(_.operation)
      .filterNot(_ == "compact") === Seq("bootstrap", "delete"))

    // the ghost is gone: no removed id ever surfaces, and the probe is
    // bit-identical to an index that NEVER contained the victims
    val after = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10))
    assert(after.map(_._2).intersect(victims).isEmpty,
      "a removed vector surfaced from a probe")
    val remaining = corpus.filter(!col("vec_id").isin(victims.toSeq: _*))
    val ivf = Similarity.ivfTopK(remaining, queries, k = 10, nlist = 16,
      nprobe = 10, centroids = Some(AnnIndex.centroids(spark, idx)))
    assert(after === pairs(ivf))

    // the health signal sheds them too
    assert(AnnIndex.cellStats(spark, idx).collect().map(_.getLong(1)).sum ===
      corpus.count() - victims.size)

    // history retained, not rewritten: the historical search reproduces
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10,
      asOf = Some(tip0))) === before)

    // re-appending a removed id re-serves it: assignment against the same
    // frozen centroids is deterministic, so the probe returns to the
    // original results exactly
    AnnIndex.append(spark, idx, corpus.filter(col("vec_id").isin(victims.toSeq: _*)))
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10)) === before)
  }

  test("retrain re-fits a skewed index IN PLACE as one commit: the geometry equals a " +
      "fresh build, asOf pre-retrain is unchanged, and nlist can grow and shrink") {
    val idx = s"${tmpDir("ann-retrain")}/idx"
    val corpus = emb.filter(col("vec_id") >= 25)
    val queries = emb.filter(col("vec_id") < 5)
    // deliberately COARSE build (nlist=2): the under-split geometry whose
    // cellStats skew a retrain/split is meant to cure
    AnnIndex.build(spark, idx, corpus, nlist = 2, iters = 2)
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    val before = pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 1))
    assert(AnnIndex.cellStats(spark, idx).count() === 2)

    // SPLIT: retrain to 16 lists — ONE merge commit carries new centroids +
    // full reassignment (+ any stale-centroid tombstones)
    AnnIndex.retrain(spark, idx, nlist = 16, iters = 2)
    assert(CommitLog.commits(spark, idx).map(_.operation)
      .filterNot(_ == "compact") === Seq("bootstrap", "merge"))
    assert(AnnIndex.centroids(spark, idx).count() === 16)
    // every vector reassigned, none lost
    assert(AnnIndex.cellStats(spark, idx).collect().map(_.getLong(1)).sum ===
      corpus.count())
    // the retrained index is bit-identical to a FRESH nlist=16 build over
    // the same vectors (deterministic Lloyd): history is the only difference
    val fresh = s"${tmpDir("ann-retrain-fresh")}/idx"
    AnnIndex.build(spark, fresh, corpus, nlist = 16, iters = 2)
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10)) ===
      pairs(AnnIndex.probe(spark, fresh, queries, k = 10, nprobe = 10)))

    // history: the pre-retrain geometry still answers asOf probes
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 1,
      asOf = Some(tip0))) === before)

    // SHRINK: retraining back to nlist=2 retires the 14 surplus centroid
    // keys in the SAME commit (mergeRows tombstones) and reproduces the
    // original coarse geometry exactly — centroid ids are the seed vec_ids
    // (the 2 lowest), so the id set must match the original build's
    AnnIndex.retrain(spark, idx, nlist = 2, iters = 2)
    def centIds(p: String) = AnnIndex.centroids(spark, p)
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(centIds(idx) === Set(25L, 26L),
      s"stale centroid keys survived the shrink: ${centIds(idx)}")
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 1)) === before)
  }

  test("standing indexes are born with compact.auto: a delta chain crossing the " +
      "policy threshold folds hands-off, changing files but never results") {
    val idx = s"${tmpDir("ann-birth")}/idx"
    // small base + big append: the delta/base byte ratio crosses the 0.10
    // policy bar, so the publish hook must fold WITHOUT any property call
    val corpus = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    val batch = emb.filter(col("vec_id") >= 25 && col("vec_id") < 50)
    val queries = emb.filter(col("vec_id") < 5)
    AnnIndex.build(spark, idx, corpus, nlist = 4, iters = 2)
    assert(graft.table.TableProperties.get(spark, idx)
      .get(graft.table.TableProperties.CompactAuto) === Some("true"),
      "index builds must set compact.auto at birth")
    AnnIndex.append(spark, idx, batch)
    val ops = CommitLog.commits(spark, idx).map(_.operation)
    assert(ops === Seq("bootstrap", "delta_commit", "compact"),
      s"the hook should have folded the oversized delta chain, got $ops")
    // folding rewrote files, not results
    val ivf = Similarity.ivfTopK(corpus.unionByName(batch), queries, k = 5,
      nlist = 4, nprobe = 4, centroids = Some(AnnIndex.centroids(spark, idx)))
    assert(pairs(AnnIndex.probe(spark, idx, queries, k = 5, nprobe = 4)) === pairs(ivf))
  }

  test("probe recall@10 clears the x62 bar against the exact top-10") {
    val idx = s"${tmpDir("ann-recall")}/idx"
    val corpus = emb.filter(col("vec_id") >= 25)
    val queries = emb.filter(col("vec_id") < 5)
    AnnIndex.build(spark, idx, corpus, nlist = 16, iters = 2)
    val ann = AnnIndex.probe(spark, idx, queries, k = 10, nprobe = 10)
      .select("query_id", "vec_id")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .select("query_id", "vec_id")
    val hits = ann.join(exact, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val bad = exact.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .filter(coalesce(col("n_hits"), lit(0)) < col("n_truth") * 0.7)
    assert(bad.isEmpty, s"recall bar missed: ${bad.collect().mkString(", ")}")
  }
}
