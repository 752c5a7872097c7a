package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.CommitLog

/** Standing PQ index: probes must be pure read-side work (no training, no
  * encode of the corpus, no commits), bit-identical to the recompute
  * formulation over the same codebooks, and appends must extend the
  * searched corpus by encoding against the STORED codebooks only.
  */
class PqIndexSpec extends SparkTestBase {

  private def emb = spark.read.parquet(sf("embeddings"))

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("probe ≡ pqTopK over the same stored codebooks; probe trains nothing " +
      "and commits nothing") {
    val idx = s"${tmpDir("pq-idx")}/idx"
    val corpus = emb.filter(col("vec_id") >= 20)
    val queries = emb.filter(col("vec_id") < 5)
    PqIndex.build(spark, idx, corpus, dim = 64, m = 16, iters = 2)
    val commits0 = CommitLog.commits(spark, idx).map(_.commitTime)

    // zero-training gate: Lloyd localCheckpoints every round (persistent
    // RDDs); a pure probe may not create ANY persisted RDD
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val got = pairs(PqIndex.probe(spark, idx, queries, k = 10, dim = 64,
      m = 16, shortlist = 10))
    assert(spark.sparkContext.getPersistentRDDs.keySet === persistedBefore,
      "probe must not train (no Lloyd localCheckpoint) or cache anything")
    assert(CommitLog.commits(spark, idx).map(_.commitTime) === commits0,
      "probe must not write to the index table")

    val recompute = Similarity.pqTopK(corpus, queries, k = 10, dim = 64,
      m = 16, shortlist = 10, codebooks = Some(PqIndex.codebooks(spark, idx)))
    assert(got === pairs(recompute))
    assert(got.nonEmpty)

    // plan shape: the LUT, shortlist, and query joins broadcast bounded
    // sides; the ADC scan never degrades to a pair explosion
    val plan = PqIndex.probe(spark, idx, queries, k = 10, dim = 64, m = 16,
      shortlist = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "probe planned a cartesian")
    assert(plan.contains("BroadcastExchange"), "probe lost its broadcast joins")
  }

  test("append encodes against stored codebooks (no retraining); asOf probes " +
      "reproduce the pre-append search") {
    val idx = s"${tmpDir("pq-append")}/idx"
    val corpus = emb.filter(col("vec_id") >= 50)
    val batch = emb.filter(col("vec_id") >= 25 && col("vec_id") < 50)
    val queries = emb.filter(col("vec_id") < 5)
    PqIndex.build(spark, idx, corpus, dim = 64, m = 16, iters = 2)
    val tip0 = CommitLog.commits(spark, idx).last.commitTime
    val before = pairs(PqIndex.probe(spark, idx, queries, k = 10, dim = 64,
      m = 16, shortlist = 10))

    val cbBefore = PqIndex.codebooks(spark, idx).collect().map(_.toString).sorted
    PqIndex.append(spark, idx, batch, dim = 64, m = 16)
    assert(CommitLog.commits(spark, idx).map(_.operation) ===
      Seq("bootstrap", "delta_commit"))
    assert(PqIndex.codebooks(spark, idx).collect().map(_.toString).sorted === cbBefore)

    // post-append probe ≡ pqTopK over corpus ∪ batch with the same stored
    // codebooks — append is pure encoding, never a new model
    val after = pairs(PqIndex.probe(spark, idx, queries, k = 10, dim = 64,
      m = 16, shortlist = 10))
    val recompute = Similarity.pqTopK(corpus.unionByName(batch), queries,
      k = 10, dim = 64, m = 16, shortlist = 10,
      codebooks = Some(PqIndex.codebooks(spark, idx)))
    assert(after === pairs(recompute))

    // every appended vector is reachable through a corpus-sized shortlist
    val appendedIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val full = pairs(PqIndex.probe(spark, idx, queries.limit(1), k = 100000,
      dim = 64, m = 16, shortlist = 1)).map(_._2)
    assert(appendedIds.subsetOf(full), "appended vectors must be searchable")

    assert(pairs(PqIndex.probe(spark, idx, queries, k = 10, dim = 64,
      m = 16, shortlist = 10, asOf = Some(tip0))) === before)
  }

  test("probe recall@10 clears the x64 bar against the exact top-10") {
    val idx = s"${tmpDir("pq-recall")}/idx"
    val corpus = emb.filter(col("vec_id") >= 25)
    val queries = emb.filter(col("vec_id") < 5)
    PqIndex.build(spark, idx, corpus, dim = 64, m = 16, iters = 2)
    val pq = PqIndex.probe(spark, idx, queries, k = 10, dim = 64, m = 16,
      shortlist = 10).select("query_id", "vec_id")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .select("query_id", "vec_id")
    val hits = pq.join(exact, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    val bad = exact.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .filter(coalesce(col("n_hits"), lit(0)) < col("n_truth") * 0.7)
    assert(bad.isEmpty, s"recall bar missed: ${bad.collect().mkString(", ")}")
  }
}
