package graft

import graft.SparkTestBase

/** Plan-quality regression gate: no scan/join/agg query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed ONLY where the
  * build side is a broadcast 1-row aggregate (a scalar shipped with the
  * plan, not a pair explosion). Guards the property the round-1 audit
  * checked by hand — a refactor that degrades a bucketed join into an
  * all-pairs product fails here, at sf0.001, before any benchmark notices.
  *
  * Lifecycle queries (q22+) are excluded: their builders mutate temp
  * tables; their plans are the table machinery's, pinned by their own
  * specs.
  */
class PlanAuditSpec extends SparkTestBase {

  /** Queries whose BroadcastNestedLoopJoin has a documented BOUNDED build
    * side — a broadcast scalar or a small fixed set, never a second
    * corpus-sized relation:
    *  - q13: 1-row max-ts watermark aggregate
    *  - x28: 1-row corpus doc count
    *  - x06: the query-vector set (broadcast by contract; corpus streams)
    *  - x07: nlist seed centroids + the query-vector set
    *  - x40: 1-row corpus doc count (line-df threshold)
    *  - x44: m·codebookSize PQ centroids + the query-vector set
    *  - x46: nlist seed centroids (cells assignment) + 1-row count aggregates
    *  - x48: nlist seed centroids (cell assignment for the quota sampler)
    *  - x49: 1-row vocabulary-size aggregate + the 127-row pow2 table
    *    (the exact-integer-log2 range join)
    *  - x50/x51: |groups|-row per-source totals (the group-pair enumeration)
    *  - x56: the 127-row pow2 table (same exact-integer-log2 range join as
    *    x49, probing the |vocab|-bounded per-token count table)
    *  - x62/x64/x66: the standing-index probes' recall gates run
    *    bruteForceTopK as in-plan ground truth — the query-vector set
    *    broadcasts (x06's contract); the probes themselves join broadcast
    *    centroid/probe/LUT sides (bounded by nlist / queries·nprobe /
    *    m·codebookSize)
    *  - x67: the takedown twin of x62 — same in-plan bruteForceTopK recall
    *    gate (over the post-removal corpus) and the same bounded probe
    *    broadcasts
    *  - x72/x75: BM25's 1-row (N, avgdl) stats crossJoin — a broadcast
    *    scalar shipped with the scoring plan (x75 scores the same way over
    *    weighted multi-field postings)
    *  - x73: the stored-postings probe reads (N, Σdl) from 2 keyed stats
    *    rows instead (no crossJoin since round 13); kept on the list for
    *    the legacy recompute shapes shared with x72
    *  - x74/x76–x81 (the positional / slop / grouped / fielded retrieval
    *    probes, rounds 13–14) appear NOWHERE on this list ON PURPOSE:
    *    their corpus stats land as driver-read literals (bounded 2-row /
    *    O(groups) stats reads) and their joins are all broadcast
    *    equi-joins on query-bounded sides — no nested loop to exempt
    */
  private val boundedBroadcastOk =
    Set("q13_runaway_sweep", "x28_tfidf_keywords", "x06_ann_topk_brute", "x07_ann_ivf",
      "x40_line_dedup", "x44_ann_pq", "x46_dedup_embedding_cells", "x48_diverse_sample",
      "x49_lm_quality", "x50_domain_drift", "x51_overlap_matrix", "x56_nb_classifier",
      "x62_ann_index", "x64_pq_index", "x66_ivf_pq", "x67_ann_takedown",
      "x72_bm25_topk", "x73_text_index", "x75_bm25f")

  private def lifecycle(name: String) =
    name.matches("q(2[2-9]|[3-9][0-9])[a-z]?_.*")

  test("no cartesian or unbounded nested-loop joins in scan/join/agg query plans") {
    val d = "/root/testdata/sf0.001"
    val violations = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!lifecycle(name)) {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          violations += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !boundedBroadcastOk(name))
          violations += s"$name: BroadcastNestedLoopJoin"
      }
    }
    assert(violations.result().isEmpty, violations.result().mkString("; "))
  }

  test("x59's global prefix sum never plans a single-partition exchange") {
    // the scale property the operator exists for: the cumsum windows hash
    // on the range-partition id and the offsets join is a broadcast — a
    // refactor that degrades it to one giant window fails HERE, not at 100 TB
    val plan = SparkEntry.queries("x59_seq_pack")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "x59 planned a single-partition exchange — the prefix sum degraded to a global window")
    assert(plan.contains("BroadcastExchange"), "x59's offsets join lost its broadcast")
  }
}
