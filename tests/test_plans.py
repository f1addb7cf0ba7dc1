"""Plan-quality audit: the properties that make these queries hold at
100 TB, asserted on the physical plans so a regression is a test
failure, not a slow cluster bill.

- dimension joins go BROADCAST (no shuffle of the fact table per dim)
- scans push filters and prune columns down to parquet
- no accidental cartesian products
- sessionization reuses ONE user_id exchange for window + aggregate
"""

import pytest

from mallard_spark.registry import load_all

SPECS = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = SPECS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_snowflake_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # only the fact-fact join (lineitem ⋈ orders) may shuffle
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # column pruning: untouched columns must not reach the scan
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_returnflag" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q1_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    read_schema = plan.split("ReadSchema")[1][:500]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_knn_probe_side_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_sessionize_single_exchange(spark, sf_dir):
    # window(user_id) and groupBy(user_id, session_id) must share one
    # hash exchange — partitioning on user_id satisfies both
    plan = _plan(spark, sf_dir, "ev_sessionize")
    assert plan.count("Exchange hashpartitioning") == 1


def test_q3_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "CartesianProduct" not in plan


def test_topk_window_after_agg_shares_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_parts_per_nation")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as an equi join on the hour
    bucket — a BroadcastNestedLoopJoin here means the bucketing
    decomposition regressed and the query is O(n*m) at scale."""
    plan = _plan(spark, sf_dir, "ev_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_rollup_cascade_reads_stored_minute_aggregate(spark, sf_dir):
    """The cascade stores the minute-grain aggregate and derives
    hour/day from it — the final plan must read the stored partials,
    never re-scan raw events (Catalyst clones unioned subplans, so a
    barrier-less cascade silently becomes three full scans)."""
    plan = _plan(spark, sf_dir, "ev_rollup_cascade")
    assert plan.count("events.parquet") == 0
    assert "mallard_spark_materialize" in plan


def test_window_parity_single_exchange(spark, sf_dir):
    """Ten stacked window functions over one spec = ONE exchange."""
    plan = _plan(spark, sf_dir, "window_funcs_parity")
    assert plan.count("Exchange") == 1


def test_array_parity_no_python_udf(spark, sf_dir):
    """Higher-order array funcs stay JVM-side — no Python in the plan."""
    plan = _plan(spark, sf_dir, "array_funcs_parity")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_dedup_embedding_blocks_on_lsh_not_label(spark, sf_dir):
    """Round-3 fix: candidate generation must join on (tbl, bucket)
    LSH keys, never on the tiny-cardinality `label` column."""
    plan = _plan(spark, sf_dir, "dedup_embedding")
    assert "CartesianProduct" not in plan
    assert "label" not in plan  # no label-keyed join anywhere
    assert "bucket" in plan and "tbl" in plan


def test_dedup_editdistance_has_end_blocking_keys(spark, sf_dir):
    """Round-3 fix: (lang, len-bucket) blocks are additionally bounded
    by prefix front/back keys — both equi-join branches carry them."""
    plan = _plan(spark, sf_dir, "dedup_editdistance")
    assert "CartesianProduct" not in plan
    assert "fk_a" in plan and "bk_a" in plan  # front/back keys in join


def test_bucketed_fact_joins_have_zero_exchanges(spark, sf_dir):
    """Round-3: orderkey-bucketed lineitem/orders make q3/q18
    completely shuffle-free — the 100 TB layout, proven on the plan."""
    for name in ("q3_bucketed", "q18_bucketed"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Exchange hashpartitioning") == 0, name
        assert plan.count("Exchange rangepartitioning") == 0, name
        assert "CartesianProduct" not in plan, name
        assert "Bucketed: true" in plan, name  # scans consume the layout


def test_bucketed_results_match_plain(spark, sf_dir):
    """Bucketing must never change answers, only plans."""
    plain = sorted(map(tuple, SPECS["q18_large_volume_customer"].fn(spark, sf_dir).collect()))
    bucketed = sorted(map(tuple, SPECS["q18_bucketed"].fn(spark, sf_dir).collect()))
    assert plain == bucketed


def test_mix_sources_broadcasts_totals(spark, sf_dir):
    """Per-source totals (rows = #sources) and the global min must
    come back as broadcasts — the corpus itself is never shuffled."""
    plan = _plan(spark, sf_dir, "mix_sources")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row min cross join
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_set_is_broadcast(spark, sf_dir):
    """The high-df boilerplate set (small by Zipf) joins back to the
    shingle stream as a broadcast, never a shuffle of the corpus."""
    plan = _plan(spark, sf_dir, "boilerplate_fraction")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shard_assignment_single_exchange(spark, sf_dir):
    """The training shuffle is ONE hash exchange on shard_id; the
    within-shard sort never goes global (no range exchange)."""
    plan = _plan(spark, sf_dir, "shard_assignment")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_vocab_coverage_aggregates_before_global_window(spark, sf_dir):
    """Corpus-sized work is the token groupBy (one hash exchange,
    map-side partial combine); only the vocabulary-sized result hits
    the single-partition window."""
    plan = _plan(spark, sf_dir, "vocab_coverage")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_substring_windows_stage_and_no_cartesian(spark, sf_dir):
    """Window stream staged once; the df-count join keys on the window
    hash (shuffle join on a short key — both sides corpus-sized, so a
    broadcast is NOT expected); nothing cartesian."""
    plan = _plan(spark, sf_dir, "dedup_substring_windows")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_entropy_no_shuffle(spark, sf_dir):
    # round 16: per-row work runs in ONE Arrow pass — still no
    # per-char explode and no hash (corpus-keyed) shuffle. The only
    # Exchange allowed is spread()'s RoundRobin fan-out, which exists
    # ONLY on under-parallel local scans (a split input at scale makes
    # it a no-op — functions/exec.py::spread).
    plan = _plan(spark, sf_dir, "text_entropy")
    assert "hashpartitioning" not in plan
    assert "Generate" not in plan  # no explode
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan


def test_filter_cascade_single_agg_exchange(spark, sf_dir):
    # one partial+final agg by lang — exactly one hash exchange, no
    # shuffle of document content
    plan = _plan(spark, sf_dir, "filter_cascade_report")
    assert plan.count("Exchange hashpartitioning") == 1


def test_dup_rate_broadcasts_dup_set(spark, sf_dir):
    # the near-dup doc set (bounded by dup density) must broadcast
    # onto the documents scan — never shuffle the corpus for the join
    plan = _plan(spark, sf_dir, "dup_rate_by_source")
    assert "BroadcastHashJoin" in plan


def test_dedup_incremental_no_cartesian_and_bounded_join(spark, sf_dir):
    # new-batch bands ⋈ corpus bands: an equi-join on (band, bkey),
    # never a cartesian; both sides filtered before the join so no
    # corpus×corpus work exists in the plan
    plan = _plan(spark, sf_dir, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_emb_gram_matrix_shuffles_partials_not_vectors(spark, sf_dir):
    # ONE corpus pass: the only exchange moves d(d+1)/2-row partials
    # from mapInPandas — the raw vectors never shuffle
    plan = _plan(spark, sf_dir, "emb_gram_matrix")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroups" not in plan  # mapInPandas, not grouped-map


def test_sample_reservoir_is_take_ordered_no_exchange(spark, sf_dir):
    # the reservoir cost model: per-task top-k heap + driver merge,
    # never a global sort shuffle; text column pruned from the scan
    plan = _plan(spark, sf_dir, "sample_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "text" not in read_schema


def test_url_canonicalize_single_agg_exchange(spark, sf_dir):
    # regex chain is a codegen map over the scan; only the domain
    # aggregate (and its countDistinct expand) may shuffle
    plan = _plan(spark, sf_dir, "url_canonicalize_dedup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no Python in the hot path
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "text" not in read_schema  # only doc_id is read


def test_perplexity_vocab_is_broadcast(spark, sf_dir):
    # corpus tokens join the vocab via BROADCAST — the corpus is
    # never shuffled on term for scoring (only the vocab-build
    # explode→agg and the doc/lang aggregates exchange)
    plan = _plan(spark, sf_dir, "quality_perplexity_proxy")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan or "Broadcast" in plan


def test_tokenize_to_ids_broadcast_vocab_single_corpus_exchange(spark, sf_dir):
    # vocab join is BROADCAST; the corpus only exchanges for the
    # doc_id reassembly (plus the vocab build's own term agg)
    plan = _plan(spark, sf_dir, "tokenize_to_ids")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_knn_pq_codebook_broadcast_no_cartesian(spark, sf_dir):
    # codebook + distance table broadcast; ADC/encode never sort-merge
    plan = _plan(spark, sf_dir, "knn_pq")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_knn_ivfpq_broadcast_joins_only_on_small_sides(spark, sf_dir):
    # round-5 fused plan: the query side reads the materialized
    # (vec_id, v, codes, lists) index and candidate-joins it against
    # the BROADCAST probe rows via arrays_overlap — a broadcast
    # nested loop over a bounded probe set, never a cartesian, and no
    # row-at-a-time Python in the serving plan (the Arrow-vectorized
    # index build ran in the materialize side-job)
    plan = _plan(spark, sf_dir, "knn_ivfpq")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "ivfpq_index" in plan  # reads the persisted index artifact
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_semantic_centroids_broadcast(spark, sf_dir):
    # centroid assignment is corpus x broadcast(centroids); pair join
    # is an equi-join on cluster
    plan = _plan(spark, sf_dir, "dedup_semantic_kmeans")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_curation_funnel_single_scan(spark, sf_dir):
    # one-pass design: ONE aggregate + stack() unpivot — the corpus
    # parquet is scanned exactly once and each window runs once
    # (union-of-5-aggregates re-scanned per branch: 5 scans, 10
    # windows — review finding r4)
    plan = _plan(spark, sf_dir, "pipeline_curation_funnel")
    assert plan.count("Scan parquet") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """The SURVEY §6 claim 'AQE skew handling' made falsifiable: a
    join with one hot key must show skew-split partitions in the
    final adaptive plan (isSkew=true / 'skew=' markers), proving a
    100 TB hot key becomes N parallel tasks, not one straggler."""
    import os

    big = spark.range(0, 200_000).selectExpr(
        "CASE WHEN id < 150000 THEN 0L ELSE id END AS k", "id AS payload"
    )
    small = spark.range(0, 2_000).selectExpr("id AS k", "id * 10 AS v")
    bp, sp = str(tmp_path / "big"), str(tmp_path / "small")
    big.write.parquet(bp)
    small.write.parquet(sp)

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        joined = spark.read.parquet(bp).join(spark.read.parquet(sp), "k")
        joined.collect()  # execute THIS plan so AQE finalizes it
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "isSkew" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pit_features_is_equi_join_not_nested_loop(spark, sf_dir):
    # the (user, hour-bucket) linearization: the trailing-window probe
    # must compile to an equi-join, never a BNLJ/cartesian over time
    plan = _plan(spark, sf_dir, "ev_pit_features")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_windowed_semi_structure(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ev_funnel_windowed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sequence_match_single_user_exchange(spark, sf_dir):
    # one groupBy(user) encodes the sequences; the regex counters run
    # in the final 1-row aggregate — no second corpus shuffle
    plan = _plan(spark, sf_dir, "ev_sequence_match")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_drift_psi_broadcast_totals(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ev_drift_psi")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_graph_triangle_equi_joins_only(spark, sf_dir):
    # orientation + wedge + closing-edge joins are all equi-joins on
    # node / (node, node) keys; the only NL joins are the four 1-row
    # count broadcasts at the end
    plan = _plan(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the edge list is materialized once — without the barrier the
    # five consumers re-ran the support join (observed: 94 exchanges)
    assert "mallard_spark_materialize" in plan
    assert plan.count("Exchange hashpartitioning") <= 8
    # closing-edge probe is an equi-join (HashedRelation on pair key)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_graph_pagerank_iterations_are_equi_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # lineage is truncated every iteration: the final plan must be
    # constant-size (observed 400+ join nodes without localCheckpoint)
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") <= 3


def test_quality_rules_single_scan_no_python(spark, sf_dir):
    # both rule batteries are pure column expressions: one scan, one
    # per-source aggregate, no UDF, no join
    for name in ("quality_gopher_rules", "quality_c4_rules"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 1


def test_knn_graph_bucket_join_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_emb_outlier_centroids_broadcast(spark, sf_dir):
    # the (label, pos) centroid sums are tiny and must broadcast back
    # onto the exploded coords — never a corpus-sized shuffle join
    plan = _plan(spark, sf_dir, "emb_outlier_report")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_bloom_bitmap_broadcast(spark, sf_dir):
    # the packed bitmap (<= 1041 rows) broadcasts to the train scan;
    # the only shuffles are the distinct/groupBy aggregations — the
    # train corpus never sort-merges against the test side
    plan = _plan(spark, sf_dir, "decontaminate_bloom")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_knn_pq_trained_codebook_broadcast_no_python(spark, sf_dir):
    # every Lloyd round joins subvectors against a BROADCAST codebook
    # (256 rows); training adds no cartesian and no Python stage
    plan = _plan(spark, sf_dir, "knn_pq_trained")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_mm_phash_band_equi_join(spark, sf_dir):
    # candidate generation is an equi-join on (band, bval) over the
    # one-int64-per-asset sketch table — never an all-pairs product;
    # the only Python stage is the Arrow-batched feature extractor
    # (mapInPandas = ArrowEvalPython, upstream of the materialize)
    plan = _plan(spark, sf_dir, "mm_phash_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_train_word_table_not_corpus(spark, sf_dir):
    # each round's working set is the word-frequency symbol table; the
    # winning pair and candidate sets join back broadcast — no
    # cartesian, no Python, and the documents scan happens only in
    # the (already-materialized) s0 build
    plan = _plan(spark, sf_dir, "bpe_train_merges")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_perplexity_buckets_vocab_broadcast(spark, sf_dir):
    # scoring joins corpus tokens against the BROADCAST vocab; the
    # tertile windows run over one-row-per-doc, never per token
    plan = _plan(spark, sf_dir, "quality_perplexity_buckets")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hard_negative_probe_broadcast(spark, sf_dir):
    # one corpus pass against the broadcast probe set feeds both the
    # positive max and the negative top-k; no cartesian, no Python
    plan = _plan(spark, sf_dir, "hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ivf_seed_set_is_bounded_top_k_not_corpus_fraction(spark, sf_dir):
    # VERDICT r4: the coarse quantizer must be a FIXED-size seed set
    # (selected by a global top-K over the hash order — a per-task
    # heap, no sort shuffle), never a `vec_id % k` filter whose list
    # count grows with the corpus. The assignment join's build side
    # is then bounded at any scale.
    from mallard_spark.operators.similarity import IVF_NLIST, _ivf_seeds
    from mallard_spark.sources.readers import load_table
    from pyspark.sql import functions as F
    from mallard_spark.functions.vectors import as_double

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    seeds = _ivf_seeds(vecs)
    splan = seeds._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan
    assert seeds.count() == min(IVF_NLIST, vecs.count())
    # knn_ivf's fused assignment carries the bounded seed set in the
    # numpy closure (knn_ivfpq's proven build shape) and runs behind
    # the materialize barrier; the SERVING plan reads the staged
    # index, explodes the per-vector list array, and must not contain
    # the old 48×N assignment join's vec_id window sort (the only
    # remaining windows are the probe-side and final top-k ranks,
    # both bounded by the probe set)
    plan = _plan(spark, sf_dir, "knn_ivf")
    assert "Generate explode" in plan
    # "Window [" counts exec nodes only (WindowGroupLimit helpers
    # print as a single word and don't match)
    assert plan.count("Window [") <= 2
    # the serving side still broadcasts the small probe-list relation
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # knn_ivfpq collects the same bounded seed set up front (driver
    # side) and bakes it into the broadcast params row; its serving
    # plan joins the materialized index against broadcast probes
    plan = _plan(spark, sf_dir, "knn_ivfpq")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_kmeans_training_input_is_capped_sample(spark, sf_dir):
    # Lloyd training reads the bounded md5-ordered sample (constant
    # cost in corpus size); only the final one-shot assignment scans
    # all vectors.
    import mallard_spark.operators.similarity as S
    from mallard_spark.functions.exec import materialize_path

    plan = _plan(spark, sf_dir, "knn_ivf_kmeans")
    assert "CartesianProduct" not in plan
    # the Lloyd loop's input is the materialized capped sample, not
    # the full corpus (the final plan only reads the loop's outputs,
    # so assert on the materialized artifact itself)
    train = spark.read.parquet(materialize_path("kmeans_train"))
    vecs = spark.read.parquet(materialize_path("kmeans_vecs"))
    assert train.count() == min(S.KM_TRAIN_CAP, vecs.count())


def test_cms_probe_join_is_broadcast_no_cartesian(spark, sf_dir):
    # the 30-row probe set must broadcast against the bounded cell
    # grid; key counting is one partial-combined exchange
    plan = _plan(spark, sf_dir, "cms_topk_estimate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_quantile_histogram_windows_run_on_bucket_table(spark, sf_dir):
    # the cumulative window and target probing operate on the bucket
    # table / target rows (broadcast), never a global sort of events;
    # the only per-row window is the 3-target-bucket refinement
    plan = _plan(spark, sf_dir, "quantile_histogram_merge")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastExchange") >= 2  # targets + cum_before


def test_canonical_select_broadcasts_labels_onto_docs(spark, sf_dir):
    # cluster labels are bounded by near-dup-graph nodes << corpus —
    # they broadcast onto the documents scan, which never shuffles
    plan = _plan(spark, sf_dir, "dedup_canonical_select")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_upsample_epochs_single_scan_single_exchange(spark, sf_dir):
    # pure row-local integer math + one per-source aggregate
    plan = _plan(spark, sf_dir, "mix_upsample_epochs")
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_triangle_count_broadcasts_one_row_aggs(spark, sf_dir):
    """graph_triangle_count combines three 1-row aggregates — each
    crossJoin must be a PLANNED broadcast (round-5 VERDICT #2: the
    codebase convention ev_funnel follows), never a CartesianProduct
    left for AQE to rescue."""
    plan = _plan(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_emb_dim_stats_dimension_bounded_exchange(spark, sf_dir):
    """emb_dim_stats: the posexplode fan-out must partial-combine
    map-side — exactly one hash exchange (keyed by dimension), no
    join, no corpus-wide sort."""
    plan = _plan(spark, sf_dir, "emb_dim_stats")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_mix_token_budget_no_corpus_shuffle(spark, sf_dir):
    """mix_token_budget: the corpus is touched ONCE (the per-source
    aggregate into the materialize barrier); the serving plan reads
    the tiny artifact — no corpus-keyed exchange, no cartesian, the
    hinted 1-row totals broadcast (codebase convention)."""
    plan = _plan(spark, sf_dir, "mix_token_budget")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the hinted 1-row totals
    assert "documents" not in plan  # corpus scan happened at build time


def test_range_search_broadcast_single_pass(spark, sf_dir):
    """Round-8: radius search is a broadcast-probe single corpus scan
    — no sort-merge join, no window/rank (output is filter-selected),
    no cartesian."""
    plan = _plan(spark, sf_dir, "knn_range_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # no rank — τ filter only


def test_prefix_fidelity_dimension_bounded(spark, sf_dir):
    """Round-8: the matryoshka report partial-combines map-side, so
    the exchange carries ≤|dims| rows per task — no join at all."""
    plan = _plan(spark, sf_dir, "emb_prefix_fidelity")
    assert "partial" in plan.lower() or "HashAggregate" in plan
    assert "Join" not in plan


def test_hapax_ratio_partial_aggregates(spark, sf_dir):
    """Round-8: both hapax aggregates partial-combine (vocabulary-
    bounded exchange) — no join, no window."""
    plan = _plan(spark, sf_dir, "text_hapax_ratio")
    assert "Join" not in plan
    assert "Window" not in plan


def test_leakage_safe_split_no_extra_shuffle(spark, sf_dir):
    """Round-8: beyond the shared CC label machinery, the split is a
    left join on doc_id plus a 3-row aggregate — the bucket routing
    itself adds no exchange (per-row hash) and never a cartesian."""
    plan = _plan(spark, sf_dir, "split_leakage_safe")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_source_priority_groupinglimit_no_text_shuffle(spark, sf_dir):
    """Round-10: the cross-source priority dedup must (a) never
    shuffle the text column — only (digest, source, doc_id, n_chars)
    tuples move — and (b) get Catalyst's WindowGroupLimit so each map
    task ships at most ONE candidate row per digest before the
    exchange (the rn=1 filter pushed into the window)."""
    plan = _plan(spark, sf_dir, "dedup_cross_source_priority")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text#" not in m.group(0), "text column crossed the wire"
