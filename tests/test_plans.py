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
