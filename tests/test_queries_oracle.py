"""Every registered query vs its DuckDB oracle (the driver's t2 gate,
run locally at sf0.001). Queries without an oracle get a rows-and-
schema sanity check.

Round 16 (VERDICT r15 item #1): the per-query oracle checks recorded
>= ~7 s each (measured full-suite run, tests/ durations) are marked
``slow`` so the default driver-budget run keeps a fast ~95% subset of
the sweep; the FULL 221-query sweep still runs per round via
``-m "slow or not slow"``. Queries in the driver's own 50-query
CORRECTNESS subset are additionally checked by the driver itself
every round regardless of this marking.
"""

import pytest

from mallard_spark.registry import load_all
from mallard_spark.testing import run_compare

SPECS = load_all()

# Recorded >= ~7 s per check in the r16 full-suite durations run —
# mostly multi-materialization cluster/stream operators. Kept out of
# the default run ONLY for budget; the full sweep runs them.
SLOW_ORACLE = {
    "split_leakage_safe",
    "ev_holt_forecast",
    "stream_dedup_minhash",
    "stream_interval_join_outer",
    "dedup_clusters",
    "dedup_cluster_size_histogram",
    "dedup_canonical_select",
    "knn_ivf_kmeans",
    "dup_rate_by_source",
    "ev_gap_fill",
    "dedup_embedding",
    "stream_session_window",
    "knn_ivfpq_persisted",
    "minhash_accuracy_report",
    "ann_recall_report",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_ORACLE else n
        for n in sorted(SPECS)
    ],
)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0
    else:
        run_compare(spark, sf_dir, df, spec.oracle, name=name)
