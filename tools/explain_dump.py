#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/r15/.

Usage:
  python tools/explain_dump.py before q1_pricing_summary q3_shipping_priority ...
  python tools/explain_dump.py after --all-headline

Writes plans/r15/<query>_<tag>.txt. Streaming queries are skipped
(no batch plan to explain); iterative queries explain their FINAL
composed DataFrame (the loop's materialized rounds run at build
time, same as the bench clock).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q3_bucketed",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_customer",
    "running_totals",
    "ev_hourly_agg",
    "ev_sessionize",
    "ev_asof_join",
    "ev_zscore_anomalies",
    "quantiles_by_flag",
    "text_token_stats",
    "text_chunking",
    "decontaminate_overlap",
    "decontaminate_bloom",
    "mix_sources",
    "dedup_minhash_lsh",
    "dedup_substring_windows",
    "url_canonicalize_dedup",
    "quality_perplexity_proxy",
    "knn_bruteforce",
    "knn_lsh_multiprobe",
    "knn_ivfpq",
    "exchange_add_processed",
    "bpe_train_merges",
    "knn_pq_trained",
    "mm_phash_dedup",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all-headline"] or not names:
        names = HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from mallard_spark.registry import load_all
    from mallard_spark.session import get_spark

    spark = get_spark(
        app_name="mallard_explain",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set(
        "spark.mallard.scanCache",
        os.environ.get("SPARK_GRAFT_SCAN_CACHE", "memory"),
    )
    specs = load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = specs[name]
        try:
            df = spec.fn(spark, sf_dir)
        except Exception as e:  # streaming queries raise on batch explain
            print(f"{name}: SKIP ({e})", file=sys.stderr)
            continue
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
