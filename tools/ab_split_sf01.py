#!/usr/bin/env python
"""Paired A/B of spark.sql.files.maxPartitionBytes at sf0.1
(round 13, VERDICT r12 task #4).

The driver's BENCH_r12 headline (23.67 s) sat above the documented
18-22.5 s session band while the same-code builder session read
19.25 s; the candidate causes are VM phase noise vs the round-12
32 MB scan-split change. This interleaves the TWO configs inside ONE
session (A=32 MB, B=128 MB: A B A B A B), replicating bench.py's
protocol per pass — scan-cache=memory, per-query best-of-2, noop
sink — and clearing the table/persist cache between passes so each
pass re-decodes and re-pins under its own split size (the persisted
relation's partition count derives from the initial scan splits, so
a stale cache would hide the config entirely).

Within-session interleaved pairs are the only reliable evidence on
this VM (cross-session totals swing ±30% on identical code —
PLANS.md round 12).

Prints one JSON line: per-pass totals, best-of-3 per config, and the
phase probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
CONFIGS = {"A_32MB": "33554432", "B_128MB": "134217728"}
ROUNDS = 3


def _clear_scan_cache(spark) -> None:
    from mallard_spark.sources import readers

    per_session = readers._TABLE_CACHE.get(spark, {})
    for df in per_session.values():
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass
    per_session.clear()
    spark.catalog.clearCache()


def main() -> None:
    from mallard_spark.registry import load_all
    from mallard_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    spark = get_spark(
        app_name="mallard_ab_split",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.mallard.scanCache", "memory")
    specs = load_all()

    # warmup (same as bench.py)
    specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    specs["exchange_add_processed"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    probe_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        specs["q1_pricing_summary"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        probe_best = min(probe_best, time.perf_counter() - t0)
    phase = "calm" if probe_best < 1.5 else "degraded"
    print(f"# phase probe {probe_best:.3f}s ({phase})", file=sys.stderr)

    passes: list[dict] = []
    for rnd in range(ROUNDS):
        for label, nbytes in CONFIGS.items():
            spark.conf.set("spark.sql.files.maxPartitionBytes", nbytes)
            _clear_scan_cache(spark)
            per_query: dict[str, float] = {}
            t_pass = time.perf_counter()
            for name in HEADLINE:
                fn = specs[name].fn
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                per_query[name] = round(best, 3)
            passes.append(
                {
                    "round": rnd,
                    "config": label,
                    "total": round(sum(per_query.values()), 3),
                    "wall": round(time.perf_counter() - t_pass, 1),
                    "queries": per_query,
                }
            )
            print(
                f"# round {rnd} {label}: total "
                f"{passes[-1]['total']}s", file=sys.stderr,
            )

    best = {
        label: min(p["total"] for p in passes if p["config"] == label)
        for label in CONFIGS
    }
    print(
        json.dumps(
            {
                "metric": "ab_maxPartitionBytes_sf0.1",
                "phase_probe": {"sec": round(probe_best, 3), "phase": phase},
                "best_of_3_totals": best,
                "passes": [
                    {k: v for k, v in p.items() if k != "queries"}
                    for p in passes
                ],
                "per_query_best": {
                    label: {
                        q: min(
                            p["queries"][q]
                            for p in passes
                            if p["config"] == label
                        )
                        for q in HEADLINE
                    }
                    for label in CONFIGS
                },
            }
        )
    )


if __name__ == "__main__":
    main()
