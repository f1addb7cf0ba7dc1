"""Scaled headline bench (synthetic sf1 / sf10) with a SAME-SESSION
DuckDB baseline (round 9 judge item #2; round 10 adds --factor 100).

At sf0.1, 17 of the 25 headline queries are scheduler-floor-bound
(sub-second scans), so per-query DuckDB ratios measure the fixed
per-job floor, not the plans. This harness re-runs the comparison at
10× / 100× the data — where the floor amortizes — on a salted replica
built by the scale_sweep machinery (documents token-salted so dup
density stays fixed; lineitem/orders/embeddings replicated with
offset keys; events replicated with offset event/user ids so the
sessionize/asof structure replicates instead of densifying).

Both engines run the identical workload under a SYMMETRIC protocol
(round 10, ADVICE r9): Spark runs the registry DataFrame plans (noop
sink), DuckDB 1.0 (all cores) runs the registry's own oracle SQL over
the same parquet — each engine gets one untimed warmup execution and
the same best-of-N repeats (--duck-runs defaults to --runs).

Usage:
    python tools/bench_sf1.py [--factor 10|100] \
        [--workdir /tmp/mallard_sf{factor/10}] [--runs 2] \
        [--out BENCH10X_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

KEY_OFFSET = 100_000_000
SRC = "/root/testdata/sf0.1"


def build_scaled_full(spark, dst: str, factor: int) -> None:
    from tools.scale_sweep import build_scaled

    build_scaled(spark, SRC, dst, factor)
    # scale_sweep copies events verbatim (its ops don't read them);
    # the headline's event queries need the corpus to actually grow:
    # new users with the same temporal profile, so sessionization and
    # as-of structure REPLICATES rather than densifying
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(r * KEY_OFFSET))
        .withColumn("user_id", F.col("user_id") + F.lit(r * KEY_OFFSET))
        for r in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(dst, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10,
                    help="replication factor over sf0.1 (10 → sf1, "
                    "100 → sf10)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--duck-runs", type=int, default=None,
                    help="DuckDB repeats (default: same as --runs — "
                    "a symmetric protocol)")
    ap.add_argument("--phase", choices=("both", "spark", "duckdb"),
                    default="both",
                    help="run one engine at a time (each phase writes "
                    "{out}.{phase}; 'both'/'duckdb' merges)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of HEADLINE names")
    ap.add_argument("--scan-cache", action="store_true",
                    help="serving-model protocol (round 11): Spark "
                    "pins decoded scans (spark.mallard.scanCache) AND "
                    "DuckDB loads NATIVE TABLES instead of parquet "
                    "views — the reference's own serving shape "
                    "(flight_server loads DuckDB tables once, serves "
                    "from the buffer pool). Symmetric: both engines "
                    "query their cached native representation.")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.duck_runs is None:
        args.duck_runs = args.runs

    from bench import HEADLINE

    from mallard_spark.registry import load_all

    specs = load_all()
    sf = round(0.1 * args.factor, 3)
    dst = args.workdir or f"/tmp/mallard_sf{sf:g}".replace(".", "_")
    out = args.out or "BENCH10X.json"
    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else list(HEADLINE)
    )

    spark_secs: dict[str, float] = {}
    if args.phase in ("both", "spark"):
        from mallard_spark.session import get_spark

        cpus = os.environ.get(
            "SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)
        )
        spark = get_spark(
            app_name="mallard_bench_sf1",
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
        if args.scan_cache:
            spark.conf.set("spark.mallard.scanCache", "memory")
        if not os.path.exists(os.path.join(dst, "events.parquet")):
            print(f"# building {args.factor}x replica at {dst} ...",
                  file=sys.stderr)
            build_scaled_full(spark, dst, args.factor)

        # phase probe (round 11 — same control as bench.py): the VM
        # has page-fault-servicing phases where identical plans run
        # 2-10x slower; record the fixed control so a degraded-phase
        # sample is labeled in the artifact
        probe_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            specs["q1_pricing_summary"].fn(
                spark, SRC
            ).write.format("noop").mode("overwrite").save()
            probe_best = min(probe_best, time.perf_counter() - t0)
        with open(out + ".probe", "w") as f:
            json.dump({
                "control": "q1_pricing_summary@sf0.1 best-of-3",
                "sec": round(probe_best, 3),
                "calm_threshold_sec": 1.5,
                "phase": "calm" if probe_best < 1.5 else "degraded",
            }, f)

        # one untimed warmup run of the FIRST benched query at the
        # BENCH scale (JVM codegen + Python workers + page cache) —
        # DuckDB gets the mirror-image warmup below
        specs[names[0]].fn(spark, dst).write.format("noop").mode(
            "overwrite"
        ).save()

        for name in names:
            fn = specs[name].fn
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, dst).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            spark_secs[name] = round(best, 3)
            print(f"# spark {name}: {spark_secs[name]}", file=sys.stderr)
        with open(out + ".spark", "w") as f:
            json.dump(spark_secs, f)
    if args.phase == "spark":
        return
    if not spark_secs:
        with open(out + ".spark") as f:
            spark_secs = json.load(f)

    import duckdb

    duck_secs: dict[str, float] = {}
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            raise SystemExit(
                f"{p} missing — run the spark phase (which builds the "
                f"scaled replica) first; benchmarking DuckDB on the 1x "
                f"source against Spark's scaled timings would fabricate "
                f"the ratio"
            )
        if os.path.isdir(p):  # Spark writes a directory of part files
            p = os.path.join(p, "*.parquet")
        if args.scan_cache:
            # serving-model protocol: native DuckDB tables, served
            # from its buffer pool — the mirror image of Spark's
            # pinned decoded scans (and the reference's own layout)
            con.execute(
                f"CREATE OR REPLACE TABLE {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
        else:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
    warmed = False
    for name in names:
        sql = specs[name].oracle
        if not sql:
            continue
        if not warmed:  # symmetric untimed warmup (ADVICE r9)
            con.execute(sql).fetchall()
            warmed = True
        best = float("inf")
        for _ in range(args.duck_runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck_secs[name] = round(best, 3)
        print(f"# duckdb {name}: {duck_secs[name]}", file=sys.stderr)

    ratios = {
        n: round(spark_secs[n] / duck_secs[n], 2)
        for n in duck_secs
        if duck_secs[n] > 0 and n in spark_secs
    }
    common = [n for n in duck_secs if n in spark_secs]
    duck_common = sum(duck_secs[n] for n in common)
    result = {
        "metric": f"headline_queries_total_runtime_sf{sf:g}",
        "sf": sf,
        "factor": args.factor,
        "src": SRC,
        "protocol": (
            "native-cached (Spark pinned scans vs DuckDB native "
            "tables — the reference's serving model)"
            if args.scan_cache else
            "parquet-scan (both engines re-read parquet per run)"
        ),
        "phase_probe": (
            json.load(open(out + ".probe"))
            if os.path.exists(out + ".probe") else None
        ),
        "spark_total": round(sum(spark_secs.values()), 3),
        "duckdb_total": round(sum(duck_secs.values()), 3),
        # None when the two phases measured disjoint query sets (e.g.
        # a stale {out}.spark from another subset) — a ratio of
        # mismatched workloads would be fabricated
        "ratio_total": (
            round(sum(spark_secs[n] for n in common) / duck_common, 3)
            if duck_common
            else None
        ),
        "spark": spark_secs,
        "duckdb": duck_secs,
        "ratio": ratios,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
