"""Paired A/B: decimal-cast ulong vs pure-FP rint ulong (round 16).

The per-row unscaled-cents conversion `(CAST(x AS DECIMAL(p,2)) *
100).CAST(long)` allocates a JVM Decimal per row per column; on the
2-decimal money doubles of this schema the same exact integer is
`CAST(rint(x * 100) AS BIGINT)` — one fused FP instruction, no
allocation (see fixedpoint.ulong_fp for the exactness argument).

This tool (a) proves per-row equality of the two expressions over
every money column at the given data dir (count of null-safe
mismatches must be 0), and (b) times the q1 aggregate with each
form, ABAB interleaved best-of-N, noop sink.

Usage: python tools/ab_ulong.py [--dir /tmp/mallard_sf10] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

MONEY_COLS = [
    ("lineitem", "l_quantity", 12, 2),
    ("lineitem", "l_extendedprice", 12, 2),
    ("lineitem", "l_discount", 4, 2),
    ("lineitem", "l_tax", 4, 2),
    ("orders", "o_totalprice", 12, 2),
    ("events", "value", 12, 2),
]


def ulong_dec(col, prec, scale):
    return (F.col(col).cast(f"decimal({prec},{scale})") * (10 ** scale)).cast("long")


def ulong_fp(col, prec, scale):
    # the shipped form (fixedpoint.ulong): HALF_UP away from zero
    u = F.col(col) * (10 ** scale)
    return (F.signum(u) * F.floor(F.abs(u) + F.lit(0.5))).cast("long")


def q1_agg(df, ul):
    """q1's fx_two_phase shape with a pluggable ulong."""
    urev = ul("l_extendedprice", 12, 2) * (100 - ul("l_discount", 4, 2))
    flt = df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    partial = flt.groupBy(
        "l_returnflag", "l_linestatus",
        F.spark_partition_id().alias("__pid"),
        (F.monotonically_increasing_id() % 8).alias("__sub"),
    ).agg(
        F.sum(ul("l_quantity", 12, 2)).alias("s1"),
        F.sum(ul("l_extendedprice", 12, 2)).alias("s2"),
        F.sum(urev).alias("s3"),
        F.sum(urev * (100 + ul("l_tax", 4, 2))).alias("s4"),
        F.sum(ul("l_discount", 4, 2)).alias("s5"),
        F.count("*").alias("c"),
    )
    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        *[F.sum(F.col(s).cast("decimal(38,0)")).alias(s) for s in
          ("s1", "s2", "s3", "s4", "s5")],
        F.sum("c").alias("c"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/mallard_sf10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    from mallard_spark.session import get_spark
    from mallard_spark.sources.readers import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_ulong", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.conf.set("spark.mallard.scanCache", "memory")

    if not args.skip_equality:
        print("# per-row equality (null-safe) over", args.dir)
        for tbl, col, p, s in MONEY_COLS:
            path = os.path.join(args.dir, f"{tbl}.parquet")
            if not os.path.exists(path):
                print(f"  {tbl}.{col}: SKIP (no table)")
                continue
            df = spark.read.parquet(path)
            bad = df.filter(
                ~ulong_dec(col, p, s).eqNullSafe(ulong_fp(col, p, s))
            ).count()
            n = df.count()
            print(f"  {tbl}.{col}: rows={n} mismatches={bad}")
            assert bad == 0, f"{tbl}.{col} mismatch"

    li = load_table(spark, args.dir, "lineitem")
    # warmup both
    for ul in (ulong_dec, ulong_fp):
        q1_agg(li, ul).write.format("noop").mode("overwrite").save()

    best = {"dec": float("inf"), "fp": float("inf")}
    for i in range(args.runs):
        for name, ul in (("dec", ulong_dec), ("fp", ulong_fp)):
            t0 = time.perf_counter()
            q1_agg(li, ul).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  run{i} {name}: {dt:.3f}s")
    print(f"# best: dec={best['dec']:.3f}s fp={best['fp']:.3f}s "
          f"speedup={best['dec'] / best['fp']:.2f}x")


if __name__ == "__main__":
    main()
