"""Synthetic 1x/10x/100x corpus scale-up harness — the PLANS.md
"Measured scaling sweep" generator, persisted (round-5 VERDICT #7
asked the sweep to cover the graph/CC family; round 5 ran it from an
ad-hoc session, so this makes it repeatable).

Model: the CORPUS grows, the derived structures keep their identity.

- ``documents`` — per-replica TOKEN salting (every token gets a
  replica tag), so each replica preserves the original's internal
  near-dup structure while replicas share no shingles — dup DENSITY
  stays fixed as the corpus grows (the negative control in PLANS.md
  shows why suffix-only salting would instead measure the output
  explosion of a 99%-dup corpus). Replica 0 is the original.
- ``lineitem``/``orders`` — replicated with offset order keys: new
  orders, same parts/customers/suppliers, so the co-purchase and
  nation-trade graphs keep their node sets while edge SUPPORT and
  scan mass grow linearly (more data about the same graph).
- dimensions (customer/supplier/part/nation/region) copied as-is;
  ``embeddings`` replicated with offset ids.

Usage:
    python tools/scale_sweep.py --ops dedup_clusters,graph_pagerank \
        [--factors 1,10,100] [--src /root/testdata/sf0.1]

Prints one markdown row per (op, factor): wall seconds (best of 2)
and output row count.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

KEY_OFFSET = 100_000_000  # per-replica key shift (beyond any sf key)


def build_scaled(spark, src: str, dst: str, n: int) -> None:
    """Materialize an n-times scaled copy of the sweep tables."""
    os.makedirs(dst, exist_ok=True)
    for name in ("customer", "supplier", "part", "nation", "region"):
        p = os.path.join(src, f"{name}.parquet")
        if os.path.exists(p):
            shutil.copy(p, os.path.join(dst, f"{name}.parquet"))

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    reps = []
    for r in range(n):
        rep = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * KEY_OFFSET)
        )
        if r > 0:  # salt every token; replica 0 stays the original
            rep = rep.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{r}")
            )
        reps.append(rep)
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    out.write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))

    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        t = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        parts = [
            t.withColumn(key, F.col(key) + F.lit(r * KEY_OFFSET))
            for r in range(n)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    id_col = "id" if "id" in emb.columns else emb.columns[0]
    parts = [
        emb.withColumn(id_col, F.col(id_col) + F.lit(r * KEY_OFFSET))
        for r in range(n)
    ]
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))

    ev = os.path.join(src, "events.parquet")
    if os.path.exists(ev):
        shutil.copy(ev, os.path.join(dst, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", required=True,
                    help="comma-separated registry query names")
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/mallard_sweep")
    ap.add_argument("--runs", type=int, default=2, help="best-of-N")
    args = ap.parse_args()

    from mallard_spark import get_spark
    from mallard_spark.registry import load_all

    specs = load_all()
    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    unknown = [o for o in ops if o not in specs]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")
    factors = [int(f) for f in args.factors.split(",")]

    spark = get_spark()
    dirs: dict[int, str] = {}
    for n in factors:
        d = args.src if n == 1 else os.path.join(args.workdir, f"{n}x")
        if n > 1 and not os.path.exists(
            os.path.join(d, "documents.parquet")
        ):
            print(f"# building {n}x at {d} ...", file=sys.stderr)
            build_scaled(spark, args.src, d, n)
        dirs[n] = d

    print("| operator | " + " | ".join(f"{n}x" for n in factors) + " |")
    print("| --- |" + " --- |" * len(factors))
    for op in ops:
        cells = []
        for n in factors:
            best, rows = None, None
            for _ in range(args.runs):
                t0 = time.time()
                rows = specs[op].fn(spark, dirs[n]).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            cells.append(f"{best:.2f} s ({rows} rows)")
        print(f"| {op} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
