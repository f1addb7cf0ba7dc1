"""Paired A/B for knn_bruteforce scoring (round 16, VERDICT r15 #3).

Variants:
  cur   — cosine6(vp, vc): THREE interpreted aggregate(zip_with) folds
          per (probe, corpus) pair.
  norms — self-dots computed once per ROW (probe side: 5 folds,
          corpus side: N folds); per-pair cost is ONE cross-dot fold.
  unrl  — norms + the guarded unrolled codegen cross-dot (dot64).

All three produce bit-identical cos_sim (cosine6_norms carries the
exact fold values; dot64's guard reproduces the fold value — the
r15 #11/#12 arguments). ABAB interleaved best-of-N, noop sink.

Usage: python tools/ab_knnbf.py [--dir DIR] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_PROBES = 5
TOP_K = 5


def topk(sims):
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def build(emb, variant):
    from mallard_spark.functions.vectors import (
        as_double, cosine6, cosine6_norms, dot,
    )

    if variant == "cur":
        probes = emb.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("probe_id"), as_double("embedding").alias("vp")
        )
        corpus = emb.select(
            F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("vc")
        )
        sims = corpus.join(
            F.broadcast(probes), F.col("neighbor_id") != F.col("probe_id")
        ).select(
            "probe_id", "neighbor_id",
            cosine6(F.col("vp"), F.col("vc")).alias("cos_sim"),
        )
        return topk(sims)

    unroll = variant == "unrl"
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        as_double("embedding").alias("vp"),
    ).withColumn("np2", dot(F.col("vp"), F.col("vp")))
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("vc"),
    ).withColumn("nc2", dot(F.col("vc"), F.col("vc")))
    sims = corpus.join(
        F.broadcast(probes), F.col("neighbor_id") != F.col("probe_id")
    ).select(
        "probe_id", "neighbor_id",
        cosine6_norms(
            F.col("vp"), F.col("vc"), F.col("np2"), F.col("nc2"),
            unroll=unroll,
        ).alias("cos_sim"),
    )
    return topk(sims)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/mallard_sf10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--variants", default="cur,norms,unrl")
    args = ap.parse_args()

    from mallard_spark.session import get_spark
    from mallard_spark.sources.readers import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_knnbf", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.conf.set("spark.mallard.scanCache", "memory")
    emb = load_table(spark, args.dir, "embeddings")
    variants = args.variants.split(",")

    # equality gate first: every variant must produce identical rows
    base = sorted(build(emb, variants[0]).collect())
    for v in variants[1:]:
        rows = sorted(build(emb, v).collect())
        assert rows == base, f"{v} differs from {variants[0]}"
    print(f"# equality: {len(base)} rows identical across {variants}")

    for v in variants:  # warmup
        build(emb, v).write.format("noop").mode("overwrite").save()
    best = {v: float("inf") for v in variants}
    for i in range(args.runs):
        for v in variants:
            t0 = time.perf_counter()
            build(emb, v).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[v] = min(best[v], dt)
            print(f"  run{i} {v}: {dt:.3f}s")
    print("# best:", {v: round(b, 3) for v, b in best.items()})


if __name__ == "__main__":
    main()
