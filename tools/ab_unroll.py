#!/usr/bin/env python
"""Paired interleaved A/B of interpreted HOF folds vs fixed-length
unrolled codegen expressions (round 15, guide §4.1: prefer built-in
expressions; here: prefer CODEGEN-able expression trees over
interpreted lambda folds).

Three shapes, each timed ABAB... best-of-N with the noop sink:

1. cross-dot in the LSH candidate cosine (dim 64): knn_graph-shaped
   corpus self-join, cosine6_norms with the remaining fold vs the
   64-term unrolled sum — guarded (when size==64) and unguarded.
2. _l2sq in PQ encode (dim 8): sub x broadcast codebook join,
   round(fold * 1e6) vs unrolled.
3. ADC fold (integer, PQ_M=8): element_at double-lookup chain vs
   unrolled.

All variants are bit-identical reorderings (same IEEE ops in the
same order; integers exact) — equality is asserted before timing.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from mallard_spark.functions.vectors import as_double, dot
    from mallard_spark.operators.similarity import (
        KG_PLANES,
        KG_TABLES,
        PQ_DSUB,
        PQ_M,
        PQ_SEED_HI,
        PQ_SEED_LO,
        _lsh_buckets,
    )
    from mallard_spark.session import get_spark
    from mallard_spark.sources.readers import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    spark = get_spark(app_name="ab_unroll", master=f"local[{cpus}]")

    t0 = time.time()
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    probe = time.time() - t0

    def dot_unrolled(a, b, dim):
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i] * b[i]
        return acc

    def dot_guarded(a, b, dim):
        return F.when(
            (F.size(a) == dim) & (F.size(b) == dim), dot_unrolled(a, b, dim)
        ).otherwise(dot(a, b))

    def l2_fold(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def l2_unrolled(a, b, dim):
        acc = F.lit(0.0)
        for i in range(dim):
            d = a[i] - b[i]
            acc = acc + d * d
        return acc

    def l2_guarded(a, b, dim):
        return F.when(
            (F.size(a) == dim) & (F.size(b) == dim), l2_unrolled(a, b, dim)
        ).otherwise(l2_fold(a, b))

    emb = load_table(spark, SF_DIR, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))

    # ---- shape 1: LSH candidate cosine, knn_graph self-join ----
    sigged = _lsh_buckets(vecs, n_tables=KG_TABLES, n_planes=KG_PLANES, salt="graph")
    a = sigged.select("vec_id", "v", "nd", "tbl", "bucket")
    b = sigged.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vn"),
        F.col("nd").alias("ndn"),
        "tbl",
        "bucket",
    )
    joined = a.join(b, ["tbl", "bucket"]).filter(F.col("vec_id") != F.col("neighbor_id"))

    def cos_variant(form: str):
        if form == "fold":
            cd = dot(F.col("v"), F.col("vn"))
        elif form == "guarded":
            cd = dot_guarded(F.col("v"), F.col("vn"), 64)
        else:
            cd = dot_unrolled(F.col("v"), F.col("vn"), 64)
        cos = F.round(cd / (F.sqrt("nd") * F.sqrt("ndn")), 6)
        return (
            joined.select(
                F.col("vec_id").alias("probe_id"), "neighbor_id", cos.alias("cos_sim")
            )
            .groupBy("probe_id", "neighbor_id")
            .agg(F.max("cos_sim").alias("cos_sim"))
        )

    # equality gate (fold vs guarded vs unrolled), exact
    eq = (
        cos_variant("fold")
        .withColumnRenamed("cos_sim", "c0")
        .join(cos_variant("guarded").withColumnRenamed("cos_sim", "c1"),
              ["probe_id", "neighbor_id"], "full")
        .join(cos_variant("unrolled").withColumnRenamed("cos_sim", "c2"),
              ["probe_id", "neighbor_id"], "full")
        .selectExpr(
            "sum(case when c0 = c1 and c1 = c2 then 0 else 1 end) as ne",
            "count(*) as n",
        )
        .collect()[0]
    )
    assert eq["ne"] == 0, f"cosine variants diverge: {eq}"

    # ---- shape 2: PQ encode micro distance ----
    subs_arr = F.array(*[F.slice("v", s * PQ_DSUB + 1, PQ_DSUB) for s in range(PQ_M)])
    cb = (
        vecs.filter((F.col("vec_id") >= PQ_SEED_LO) & (F.col("vec_id") < PQ_SEED_HI))
        .select(
            (F.col("vec_id") - PQ_SEED_LO).alias("cid"),
            F.posexplode(subs_arr).alias("s", "code"),
        )
        .select("s", "cid", "code")
    )
    sub = vecs.select("vec_id", F.posexplode(subs_arr).alias("s", "sub"))
    encj = sub.join(F.broadcast(cb), "s")

    def enc_variant(form: str):
        if form == "fold":
            m = l2_fold(F.col("sub"), F.col("code"))
        elif form == "guarded":
            m = l2_guarded(F.col("sub"), F.col("code"), PQ_DSUB)
        else:
            m = l2_unrolled(F.col("sub"), F.col("code"), PQ_DSUB)
        micro = F.round(m * 1_000_000).cast("long")
        return (
            encj.select("vec_id", "s", (micro * 100 + F.col("cid")).alias("comb"))
            .groupBy("vec_id", "s")
            .agg(F.min("comb").alias("comb"))
        )

    eq2 = (
        enc_variant("fold").withColumnRenamed("comb", "c0")
        .join(enc_variant("guarded").withColumnRenamed("comb", "c1"), ["vec_id", "s"], "full")
        .join(enc_variant("unrolled").withColumnRenamed("comb", "c2"), ["vec_id", "s"], "full")
        .selectExpr("sum(case when c0 = c1 and c1 = c2 then 0 else 1 end) as ne")
        .collect()[0]
    )
    assert eq2["ne"] == 0, f"l2 variants diverge: {eq2}"

    # ---- timings ----
    times: dict[str, list[float]] = {}
    for _ in range(ROUNDS):
        for label, df in (
            ("cos_fold", cos_variant("fold")),
            ("cos_guarded", cos_variant("guarded")),
            ("cos_unrolled", cos_variant("unrolled")),
            ("enc_fold", enc_variant("fold")),
            ("enc_guarded", enc_variant("guarded")),
            ("enc_unrolled", enc_variant("unrolled")),
        ):
            spark.sparkContext.setJobDescription(f"ab_unroll {label}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.setdefault(label, []).append(round(time.time() - t0, 3))

    print(
        json.dumps(
            {
                "probe": round(probe, 3),
                "sf_dir": SF_DIR,
                "runs": times,
                "best": {k: min(v) for k, v in times.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
