#!/usr/bin/env python
"""Paired interleaved A/B: per-candidate cosine as 3 interpreted HOF
folds (cosine6) vs 1 fold + precomputed self-dots from the signature
pass (cosine6_norms), on the knn_graph-shaped corpus self-join at
sf0.1 (round 15, change #11).

Both plans are built in ONE session from the same `_lsh_buckets`
output (which now carries `nd`); A simply ignores the column, which
is what the pre-change plan did modulo a projected-away field. Noop
sink, A B A B A B, best-of-3 per side, with the standard calm probe.

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

    from mallard_spark.functions.vectors import as_double, cosine6, cosine6_norms
    from mallard_spark.operators.similarity import KG_PLANES, KG_TABLES, _lsh_buckets
    from mallard_spark.session import get_spark
    from mallard_spark.sources.readers import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    spark = get_spark(app_name="ab_cosine_norms", master=f"local[{cpus}]")

    # calm probe: a trivial job, per bench protocol
    t0 = time.time()
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    probe = time.time() - t0

    emb = load_table(spark, SF_DIR, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
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

    def build(form: str):
        cos = (
            cosine6(F.col("v"), F.col("vn"))
            if form == "A_3fold"
            else cosine6_norms(F.col("v"), F.col("vn"), F.col("nd"), F.col("ndn"))
        )
        return (
            joined.select(
                F.col("vec_id").alias("probe_id"), "neighbor_id", cos.alias("cos_sim")
            )
            .groupBy("probe_id", "neighbor_id")
            .agg(F.max("cos_sim").alias("cos_sim"))
        )

    times: dict[str, list[float]] = {"A_3fold": [], "B_1fold": []}
    for _ in range(ROUNDS):
        for form in ("A_3fold", "B_1fold"):
            df = build(form)
            spark.sparkContext.setJobDescription(f"ab_cosine_norms {form}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[form].append(round(time.time() - t0, 3))

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
