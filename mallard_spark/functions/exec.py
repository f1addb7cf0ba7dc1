"""Execution helpers: materialization barriers.

Multi-branch operators (LSH band join + signature join-back) consume
the same expensive intermediate from several self-join branches.
Three ways to avoid recomputing it, measured at sf0.1 on the minhash
pipeline (branches: bands a/b + ma + mb):

- nothing:           92 s  (aliasing gives each branch fresh expr IDs,
                            so ReuseExchange can't dedupe the subplan)
- persist()/localCheckpoint: 60-28 s (no size stats → every branch
                            join becomes a 32-partition sort-merge)
- parquet barrier:    ~6 s  (stats visible → joins go broadcast,
                            AQE coalesces tiny shuffles)

The parquet barrier is also the only variant that behaves at 100 TB:
it is exactly the "checkpoint intermediate to storage" step a real
pipeline takes before a fan-out, and it feeds the optimizer real
statistics instead of unknowns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


def materialize(df: DataFrame, name: str, n_partitions: int | None = None) -> DataFrame:
    """Write ``df`` to a session-temp parquet and read it back.

    Fixed path per ``name`` (overwritten on re-invocation, so repeated
    driver runs don't grow /tmp). Not safe for two concurrent runs of
    the SAME operator in one session — fine for the driver contract,
    which runs queries serially.
    """
    base = os.path.join(tempfile.gettempdir(), "mallard_spark_materialize")
    path = os.path.join(base, name)
    w = df.coalesce(n_partitions) if n_partitions else df
    w.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
