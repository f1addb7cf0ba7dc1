"""Query registry — the single source of truth for §2 coverage.

Every operator/query registers itself here with (a) a Spark builder
``(spark, sf_dir) -> DataFrame`` and (b) an optional DuckDB oracle
SQL string over the same parquet tables. ``__spark_entry__``'s
``queries()`` / ``oracle_sql()`` are thin views over this dict, and
the oracle test suite iterates it, so a query cannot be "declared"
without being tested.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every plans/operators module so registrations run."""
    import mallard_spark.operators.dedup  # noqa: F401
    import mallard_spark.operators.graph  # noqa: F401
    import mallard_spark.operators.layout  # noqa: F401
    import mallard_spark.operators.llm  # noqa: F401
    import mallard_spark.operators.merge  # noqa: F401
    import mallard_spark.operators.quality  # noqa: F401
    import mallard_spark.operators.sampling  # noqa: F401
    import mallard_spark.operators.similarity  # noqa: F401
    import mallard_spark.operators.sketches  # noqa: F401
    import mallard_spark.operators.text  # noqa: F401
    import mallard_spark.operators.web  # noqa: F401
    import mallard_spark.plans.bucketed  # noqa: F401
    import mallard_spark.plans.events  # noqa: F401
    import mallard_spark.plans.relational  # noqa: F401
    import mallard_spark.exchange  # noqa: F401
    import mallard_spark.multimodal.binary  # noqa: F401
    import mallard_spark.streaming.windows  # noqa: F401

    return REGISTRY
