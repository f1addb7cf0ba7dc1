"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are views over
``mallard_spark.registry`` — every operator in SURVEY.md §2 registers
itself there with its Spark builder and (where SQL-expressible) its
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mallard_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    specs = load_all()
    return specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
