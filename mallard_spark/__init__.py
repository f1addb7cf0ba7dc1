"""mallard_spark — a PySpark-native analytics + data-exchange engine.

Re-expresses the capabilities of TFMV/Mallard (DuckDB↔DuckDB data
exchange over Arrow Flight; see /root/reference) on Apache Spark:
the exchange API (put/get/transfer/exchange) becomes a thin facade
over the Spark catalog and Arrow-batched ``mapInPandas`` transforms,
and the query surface is the full Spark SQL / DataFrame engine plus
a library of OLAP, time-series, dedup, similarity, and text
operators designed for 100 TB scale.
"""

from mallard_spark.engine import MallardEngine
from mallard_spark.session import _export_pythonpath, get_spark

_export_pythonpath()  # workers must be able to import our UDF closures

__all__ = [
    "ClientConfig",
    "DataOperations",
    "FlightClientManager",
    "MallardEngine",
    "get_spark",
]
__version__ = "0.1.0"

_CLIENT_EXPORTS = {"ClientConfig", "DataOperations", "FlightClientManager"}


def __getattr__(name: str):
    # Lazy client re-export (PEP 562): the client pulls in
    # pyarrow.flight/gRPC, which every Spark Python WORKER would
    # otherwise pay on `import mallard_spark` when unpickling UDF
    # closures — a per-worker-launch cost for a module workers never
    # use.
    if name in _CLIENT_EXPORTS:
        from mallard_spark import client

        return getattr(client, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
