"""MallardEngine — Spark-native re-expression of Mallard's Flight API.

The reference (/root/reference) runs two DuckDB instances behind
Arrow Flight and exposes four verbs (see demo.py:94-175):

- GET      (``do_get`` with a SQL ticket → Arrow stream)
- PUT      (``do_put`` Arrow stream → named table)
- TRANSFER (GET from one server, PUT to the other)
- EXCHANGE (bidirectional stream through a registered transform,
            flight_server.py MyStreamingExchanger)

On Spark the "server" is a catalog namespace inside one
SparkSession: tables are registered views, GET is ``spark.sql``,
PUT accepts Arrow/pandas/Spark data, TRANSFER re-registers (or
round-trips through parquet to model the wire), and EXCHANGE is an
Arrow-batched ``mapInPandas`` transform — the same
batch-iterator-in/batch-iterator-out contract as a Flight exchanger,
but executed in parallel across executors instead of on one server
thread, which is what makes it hold up at 100 TB.
"""

from __future__ import annotations

import time
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession

from mallard_spark.exchange import Exchanger

if TYPE_CHECKING:
    import pyarrow as pa


class MallardEngine:
    """One Mallard 'server': a namespaced table catalog + exchange registry."""

    def __init__(self, spark: SparkSession, namespace: str = "server1"):
        self.spark = spark
        self.namespace = namespace
        self._tables: dict[str, DataFrame] = {}
        self._exchangers: dict[str, Exchanger] = {}

    # -- catalog ------------------------------------------------------
    def _qualified(self, name: str) -> str:
        return f"{self.namespace}__{name}"

    def put(self, name: str, data: Any) -> int:
        """PUT: register arrow Table / pandas / Spark DataFrame as ``name``.

        Parity: demo.py:108-117 (create_table via do_put).
        Returns the row count like the reference logs it.
        """
        df = self._to_df(data)
        df.createOrReplaceTempView(self._qualified(name))
        self._tables[name] = df
        return df.count()

    def _to_df(self, data: Any) -> DataFrame:
        if isinstance(data, DataFrame):
            return data
        try:
            import pyarrow as pa

            if isinstance(data, pa.Table):
                return self.spark.createDataFrame(data.to_pandas())
        except ImportError:  # pragma: no cover
            pass
        return self.spark.createDataFrame(data)  # pandas / rows

    def table(self, name: str) -> DataFrame:
        return self.spark.table(self._qualified(name))

    def list_tables(self) -> list[str]:
        return sorted(self._tables)

    def drop(self, name: str) -> None:
        self.spark.catalog.dropTempView(self._qualified(name))
        self._tables.pop(name, None)

    # -- GET ----------------------------------------------------------
    def sql(self, sql: str) -> DataFrame:
        """GET: run SQL against this namespace's tables.

        Parity: demo.py:103-106 (execute_query). Unqualified table
        names are rewritten to the namespaced views so the same SQL
        a Mallard client sends works unchanged.
        """
        out = sql
        for name in self._tables:
            out = _replace_table_ref(out, name, self._qualified(name))
        return self.spark.sql(out)

    def get_arrow(self, sql: str) -> "pa.Table":
        """GET returning an Arrow table (the reference's wire format)."""
        import pyarrow as pa

        pdf = self.sql(sql).toPandas()
        return pa.Table.from_pandas(pdf, preserve_index=False)

    # -- TRANSFER -----------------------------------------------------
    def transfer(
        self, other: "MallardEngine", name: str, via_path: str | None = None
    ) -> tuple[int, float]:
        """TRANSFER ``name`` to another engine. Parity: demo.py:127-151.

        ``via_path`` materializes through parquet (modelling the wire /
        a cross-cluster handoff); default hands the DataFrame over
        zero-copy within the session.
        """
        start = time.time()
        df = self.table(name)
        if via_path:
            df.write.mode("overwrite").parquet(via_path)
            df = self.spark.read.parquet(via_path)
        rows = other.put(name, df)
        return rows, time.time() - start

    # -- EXCHANGE -----------------------------------------------------
    def register_exchanger(self, exchanger: Exchanger) -> None:
        """Parity: flight_server.py AddExchangeAction (runtime registry)."""
        if not exchanger.command:
            raise ValueError("exchanger must define a command")
        self._exchangers[exchanger.command] = exchanger

    def exchange(self, command: str, data: Any) -> DataFrame:
        """EXCHANGE: stream ``data`` through the registered transform.

        Parity: demo.py:153-175 / flight_server.py MyStreamingExchanger,
        as a distributed Arrow-batch pipeline (mapInPandas).
        """
        if command not in self._exchangers:
            raise KeyError(f"no exchanger registered for command {command!r}")
        return self._exchangers[command].apply(self._to_df(data))


def _replace_table_ref(sql: str, name: str, qualified: str) -> str:
    """Replace whole-word table references at identifier positions.

    Walks the SQL with a lexer that skips single-quoted string
    literals, double-quoted / backtick-quoted identifiers, and
    ``--`` / ``/* */`` comments, so a table name appearing inside a
    literal (``WHERE note = 'orders pending'``) is never rewritten.

    Known limitation (documented for the do_get wire path): a bare
    COLUMN reference that happens to share the table's name cannot be
    distinguished from a table reference without a full SQL parser;
    clients should qualify such columns (``t.orders``), which this
    rewriter leaves untouched.
    """
    import re

    word = re.compile(rf"(?<![\w.]){re.escape(name)}(?![\w.])")
    out: list[str] = []
    i, n = 0, len(sql)
    seg_start = 0

    def flush(end: int) -> None:
        seg = sql[seg_start:end]
        out.append(word.sub(qualified, seg))

    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            flush(i)
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if ch == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2  # escaped '' inside a string literal
                        continue
                    j += 1
                    break
                j += 1
            else:
                j = n
            out.append(sql[i:j])
            i = seg_start = j
        elif ch == "-" and sql[i : i + 2] == "--":
            flush(i)
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out.append(sql[i:j])
            i = seg_start = j
        elif ch == "/" and sql[i : i + 2] == "/*":
            flush(i)
            j = sql.find("*/", i)
            j = n if j < 0 else j + 2
            out.append(sql[i:j])
            i = seg_start = j
        else:
            i += 1
    flush(n)
    return "".join(out)
