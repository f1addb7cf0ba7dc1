"""MallardEngine parity tests — mirrors the reference demo's flow
(connect → put → get → transfer → exchange → verify counts),
demo.py:508-540 of /root/reference."""

import pyarrow as pa
import pytest

from mallard_spark.engine import MallardEngine
from mallard_spark.exchange import AddProcessedExchanger, Exchanger


@pytest.fixture()
def engines(spark):
    return MallardEngine(spark, "t_server1"), MallardEngine(spark, "t_server2")


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "name": ["Alice", "Bob", "Charlie", "Dave", "Eve"],
            "value": [10.5, 20.0, 15.5, 30.0, 25.5],
        }
    )


def test_put_and_get(engines):
    eng1, _ = engines
    assert eng1.put("simple_table", _sample_table()) == 5
    out = eng1.sql("SELECT * FROM simple_table WHERE value > 15").collect()
    assert len(out) == 4
    assert eng1.list_tables() == ["simple_table"]


def test_get_arrow_roundtrip(engines):
    eng1, _ = engines
    eng1.put("arrow_t", _sample_table())
    t = eng1.get_arrow("SELECT id, value FROM arrow_t")
    assert t.num_rows == 5
    assert set(t.column_names) == {"id", "value"}


def test_transfer(engines):
    eng1, eng2 = engines
    eng1.put("simple_table", _sample_table())
    rows, secs = eng1.transfer(eng2, "simple_table")
    assert rows == 5
    assert eng2.sql("SELECT COUNT(*) AS n FROM simple_table").collect()[0].n == 5


def test_transfer_via_parquet(engines, tmp_path):
    eng1, eng2 = engines
    eng1.put("pq_table", _sample_table())
    rows, _ = eng1.transfer(eng2, "pq_table", via_path=str(tmp_path / "wire"))
    assert rows == 5


def test_exchange_adds_processed(engines, spark):
    eng1, _ = engines
    eng1.put("ex_table", _sample_table())
    eng1.register_exchanger(AddProcessedExchanger())
    out = eng1.exchange("my_streaming_exchanger", eng1.table("ex_table"))
    rows = out.collect()
    assert len(rows) == 5
    assert all(r.processed for r in rows)


def test_exchange_unknown_command(engines):
    eng1, _ = engines
    eng1.put("x", _sample_table())
    with pytest.raises(KeyError):
        eng1.exchange("nope", eng1.table("x"))


def test_register_requires_command(engines):
    eng1, _ = engines

    class Bad(Exchanger):
        command = ""

    with pytest.raises(ValueError):
        eng1.register_exchanger(Bad())


def test_namespaces_isolated(engines):
    eng1, eng2 = engines
    eng1.put("only_in_1", _sample_table())
    assert "only_in_1" in eng1.list_tables()
    assert "only_in_1" not in eng2.list_tables()
