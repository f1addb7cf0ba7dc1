"""Flight-endpoint parity tests — the reference demo's client flow
(demo.py:94-175: connect → put → get → transfer → exchange) executed
against the Spark-backed Flight server over real gRPC."""

import pyarrow as pa
import pyarrow.flight as flight
import pytest

from mallard_spark.engine import MallardEngine
from mallard_spark.exchange import AddProcessedExchanger
from mallard_spark.flight import SparkFlightServer, serve_in_background


@pytest.fixture(scope="module")
def servers(spark):
    eng1 = MallardEngine(spark, "fl_server1")
    eng1.register_exchanger(AddProcessedExchanger())
    eng2 = MallardEngine(spark, "fl_server2")
    s1 = SparkFlightServer("grpc://localhost:0", eng1)
    s2 = SparkFlightServer("grpc://localhost:0", eng2)
    serve_in_background(s1)
    serve_in_background(s2)
    yield s1, s2
    s1.shutdown()
    s2.shutdown()


def _client(server: SparkFlightServer) -> flight.FlightClient:
    return flight.connect(f"grpc://localhost:{server.port}")


def _sample() -> pa.Table:
    return pa.table({"id": [1, 2, 3, 4, 5], "value": [10.5, 20.0, 15.5, 30.0, 25.5]})


def _put(client, name: str, table: pa.Table) -> None:
    desc = flight.FlightDescriptor.for_command(name.encode())
    writer, _ = client.do_put(desc, table.schema)
    for batch in table.to_batches():
        writer.write_batch(batch)
    writer.close()


def test_put_then_get_sql(servers):
    s1, _ = servers
    client = _client(s1)
    _put(client, "simple_table", _sample())
    reader = client.do_get(flight.Ticket(b"SELECT id, value FROM simple_table WHERE value > 15"))
    got = reader.read_all()
    assert got.num_rows == 4  # 20.0, 15.5, 30.0, 25.5
    assert set(got.column_names) == {"id", "value"}


def test_transfer_between_servers(servers):
    s1, s2 = servers
    c1, c2 = _client(s1), _client(s2)
    _put(c1, "xfer_t", _sample())
    # GET from server1, PUT to server2 — the reference's transfer loop
    reader = c1.do_get(flight.Ticket(b"SELECT * FROM xfer_t"))
    table = reader.read_all()
    _put(c2, "xfer_t", table)
    back = c2.do_get(flight.Ticket(b"SELECT COUNT(*) AS n FROM xfer_t")).read_all()
    assert back.column("n").to_pylist() == [5]


def test_exchange_adds_processed(servers):
    s1, _ = servers
    client = _client(s1)
    desc = flight.FlightDescriptor.for_command(b"my_streaming_exchanger")
    writer, reader = client.do_exchange(desc)
    data = _sample()
    writer.begin(data.schema)
    for batch in data.to_batches():
        writer.write_batch(batch)
    writer.done_writing()
    result = reader.read_all()
    writer.close()
    assert result.num_rows == 5
    assert result.column("processed").to_pylist() == [True] * 5


def test_list_flights(servers):
    s1, _ = servers
    client = _client(s1)
    _put(client, "listed_t", _sample())
    names = {fi.descriptor.command.decode() for fi in client.list_flights()}
    assert "listed_t" in names


def test_auth_rejects_bad_token(spark):
    eng = MallardEngine(spark, "fl_auth")
    eng.put("t", _sample())
    server = SparkFlightServer("grpc://localhost:0", eng, auth_token="sekret")
    serve_in_background(server)
    try:
        bad = flight.connect(f"grpc://localhost:{server.port}")
        with pytest.raises(flight.FlightUnauthenticatedError):
            bad.do_get(flight.Ticket(b"SELECT 1")).read_all()
        good = flight.connect(f"grpc://localhost:{server.port}")
        opts = flight.FlightCallOptions(headers=[(b"authorization", b"Bearer sekret")])
        out = good.do_get(flight.Ticket(b"SELECT COUNT(*) AS n FROM t"), options=opts).read_all()
        assert out.column("n").to_pylist() == [5]
    finally:
        server.shutdown()
