"""Client-API parity tests: the reference's client flow
(ClientConfig → FlightClientManager → DataOperations, demo.py:40-175)
driven against two Spark-backed servers over live gRPC."""

import pyarrow as pa
import pytest

from mallard_spark.client import ClientConfig, DataOperations, FlightClientManager
from mallard_spark.engine import MallardEngine
from mallard_spark.exchange import AddProcessedExchanger
from mallard_spark.flight import SparkFlightServer, serve_in_background


@pytest.fixture(scope="module")
def ops(spark):
    eng1 = MallardEngine(spark, "cl_server1")
    eng1.register_exchanger(AddProcessedExchanger())
    eng2 = MallardEngine(spark, "cl_server2")
    s1 = SparkFlightServer("grpc://localhost:0", eng1)
    s2 = SparkFlightServer("grpc://localhost:0", eng2)
    serve_in_background(s1)
    serve_in_background(s2)
    mgr = FlightClientManager(
        [
            ClientConfig(f"grpc://localhost:{s1.port}", "server1"),
            ClientConfig(f"grpc://localhost:{s2.port}", "server2"),
        ]
    )
    yield DataOperations(mgr)
    mgr.close_all()
    s1.shutdown()
    s2.shutdown()


def _sample() -> pa.Table:
    return pa.table({"id": [1, 2, 3, 4, 5], "value": [10.5, 20.0, 15.5, 30.0, 25.5]})


def test_client_create_query_transfer_exchange(ops):
    """The reference demo's client sequence, method for method."""
    ops.create_table("server1", "cli_t", _sample())
    out = ops.execute_query("server1", "SELECT COUNT(*) AS n FROM cli_t")
    assert out.column("n").to_pylist() == [5]

    rows, secs = ops.transfer_table("server1", "server2", "cli_t")
    assert rows == 5
    verified = ops.execute_query("server2", "SELECT COUNT(*) AS n FROM cli_t")
    assert verified.column("n").to_pylist() == [5]

    result = ops.exchange_data("server1", "my_streaming_exchanger", _sample())
    assert result.num_rows == 5
    assert all(result.column("processed").to_pylist())


def test_client_mutation_and_health(ops):
    ops.create_table("server1", "cli_mut", _sample())
    ok = ops.execute_query("server1", "DELETE FROM cli_mut WHERE value > 15")
    assert ok.column("status").to_pylist() == ["OK"]
    out = ops.execute_query("server1", "SELECT COUNT(*) AS n FROM cli_mut")
    assert out.column("n").to_pylist() == [1]
    assert ops.health_check("server1") is True


def test_client_register_exchanger_over_wire(ops):
    class ClientSideExchanger:
        command = "cli_upper"

        def exchange_f(self, context, reader, writer):
            batches = []
            while True:
                try:
                    chunk = reader.read_chunk()
                    if chunk.data.num_rows == 0:
                        break
                    batches.append(chunk.data)
                except StopIteration:
                    break
            table = pa.Table.from_batches(batches)
            writer.begin(table.schema)
            for batch in table.to_batches():
                writer.write_batch(batch)
            writer.close()

    results = ops.register_exchanger("server2", ClientSideExchanger)
    assert results and b"cli_upper" in results[0].body.to_pybytes()
    echoed = ops.exchange_data("server2", "cli_upper", _sample())
    assert echoed.num_rows == 5


def test_client_auth_config(spark):
    """Basic credentials ride every call via ClientConfig."""
    eng = MallardEngine(spark, "cl_auth")
    server = SparkFlightServer(
        "grpc://localhost:0", eng, credentials={"admin": "password123"}
    )
    serve_in_background(server)
    mgr = None
    try:
        mgr = FlightClientManager(
            [
                ClientConfig(
                    f"grpc://localhost:{server.port}",
                    "s",
                    credentials=("admin", "password123"),
                )
            ]
        )
        ops = DataOperations(mgr)
        ops.create_table("s", "auth_t", _sample())
        out = ops.execute_query("s", "SELECT COUNT(*) AS n FROM auth_t")
        assert out.column("n").to_pylist() == [5]
    finally:
        if mgr:
            mgr.close_all()
        server.shutdown()


def test_client_health_check_false_on_dead_server(spark):
    """health_check never raises — a dead endpoint answers False
    (probe-loop contract)."""
    eng = MallardEngine(spark, "cl_dead")
    server = SparkFlightServer("grpc://localhost:0", eng)
    serve_in_background(server)
    port = server.port
    mgr = FlightClientManager([ClientConfig(f"grpc://localhost:{port}", "s")])
    ops = DataOperations(mgr)
    assert ops.health_check("s") is True
    server.shutdown()
    import time

    time.sleep(0.3)
    assert ops.health_check("s") is False
    mgr.close_all()
