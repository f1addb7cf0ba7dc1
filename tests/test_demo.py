"""The packaged demo (reference demo.py parity): full client flow +
throughput metrics over live gRPC, one assertion per verb."""

import pytest
from mallard_spark.demo import run_demo


def test_run_demo_end_to_end(spark):
    m = run_demo("/root/testdata/sf0.001", spark=spark)
    assert m["rows"] == 6000
    assert m["get"]["rows"] == 6000
    assert m["transfer"]["verified_rows"] == 6000
    assert m["transfer"]["rows"] == 6000
    assert m["exchange"]["output_rows"] == 6000
    assert m["exchange"]["all_processed"] is True
    for verb in ("get", "transfer", "exchange"):
        assert m[verb]["rows_per_sec"] > 0


def test_scale_bench_small(spark):
    from mallard_spark.demo import run_scale_bench

    m = run_scale_bench(rows=10_000, spark=spark)
    assert m["get"]["rows"] == 10_000
    assert m["transfer"]["verified_rows"] == 10_000


@pytest.mark.slow
def test_serve_cli_dual_server_sigterm(tmp_path):
    """The reference's default topology (two servers, one process,
    flight_server.py:500-531) via the serve CLI: both ports answer,
    a cross-server transfer works, and SIGTERM shuts the process down
    cleanly. Regression for the pyarrow C++ serve() sigaction steal —
    with two servers the last one silently replaced the Python signal
    handler and SIGTERM stopped only that server (process hang)."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time

    import pyarrow as pa

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "mallard_spark.serve",
            "--location", "grpc://localhost:0",
            "--server2-location", "grpc://localhost:0",
            "--cpus", "8",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env={**os.environ, "PYTHONPATH": repo},
    )
    try:
        ports = []
        t0 = time.time()
        while len(ports) < 2 and time.time() - t0 < 120:
            line = proc.stdout.readline()
            m = re.search(r"port (\d+)", line or "")
            if m:
                ports.append(int(m.group(1)))
        assert len(ports) == 2, "both servers must announce their ports"

        from mallard_spark.client import (
            ClientConfig,
            DataOperations,
            FlightClientManager,
        )

        mgr = FlightClientManager(
            [
                ClientConfig(f"grpc://localhost:{p}", f"s{i}")
                for i, p in enumerate(ports)
            ]
        )
        ops = DataOperations(mgr)
        ops.create_table("s0", "srv_t", pa.table({"id": [1, 2, 3]}))
        rows, _ = ops.transfer_table("s0", "s1", "srv_t")
        assert rows == 3
        assert ops.health_check("s1") is True
        mgr.close_all()

        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
