"""The packaged demo (reference demo.py parity): full client flow +
throughput metrics over live gRPC, one assertion per verb."""

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
