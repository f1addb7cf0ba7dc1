"""Every registered query vs its DuckDB oracle (the driver's t2 gate,
run locally at sf0.001). Queries without an oracle get a rows-and-
schema sanity check."""

import pytest

from mallard_spark.registry import load_all
from mallard_spark.testing import run_compare

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0
    else:
        run_compare(spark, sf_dir, df, spec.oracle, name=name)
