"""The 193-statement DuckDB-dialect probe corpus as a standing
regression gate: every statement runs on BOTH engines and (for
SELECTs) the VALUE MULTISETS must match — the check class that caught
the round-12 mixed `UNION BY NAME` wrong-answer. The corpus lives in
tools/dialect_probe.py (also runnable standalone); a new probe idea
belongs there, and a non-empty gap list here is the next batch of
dialect work."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


@pytest.fixture(scope="module")
def probe_fixtures(spark):
    import uuid

    from dialect_probe import build_fixtures

    return build_fixtures(spark, f"t_probe_{uuid.uuid4().hex[:8]}")


@pytest.mark.slow
def test_probe_corpus_no_gaps(probe_fixtures):
    from dialect_probe import run_corpus

    eng, con = probe_fixtures
    gaps, n = run_corpus(eng, con)
    assert n >= 190  # the corpus only ever grows
    assert gaps == [], "\n".join(f"{s} => {g}" for s, g in gaps)


def test_wire_probe_corpus_no_gaps(probe_fixtures):
    """Round 14: the WIRE corpus — shared-name statements that are
    also valid Spark SQL — must answer DUCKDB values through
    eng.sql(duckdb_semantics=True), the mode every Flight ticket
    runs under."""
    from dialect_probe import WIRE_CORPUS, run_corpus

    eng, con = probe_fixtures
    gaps, n = run_corpus(eng, con, corpus=WIRE_CORPUS, wire=True)
    assert n >= 20
    assert gaps == [], "\n".join(f"{s} => {g}" for s, g in gaps)


@pytest.mark.slow
def test_dml_script_probe_no_gaps(spark):
    """Round 15 (VERDICT r14 next #2): the STATE-comparing DML script
    corpus — multi-statement CREATE/INSERT/UPDATE/DELETE/ALTER/tx
    flows run through both the engine script path and a live DuckDB,
    final table/view contents diffed. The corpus found five real gaps
    on its first run (len() on lists in DML predicates, macros in DML
    fragments, DuckDB-semantics fragments under the local opt-in,
    late-binding views, case-insensitive name resolution)."""
    from dml_script_probe import run_scripts

    gaps, n = run_scripts(spark)
    assert n >= 40  # the corpus only ever grows
    assert gaps == [], "\n".join(f"{s} => {g}" for s, g in gaps)
