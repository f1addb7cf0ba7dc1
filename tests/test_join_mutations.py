"""DuckDB join-mutation parity: ``UPDATE ... FROM`` and ``DELETE ...
USING`` (round 11, VERDICT r10 item #1).

The reference passes mutation tickets verbatim to DuckDB
(flight_server.py:342-352 of /root/reference), so a migrating Mallard
client can send both verbs; every test here runs the SAME script
against the engine and a live DuckDB 1.0 connection and compares the
resulting table state. Semantics verified live before implementation:
multiple matches update from an ARBITRARY matching row (no error in
DuckDB 1.0), no WHERE means every (target, source) pair matches, the
FROM/USING clause accepts comma lists, JOIN syntax, and subqueries,
and unmatched target rows survive unchanged.
"""

import duckdb
import pytest

from mallard_spark.engine import MallardEngine


def _both(spark, ns, setup, script, table="t"):
    """Run setup+script on both engines, return (engine_rows,
    duckdb_rows) for ``table`` sorted for comparison."""
    eng = MallardEngine(spark, ns)
    con = duckdb.connect()
    for stmt in setup + script:
        eng.execute(stmt)
        con.execute(stmt)
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731 — NULLs sort
    got = sorted(
        (tuple(r) for r in eng.sql(f"SELECT * FROM {table}").collect()), key=key
    )
    want = sorted(
        map(tuple, con.execute(f"SELECT * FROM {table}").fetchall()), key=key
    )
    for t in eng.list_tables():
        eng.drop(t)
    return got, want


SETUP = [
    "CREATE TABLE t (k INTEGER, v INTEGER)",
    "INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)",
    "CREATE TABLE s (k INTEGER, v INTEGER)",
    "INSERT INTO s VALUES (1, 100), (2, 200)",
    "CREATE TABLE u (k INTEGER, w INTEGER)",
    "INSERT INTO u VALUES (1, 7), (2, 8)",
]


@pytest.mark.parametrize(
    "script",
    [
        # basic join-update; unmatched k=3 survives
        ["UPDATE t SET v = s.v FROM s WHERE t.k = s.k"],
        # SET sees the OLD target row plus the source
        ["UPDATE t SET v = t.v + s.v FROM s WHERE t.k = s.k"],
        # target alias (DuckDB rejects a QUALIFIED SET target, so the
        # target column stays bare; the engine leniently strips one)
        ["UPDATE t AS x SET v = s.v + 1 FROM s WHERE x.k = s.k"],
        # multi-table comma FROM
        ["UPDATE t SET v = s.v + u.w FROM s, u WHERE t.k = s.k AND s.k = u.k"],
        # JOIN syntax inside FROM
        [
            "UPDATE t SET v = s.v + u.w FROM s JOIN u ON s.k = u.k "
            "WHERE t.k = s.k"
        ],
        # subquery source with alias
        [
            "UPDATE t SET v = q.m FROM (SELECT k, v * 2 AS m FROM s) q "
            "WHERE t.k = q.k"
        ],
        # no WHERE: cross join — every target row updated (s non-empty)
        ["UPDATE t SET v = 0 FROM s WHERE s.k = 1"],
        # self-reference: FROM sees the PRE-update content
        ["UPDATE t SET v = o.v FROM t o WHERE t.k = o.k + 1"],
        # extra non-join predicates on both sides
        [
            "UPDATE t SET v = -s.v FROM s "
            "WHERE t.k = s.k AND t.v >= 20 AND s.v < 500"
        ],
        # NULL join keys match nothing (SQL semantics)
        [
            "INSERT INTO t VALUES (NULL, 77)",
            "INSERT INTO s VALUES (NULL, 888)",
            "UPDATE t SET v = s.v FROM s WHERE t.k = s.k",
        ],
        # chained statements: join-update then plain verbs interleave
        [
            "UPDATE t SET v = s.v FROM s WHERE t.k = s.k",
            "INSERT INTO t VALUES (9, 90)",
            "UPDATE t SET v = v + 1 WHERE k = 9",
            "DELETE FROM t USING s WHERE t.k = s.k AND t.v > 150",
        ],
    ],
)
def test_update_from_state_parity(spark, script):
    got, want = _both(spark, "t_uf", SETUP, script)
    assert got == want


@pytest.mark.parametrize(
    "script",
    [
        ["DELETE FROM t USING s WHERE t.k = s.k"],
        # extra target predicate
        ["DELETE FROM t USING s WHERE t.k = s.k AND t.v > 15"],
        # no WHERE + non-empty source: table empties (verified DuckDB)
        ["DELETE FROM t USING s"],
        # empty source: nothing deleted
        ["DELETE FROM s", "DELETE FROM t USING s"],
        # alias + subquery + multi-source
        [
            "DELETE FROM t AS x USING (SELECT 1 AS kk) q, u "
            "WHERE x.k = q.kk + u.w - 7"
        ],
        # NULL keys match nothing
        [
            "INSERT INTO t VALUES (NULL, 77)",
            "DELETE FROM t USING s WHERE t.k = s.k",
        ],
    ],
)
def test_delete_using_state_parity(spark, script):
    got, want = _both(spark, "t_du", SETUP, script)
    assert got == want


def test_update_from_multimatch_is_row_consistent(spark):
    """DuckDB 1.0 updates from an ARBITRARY matching row when several
    match (verified live — no error). Whichever row the engine picks,
    ALL SET columns must come from the SAME source row."""
    import pyarrow as pa

    eng = MallardEngine(spark, "t_ufmm")
    eng.put("tgt", pa.table({"k": [1], "x": [0], "y": [0]}))
    eng.put("mm", pa.table({"k": [1, 1], "a": [5, 6], "b": [50, 60]}))
    eng.dml("UPDATE tgt SET x = mm.a, y = mm.b FROM mm WHERE tgt.k = mm.k")
    r = eng.table("tgt").collect()[0]
    assert (r.x, r.y) in [(5, 50), (6, 60)]


def test_update_from_set_default(spark):
    """``SET v = DEFAULT`` with a FROM clause fills the declared
    default (verified live against DuckDB)."""
    eng = MallardEngine(spark, "t_ufd")
    con = duckdb.connect()
    script = [
        "CREATE TABLE d (k INTEGER, v INTEGER DEFAULT 7)",
        "INSERT INTO d VALUES (1, 1), (2, 2)",
        "CREATE TABLE s2 (k INTEGER)",
        "INSERT INTO s2 VALUES (1)",
        "UPDATE d SET v = DEFAULT FROM s2 WHERE d.k = s2.k",
    ]
    for stmt in script:
        eng.execute(stmt)
        con.execute(stmt)
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM d").collect())
    want = sorted(map(tuple, con.execute("SELECT * FROM d").fetchall()))
    assert got == want == [(1, 7), (2, 2)]
    for t in eng.list_tables():
        eng.drop(t)


def test_join_mutations_in_transaction_rollback_and_commit(spark):
    """Join-mutations obey the same BEGIN/ROLLBACK/COMMIT contract as
    the plain verbs — state parity with DuckDB through both arms."""
    eng = MallardEngine(spark, "t_uftx")
    con = duckdb.connect()
    for stmt in SETUP + [
        "BEGIN",
        "UPDATE t SET v = s.v FROM s WHERE t.k = s.k",
        "DELETE FROM t USING u WHERE t.k = u.k AND u.w = 8",
    ]:
        eng.execute(stmt)
        con.execute(stmt)
    # in-tx reads see the join-mutations on both engines
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM t").collect())
    want = sorted(map(tuple, con.execute("SELECT * FROM t").fetchall()))
    assert got == want == [(1, 100), (3, 30)]
    eng.execute("ROLLBACK")
    con.execute("ROLLBACK")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM t").collect())
    want = sorted(map(tuple, con.execute("SELECT * FROM t").fetchall()))
    assert got == want == [(1, 10), (2, 20), (3, 30)]
    for stmt in [
        "BEGIN",
        "UPDATE t SET v = u.w FROM u WHERE t.k = u.k",
        "COMMIT",
    ]:
        eng.execute(stmt)
        con.execute(stmt)
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM t").collect())
    want = sorted(map(tuple, con.execute("SELECT * FROM t").fetchall()))
    assert got == want == [(1, 7), (2, 8), (3, 30)]
    for t in eng.list_tables():
        eng.drop(t)


def test_update_from_check_violation_poisons_transaction(spark):
    """A CHECK violation raised by a join-update is a RUNTIME error:
    it aborts the transaction exactly like DuckDB's constraint
    failure (poisoning taxonomy verified live in round 10)."""
    from mallard_spark.engine import TransactionAbortedError

    eng = MallardEngine(spark, "t_ufpo")
    eng.execute("CREATE TABLE c (k INTEGER, v INTEGER CHECK (v < 1000))")
    eng.execute("INSERT INTO c VALUES (1, 1)")
    eng.execute("CREATE TABLE src (k INTEGER)")
    eng.execute("INSERT INTO src VALUES (1)")
    eng.execute("BEGIN")
    with pytest.raises(Exception, match="CHECK"):
        eng.dml("UPDATE c SET v = 5000 FROM src WHERE c.k = src.k")
    with pytest.raises(TransactionAbortedError):
        eng.dml("INSERT INTO c VALUES (2, 2)")
    eng.execute("ROLLBACK")
    assert [tuple(r) for r in eng.sql("SELECT * FROM c").collect()] == [(1, 1)]
    for t in eng.list_tables():
        eng.drop(t)


def test_update_from_ambiguous_ref_errors_like_duckdb(spark):
    """An unqualified column that exists on both sides is a binder
    error in DuckDB — the engine must error too, not silently pick."""
    import pyarrow as pa

    eng = MallardEngine(spark, "t_ufam")
    eng.put("at", pa.table({"k": [1], "v": [1]}))
    eng.put("asrc", pa.table({"k": [1], "v": [2]}))
    with pytest.raises(Exception, match="(?i)ambiguous"):
        eng.dml("UPDATE at SET v = v + asrc.v FROM asrc WHERE at.k = asrc.k")


def test_returning_is_real_now(spark):
    """INSERT/UPDATE/DELETE ... RETURNING became real in round 11
    (tests/test_returning.py is the DuckDB parity battery); every
    form here returns its affected rows."""
    import pyarrow as pa

    eng = MallardEngine(spark, "t_ret")
    eng.put("rt", pa.table({"k": [1], "v": [1]}))
    eng.put("rs", pa.table({"k": [1]}))
    got = eng.dml("INSERT INTO rt VALUES (2, 2) RETURNING k")
    assert [r.k for r in got.collect()] == [2]
    got = eng.dml("UPDATE rt SET v = 0 RETURNING k")
    assert sorted(r.k for r in got.collect()) == [1, 2]
    got = eng.dml(
        "UPDATE rt SET v = 5 FROM rs WHERE rt.k = rs.k RETURNING rt.k"
    )
    assert [r.k for r in got.collect()] == [1]
    got = eng.dml("DELETE FROM rt WHERE k = 1 RETURNING k")
    assert [r.k for r in got.collect()] == [1]
    got = eng.dml("DELETE FROM rt USING rs WHERE rt.k = rs.k RETURNING k")
    assert got.collect() == []  # k=1 already gone
    # a LITERAL containing the word must not trip the clause split
    eng.dml("INSERT INTO rt VALUES (3, 3)")
    assert eng.sql("SELECT count(*) AS n FROM rt").collect()[0].n == 2


def test_create_type_is_real_now(spark):
    # round 11: CREATE TYPE became a real statement (tests/test_enums.py)
    eng = MallardEngine(spark, "t_ctype")
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    eng.sql("DROP TYPE mood")


def test_update_from_unknown_column_and_empty_clauses(spark):
    import pyarrow as pa

    eng = MallardEngine(spark, "t_uferr")
    eng.put("et", pa.table({"k": [1], "v": [1]}))
    eng.put("es", pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="unknown columns"):
        eng.dml("UPDATE et SET nope = 1 FROM es WHERE et.k = es.k")
    with pytest.raises(ValueError, match="empty WHERE"):
        eng.dml("UPDATE et SET v = 1 FROM es WHERE")
    with pytest.raises(ValueError, match="multiple assignments"):
        eng.dml("UPDATE et SET v = 1, v = 2 FROM es WHERE et.k = es.k")
