"""INSERT/UPDATE/DELETE ... RETURNING (round 11).

DuckDB semantics, verified live before implementation and
cross-checked side-by-side here: INSERT returns the inserted rows
with defaults / sequence values / generated columns filled; UPDATE
returns the NEW values of affected rows (empty when nothing
matches); DELETE returns the deleted rows; the clause is a
projection over that relation (expressions, AS aliases, ``*``).
The join-mutation forms (UPDATE ... FROM / DELETE ... USING) return
their matched rows too. OR REPLACE / ON CONFLICT / MERGE + RETURNING
keep a named refusal (the upsert's affected set mixes both arms).

The returned relation is pinned (localCheckpoint) BEFORE the write
publishes — a lazy plan would re-read mutated state (proven by the
self-referencing-source test) and volatile defaults would diverge
between the written and returned rows.
"""

import duckdb
import pytest

from mallard_spark.engine import MallardEngine


@pytest.fixture()
def eng(spark, request):
    return MallardEngine(spark, f"ret_{request.node.name[:24]}")


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _both(eng, duck, sql, sort=True):
    mine = [tuple(r) for r in eng.execute(sql).collect()]
    theirs = duck.execute(sql).fetchall()
    if sort:
        mine, theirs = sorted(mine), sorted(theirs)
    assert mine == theirs, f"{sql}\n  spark: {mine}\n  duck:  {theirs}"


def test_insert_returning_fills_defaults_sequences_generated(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE SEQUENCE s")
        run(
            "CREATE TABLE t (id INT DEFAULT nextval('s'), v INT, "
            "w INT AS (v * 2))"
        )
    _both(eng, duck, "INSERT INTO t (v) VALUES (10), (20) RETURNING *")
    _both(
        eng, duck,
        "INSERT INTO t (v) VALUES (30) RETURNING id, v + 1 AS vp, w",
    )
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)


def test_update_returning_new_values(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE t (id INT, v INT)")
        run("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
    _both(eng, duck, "UPDATE t SET v = v + 1 WHERE v >= 20 RETURNING *")
    _both(eng, duck, "UPDATE t SET v = 0 WHERE v > 999 RETURNING v")
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)


def test_delete_returning_deleted_rows(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE t (id INT, v INT)")
        run("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
    _both(eng, duck, "DELETE FROM t WHERE v > 15 RETURNING id, v * 10 AS vx")
    _both(eng, duck, "DELETE FROM t RETURNING *")  # no WHERE: all rows
    _both(eng, duck, "SELECT count(*) AS n FROM t")


def test_join_mutation_returning(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE u (k INT, v INT)")
        run("CREATE TABLE src (k INT)")
        run("INSERT INTO u VALUES (1, 1), (2, 2)")
        run("INSERT INTO src VALUES (1)")
    _both(
        eng, duck,
        "UPDATE u SET v = 9 FROM src WHERE u.k = src.k RETURNING u.k, v",
    )
    _both(
        eng, duck,
        "DELETE FROM u USING src WHERE u.k = src.k RETURNING k, v",
    )
    _both(eng, duck, "SELECT * FROM u")


def test_insert_returning_self_referencing_source(eng, duck):
    """The returned rows must be the PRE-write proposed rows even
    when the source reads the target table itself — an unpinned plan
    would double-read after the append."""
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE sr (x INT)")
        run("INSERT INTO sr VALUES (1), (2)")
    _both(eng, duck, "INSERT INTO sr SELECT x + 10 FROM sr RETURNING *")
    _both(eng, duck, "SELECT * FROM sr")


def test_returning_word_inside_literal_is_data(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE lt (s VARCHAR)")
    _both(
        eng, duck,
        "INSERT INTO lt VALUES (' RETURNING x ') RETURNING s",
    )
    _both(eng, duck, "SELECT * FROM lt")


def test_returning_enum_validation_still_rejects(eng):
    eng.execute("CREATE TYPE mood AS ENUM ('sad', 'ok')")
    eng.execute("CREATE TABLE em (m mood)")
    with pytest.raises(Exception, match="Could not convert"):
        eng.execute("INSERT INTO em VALUES ('angry') RETURNING *")
    assert eng.sql("SELECT count(*) AS n FROM em").collect()[0].n == 0


def test_returning_on_upsert_forms_answers_proposed_rows(eng, duck):
    """DuckDB 1.0's conflict-form RETURNING (verified live) answers
    the PROPOSED rows verbatim — even when DO NOTHING kept the old
    row or a guarded DO UPDATE's guard was false — never the final
    table state."""
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE pk (k INT PRIMARY KEY, v INT)")
        run("INSERT INTO pk VALUES (1, 1)")
    _both(
        eng, duck,
        "INSERT INTO pk VALUES (1, 9), (2, 5) "
        "ON CONFLICT (k) DO NOTHING RETURNING *",
    )
    _both(eng, duck, "SELECT * FROM pk")  # conflict row kept old value
    _both(
        eng, duck,
        "INSERT INTO pk VALUES (1, 7), (3, 3) ON CONFLICT (k) "
        "DO UPDATE SET v = excluded.v + 100 RETURNING k, v",
    )
    _both(eng, duck, "SELECT * FROM pk")
    _both(eng, duck, "INSERT OR REPLACE INTO pk VALUES (1, 88) RETURNING *")
    _both(
        eng, duck,
        "INSERT OR IGNORE INTO pk VALUES (1, 0), (4, 4) RETURNING *",
    )
    _both(eng, duck, "SELECT * FROM pk")
    with pytest.raises(ValueError, match="empty RETURNING"):
        eng.dml("INSERT INTO pk VALUES (5, 5) RETURNING")


def test_returning_persisted_table(spark):
    eng = MallardEngine(spark, "ret_persist")
    import pyarrow as pa

    eng.put("pt", pa.table({"k": [1], "v": [10]}), persist=True)
    try:
        got = eng.dml("INSERT INTO pt VALUES (2, 20) RETURNING k, v")
        assert [tuple(r) for r in got.collect()] == [(2, 20)]
        got = eng.dml("UPDATE pt SET v = v + 1 WHERE k = 1 RETURNING v")
        assert [r.v for r in got.collect()] == [11]
        got = eng.dml("DELETE FROM pt WHERE k = 2 RETURNING v")
        assert [r.v for r in got.collect()] == [20]
        assert sorted(
            tuple(r) for r in eng.sql("SELECT * FROM pt").collect()
        ) == [(1, 11)]
    finally:
        eng.drop("pt")


def test_returning_in_transaction(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE tx (k INT, v INT)")
        run("INSERT INTO tx VALUES (1, 1)")
        run("BEGIN")
    _both(eng, duck, "INSERT INTO tx VALUES (2, 2) RETURNING *")
    _both(eng, duck, "UPDATE tx SET v = 9 WHERE k = 1 RETURNING v")
    for run in (eng.execute, duck.execute):
        run("ROLLBACK")
    _both(eng, duck, "SELECT * FROM tx")


def test_returning_over_wire(spark):
    """A do_get ticket carrying RETURNING answers the affected rows
    (the reference's DuckDB does exactly this with such tickets)."""
    from pyarrow import flight

    from mallard_spark.flight import SparkFlightServer, serve_in_background

    eng = MallardEngine(spark, "ret_wire")
    eng.execute("CREATE TABLE wt (k INT, v INT)")
    s = SparkFlightServer("grpc://localhost:0", eng)
    serve_in_background(s)
    try:
        client = flight.connect(f"grpc://localhost:{s.port}")
        got = client.do_get(flight.Ticket(
            b"INSERT INTO wt VALUES (1, 10), (2, 20) RETURNING k, v"
        )).read_all()
        assert sorted(
            zip(got.column("k").to_pylist(), got.column("v").to_pylist())
        ) == [(1, 10), (2, 20)]
    finally:
        s.shutdown()


# -- round 12: one-evaluation guarantees (ADVICE r11) ----------------


def test_update_returning_volatile_set_matches_stored(eng):
    """A volatile SET expression (random()) must yield RETURNING
    values identical to what was stored — DuckDB guarantees it
    (verified live); the round-11 code evaluated the SET twice."""
    eng.execute("CREATE TABLE tv (id INT, r DOUBLE)")
    eng.execute("INSERT INTO tv VALUES (1, 0), (2, 0), (3, 0)")
    ret = {
        r.id: r.r
        for r in eng.execute(
            "UPDATE tv SET r = rand() RETURNING id, r"
        ).collect()
    }
    stored = {r.id: r.r for r in eng.table("tv").collect()}
    assert ret == stored and len(ret) == 3


def test_update_returning_volatile_where_consistent(eng):
    """A volatile WHERE (rand() < 0.5) must partition the table into
    exactly {updated rows} + {untouched rows}: the round-12 marked
    checkpoint pins the verdict so no row is lost or duplicated."""
    eng.execute("CREATE TABLE tw (id INT, flag INT)")
    eng.execute(
        "INSERT INTO tw SELECT id, 0 FROM range(100) t(id)"
    )
    ret = eng.execute(
        "UPDATE tw SET flag = 1 WHERE rand() < 0.5 RETURNING id"
    ).collect()
    rows = eng.table("tw").collect()
    assert len(rows) == 100  # no loss, no duplication
    flagged = {r.id for r in rows if r.flag == 1}
    assert {r.id for r in ret} == flagged


def test_update_from_returning_matches_stored_on_multimatch(eng):
    """UPDATE ... FROM with MULTIPLE source matches per target: the
    stored value is an arbitrary pick — RETURNING must report THAT
    pick, not a fresh evaluation (round 12 checkpoints the joined
    relation once). Known divergence, documented: DuckDB returns one
    row per matched PAIR; this engine returns one per updated row."""
    eng.execute("CREATE TABLE t (k INT, v VARCHAR)")
    eng.execute("INSERT INTO t VALUES (1, 'old')")
    eng.execute("CREATE TABLE s (k INT, nv VARCHAR)")
    # 64 conflicting source rows -> arbitrary pick among 64
    eng.execute(
        "INSERT INTO s SELECT 1, 'n' || CAST(id AS VARCHAR) "
        "FROM range(64) t(id)"
    )
    ret = eng.execute(
        "UPDATE t SET v = s.nv FROM s WHERE t.k = s.k RETURNING v"
    ).collect()
    assert len(ret) == 1
    stored = eng.table("t").collect()[0].v
    assert ret[0].v == stored
