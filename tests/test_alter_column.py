"""Column-level ALTER TABLE + TRUNCATE (round 11).

DuckDB 1.0 semantics, each verified live first and most cross-checked
side-by-side here: ADD COLUMN backfills EXISTING rows with the
evaluated DEFAULT (not NULL) and registers it for future inserts;
DROP COLUMN refuses when a declared key depends on it and drops
single-column CHECKs with it; RENAME COLUMN carries DEFAULTs (and
here: declared keys + enum bindings); ALTER COLUMN TYPE casts content
(USING supported); SET/DROP DEFAULT are metadata-only; TRUNCATE
empties the table.
"""

import duckdb
import pytest

from mallard_spark.engine import MallardEngine


@pytest.fixture()
def eng(spark, request):
    return MallardEngine(spark, f"alt_{request.node.name[:24]}")


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


def _setup(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE t (id INT, v INT)")
        run("INSERT INTO t VALUES (1, 10), (2, 20)")


@pytest.mark.slow
def test_add_column_backfills_default(eng, duck):
    _setup(eng, duck)
    for run in (eng.execute, duck.execute):
        run("ALTER TABLE t ADD COLUMN w INT")
        run("ALTER TABLE t ADD COLUMN d INT DEFAULT 7")
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)
    for run in (eng.execute, duck.execute):
        run("INSERT INTO t (id, v) VALUES (3, 30)")
    # the DEFAULT registered for future inserts too
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)


def test_add_column_if_not_exists_and_duplicate(eng, duck):
    _setup(eng, duck)
    for run in (eng.execute, duck.execute):
        run("ALTER TABLE t ADD COLUMN IF NOT EXISTS v INT")  # no-op
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)
    with pytest.raises(ValueError, match="already exists"):
        eng.ddl("ALTER TABLE t ADD COLUMN v INT")
    with pytest.raises(Exception, match="(?i)exist"):
        duck.execute("ALTER TABLE t ADD COLUMN v INT")


def test_drop_column(eng, duck):
    _setup(eng, duck)
    for run in (eng.execute, duck.execute):
        run("ALTER TABLE t DROP COLUMN v")
        run("ALTER TABLE t DROP COLUMN IF EXISTS nosuch")
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)


def test_drop_key_column_refuses_like_duckdb(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE pk (k INT PRIMARY KEY, v INT)")
    with pytest.raises(ValueError, match="UNIQUE constraint"):
        eng.ddl("ALTER TABLE pk DROP COLUMN k")
    with pytest.raises(Exception, match="UNIQUE constraint"):
        duck.execute("ALTER TABLE pk DROP COLUMN k")


def test_drop_column_drops_single_column_check(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE ck (id INT, c INT CHECK (c > 0))")
        run("INSERT INTO ck VALUES (1, 5)")
        run("ALTER TABLE ck DROP COLUMN c")
        # the CHECK went with the column — a value it would have
        # rejected is irrelevant now
        run("INSERT INTO ck VALUES (2)")
    _both(eng, duck, "SELECT * FROM ck ORDER BY id", sort=False)


@pytest.mark.slow
def test_rename_column_carries_default_and_keys(eng, duck):
    for run in (eng.execute, duck.execute):
        run("CREATE TABLE r (id INT, v INT DEFAULT 5)")
        run("INSERT INTO r VALUES (1, 10)")
        run("ALTER TABLE r RENAME COLUMN v TO v2")
        run("INSERT INTO r (id) VALUES (2)")  # default follows
    _both(eng, duck, "SELECT * FROM r ORDER BY id", sort=False)
    # declared keys follow the rename (engine side; upsert still works)
    eng.execute("CREATE TABLE rk (k INT PRIMARY KEY, v INT)")
    eng.execute("INSERT INTO rk VALUES (1, 1)")
    eng.ddl("ALTER TABLE rk RENAME COLUMN k TO kk")
    eng.dml("INSERT OR REPLACE INTO rk VALUES (1, 99)")
    assert [tuple(r) for r in eng.sql("SELECT * FROM rk").collect()] == [
        (1, 99)
    ]


def test_alter_column_type_and_using(eng, duck):
    _setup(eng, duck)
    for run in (eng.execute, duck.execute):
        run("ALTER TABLE t ALTER COLUMN v TYPE BIGINT")
        run("ALTER TABLE t ALTER v SET DATA TYPE VARCHAR")
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)
    for run in (eng.execute, duck.execute):
        run("ALTER TABLE t ALTER COLUMN v TYPE INT USING (id * 100)")
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)


def test_set_drop_default(eng, duck):
    _setup(eng, duck)
    for run in (eng.execute, duck.execute):
        run("ALTER TABLE t ALTER COLUMN v SET DEFAULT 9")
        run("INSERT INTO t (id) VALUES (3)")
        run("ALTER TABLE t ALTER COLUMN v DROP DEFAULT")
        run("INSERT INTO t (id) VALUES (4)")
    _both(eng, duck, "SELECT * FROM t ORDER BY id", sort=False)


def test_truncate(eng, duck):
    _setup(eng, duck)
    for run in (eng.execute, duck.execute):
        run("TRUNCATE t")
    _both(eng, duck, "SELECT count(*) AS n FROM t")
    for run in (eng.execute, duck.execute):
        run("INSERT INTO t VALUES (9, 9)")
        run("TRUNCATE TABLE t")
    _both(eng, duck, "SELECT count(*) AS n FROM t")


def test_add_enum_column_validates(eng):
    eng.execute("CREATE TYPE mood AS ENUM ('sad', 'ok')")
    eng.execute("CREATE TABLE et (id INT)")
    eng.execute("INSERT INTO et VALUES (1)")
    eng.ddl("ALTER TABLE et ADD COLUMN m mood DEFAULT 'ok'")
    assert [tuple(r) for r in eng.sql("SELECT * FROM et").collect()] == [
        (1, "ok")
    ]
    from mallard_spark.engine import ConstraintViolationError

    with pytest.raises(ConstraintViolationError, match="Could not convert"):
        eng.dml("INSERT INTO et VALUES (2, 'angry')")


@pytest.mark.slow
def test_alter_persisted_table_survives_restart(spark):
    eng = MallardEngine(spark, "alt_persist")
    import pyarrow as pa

    eng.put("pt", pa.table({"k": [1], "v": [10]}), persist=True)
    try:
        eng.ddl("ALTER TABLE pt ADD COLUMN d INT DEFAULT 3")
        eng.ddl("ALTER TABLE pt RENAME COLUMN v TO v2")
        eng2 = MallardEngine(spark, "alt_persist")
        eng2.dml("INSERT INTO pt (k, v2) VALUES (2, 20)")
        assert sorted(
            tuple(r) for r in eng2.sql("SELECT * FROM pt").collect()
        ) == [(1, 10, 3), (2, 20, 3)]
    finally:
        eng.drop("pt")


def test_rename_column_with_check_refuses_by_name(eng):
    eng.execute("CREATE TABLE rc (id INT, c INT CHECK (c > 0))")
    with pytest.raises(NotImplementedError, match="CHECK"):
        eng.ddl("ALTER TABLE rc RENAME COLUMN c TO c2")
