"""DuckDB-dialect shim: the same DuckDB SQL a Mallard client runs
against the reference (whose engine IS DuckDB) must produce the same
answer through MallardEngine.sql. Each case executes on BOTH engines
and compares values."""

import duckdb
import pyarrow as pa
import pytest

from mallard_spark.dialect import duckdb_to_spark
from mallard_spark.engine import MallardEngine


@pytest.fixture()
def eng(spark):
    e = MallardEngine(spark, "t_dialect")
    e.put(
        "dt",
        pa.table(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "g": ["a", "a", "b", "b", "c", "c"],
                "v": [10, 40, 20, 50, 30, 60],
            }
        ),
    )
    return e


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE dt AS SELECT * FROM (VALUES "
        "(1,'a',10),(2,'a',40),(3,'b',20),(4,'b',50),(5,'c',30),(6,'c',60)"
        ") t(id, g, v)"
    )
    return con.execute(sql).fetchall()


def _both(eng, sql: str):
    got = [tuple(r) for r in eng.sql(sql).collect()]
    want = [tuple(r) for r in _duck(sql)]
    assert sorted(map(repr, got)) == sorted(map(repr, want)), (got, want)
    return got


def test_integer_division(eng):
    _both(eng, "SELECT id, v // 7 AS d FROM dt ORDER BY id")


def test_intdiv_inside_string_untouched(eng):
    rows = _both(eng, "SELECT 'a//b' AS s, v // 7 AS d FROM dt ORDER BY d")
    assert rows[0][0] == "a//b"


def test_exclude(eng):
    rows = _both(eng, "SELECT * EXCLUDE (v) FROM dt ORDER BY id")
    assert len(rows[0]) == 2


def test_qualify_top_n_per_group(eng):
    _both(
        eng,
        "SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn "
        "FROM dt QUALIFY rn <= 1 ORDER BY g",
    )


def test_qualify_window_in_predicate(eng):
    _both(
        eng,
        "SELECT g, v FROM dt "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v) = 1 ORDER BY g",
    )


def test_distinct_on(eng):
    _both(eng, "SELECT DISTINCT ON (g) g, v FROM dt ORDER BY g, v")


def test_distinct_on_desc(eng):
    _both(eng, "SELECT DISTINCT ON (g) g, v FROM dt ORDER BY g, v DESC")


def test_combined_intdiv_and_qualify(eng):
    _both(
        eng,
        "SELECT g, v // 7 AS d, row_number() OVER (PARTITION BY g ORDER BY v) AS rn "
        "FROM dt QUALIFY rn = 1 ORDER BY g",
    )


def test_valid_spark_sql_untouched():
    for q in [
        "SELECT a, b FROM t WHERE a > 1 ORDER BY b",
        "SELECT 'lit with // and QUALIFY inside' AS s FROM t",
        "SELECT a DIV b FROM t -- comment // here",
    ]:
        assert duckdb_to_spark(q) == q


def test_translator_output_shapes():
    assert duckdb_to_spark("SELECT v // 2 FROM t") == "SELECT v  DIV  2 FROM t"
    assert (
        duckdb_to_spark("SELECT * EXCLUDE (v) FROM t")
        == "SELECT * EXCEPT (v) FROM t"
    )
    out = duckdb_to_spark("SELECT g FROM t QUALIFY rn <= 2")
    assert out.startswith("SELECT * EXCEPT (__qualify) FROM (")
    assert "AS __qualify" in out and out.rstrip().endswith("WHERE __qualify")


def test_list_literal(eng):
    got = eng.sql("SELECT g, size([v, v + 1, 99]) AS n FROM dt ORDER BY g, v").collect()
    assert all(r.n == 3 for r in got) and len(got) == 6


def test_list_literal_value(eng):
    got = eng.sql("SELECT [1, 2, 3] AS l").collect()
    assert got[0].l == [1, 2, 3]


def test_list_slice(eng):
    got = eng.sql("SELECT [10, 20, 30, 40][2:3] AS s").collect()
    assert got[0].s == [20, 30]
    want = _duck("SELECT [10, 20, 30, 40][2:3] AS s")
    assert got[0].s == want[0][0]


def test_list_slice_open_ends(eng):
    for q in (
        "SELECT [10, 20, 30, 40][:2] AS s",
        "SELECT [10, 20, 30, 40][2:] AS s",
    ):
        got = eng.sql(q).collect()[0].s
        want = _duck(q)[0][0]
        assert got == want, q


def test_struct_literal(eng):
    got = eng.sql("SELECT {'a': 1, 'b': 'x'} AS s").collect()[0].s.asDict()
    want = _duck("SELECT {'a': 1, 'b': 'x'} AS s")[0][0]
    assert got == want


def test_struct_literal_unquoted_keys(eng):
    got = eng.sql("SELECT {a: 1, b: 2} AS s").collect()[0].s.asDict()
    assert got == {"a": 1, "b": 2}


def test_nested_struct_and_list(eng):
    got = eng.sql("SELECT {'xs': [1, 2], 'y': {'z': 3}} AS s").collect()[0].s
    d = got.asDict(recursive=True)
    assert d == {"xs": [1, 2], "y": {"z": 3}}


def test_plain_index_not_rewritten():
    # arr[1] is VALID Spark (0-based) — the on-failure shim must leave
    # it alone (documented dialect trap)
    assert duckdb_to_spark("SELECT arr[1] FROM t") == "SELECT arr[1] FROM t"


def test_cast_colon_colon_not_split():
    out = duckdb_to_spark("SELECT [1,2][1:2]")
    assert "slice" in out
    out2 = duckdb_to_spark("SELECT x::INT FROM t")
    assert out2 == "SELECT x::INT FROM t"


def test_function_renames(eng):
    _both(
        eng,
        "SELECT g, list_sort(list_transform([v, v + 1], x -> x * 2)) AS l, "
        "list_contains([v], v) AS c, list_max([v, 1]) AS m "
        "FROM dt ORDER BY g, v",
    )


def test_regexp_matches_partial_match(eng):
    _both(eng, "SELECT g FROM dt WHERE regexp_matches(g, 'a|b') ORDER BY g, v")


def test_rename_inside_string_untouched():
    q = "SELECT 'call list_sort(x) here' AS s, list_sort(a) FROM t"
    out = duckdb_to_spark(q)
    assert "'call list_sort(x) here'" in out
    assert out.endswith("array_sort(a) FROM t")


def test_translator_idempotent_on_own_output():
    cases = [
        "SELECT [1,2][1:2] AS s, {'a': 1} AS t, v // 2 AS d FROM t QUALIFY rn = 1",
        "SELECT DISTINCT ON (g) g, v FROM t ORDER BY g, v",
        "SELECT list_transform([1,2], x -> x) FROM t",
    ]
    for q in cases:
        once = duckdb_to_spark(q)
        assert duckdb_to_spark(once) == once, q


def test_distinct_on_with_cte(eng):
    _both(
        eng,
        "WITH big AS (SELECT g, v FROM dt WHERE v > 15) "
        "SELECT DISTINCT ON (g) g, v FROM big ORDER BY g, v",
    )


def test_qualify_with_cte(eng):
    _both(
        eng,
        "WITH big AS (SELECT g, v FROM dt WHERE v > 15) "
        "SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn "
        "FROM big QUALIFY rn = 1 ORDER BY g",
    )


def test_distinct_on_with_order_alias_and_limit(eng):
    _both(
        eng,
        "SELECT DISTINCT ON (g) g, v * 2 AS d FROM dt ORDER BY g, d LIMIT 2",
    )


def test_string_slicing(eng):
    _both(eng, "SELECT g, 'abcdef'[2:4] AS s, 'abcdef'[3:] AS t FROM dt ORDER BY g, v")


def test_struct_key_double_quoted(eng):
    got = eng.sql("SELECT {\"a b\": 1} AS s").collect()[0].s.asDict()
    want = _duck("SELECT {\"a b\": 1} AS s")[0][0]
    assert got == want == {"a b": 1}


def test_qualify_with_trailing_line_comment(eng):
    _both(
        eng,
        "SELECT g, v -- picked columns\nFROM dt "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v) = 1 ORDER BY g",
    )


def test_qualify_in_subquery(eng):
    _both(
        eng,
        "SELECT * FROM (SELECT g, v FROM dt "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v) = 1) "
        "ORDER BY g",
    )


def test_qualify_in_cte_body(eng):
    _both(
        eng,
        "WITH best AS (SELECT g, v FROM dt "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC) = 1) "
        "SELECT g, v FROM best ORDER BY g",
    )


def test_qualify_top_level_and_nested_together(eng):
    _both(
        eng,
        "SELECT g, v, row_number() OVER (ORDER BY v) AS rn FROM "
        "(SELECT g, v FROM dt "
        " QUALIFY row_number() OVER (PARTITION BY g ORDER BY v) = 1) "
        "QUALIFY rn <= 2 ORDER BY g",
    )
