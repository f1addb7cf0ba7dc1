"""DuckDB-dialect acceptance shim.

The reference engine IS DuckDB (flight_server.py:342 passes every
ticket to ``db_conn.sql``), so a Mallard client's query library is
written in DuckDB SQL. Most of it parses on Spark unchanged (GROUP
BY ALL / ORDER BY ALL / ``||`` / ILIKE all work on Spark 4); this
module translates the common constructs that don't:

- ``a // b``            → ``a DIV b``        (integer division)
- ``* EXCLUDE (cols)``  → ``* EXCEPT (cols)``
- ``QUALIFY pred``      → wrapped subquery filtering an injected
                          ``__qualify`` column (window-after-filter
                          semantics preserved; top-level QUALIFY only)
- ``SELECT DISTINCT ON (keys) ...`` → row_number()-over-keys = 1
                          (DuckDB keeps the first row per key under
                          the query's ORDER BY; without ORDER BY the
                          keys themselves order the tiebreak here,
                          which is DETERMINISTIC where DuckDB's pick
                          is arbitrary)

``MallardEngine.sql`` applies this ONLY after vanilla Spark parsing/
analysis fails, so no already-working query can change meaning. The
translation is a quote/comment-aware token pass — table names or
operators inside string literals are never touched (same lexing
rules as the engine's table-ref rewriter).
"""

from __future__ import annotations

import re

_WS = " \t\r\n"


def _scan(sql: str):
    """Yield (index, char, depth, in_code) for every character.

    depth counts ()/[] nesting in CODE only; characters inside
    single/double/backtick strings (with SQL '' doubling and
    backslash escapes) and -- / /* */ comments report in_code=False.
    """
    i, n = 0, len(sql)
    depth = 0
    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            q = ch
            yield i, ch, depth, False
            i += 1
            while i < n:
                c = sql[i]
                yield i, c, depth, False
                if c == "\\" and q == "'" and i + 1 < n:
                    yield i + 1, sql[i + 1], depth, False
                    i += 2
                    continue
                if c == q:
                    if q == "'" and i + 1 < n and sql[i + 1] == "'":
                        yield i + 1, "'", depth, False
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
        elif ch == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            for k in range(i, j):
                yield k, sql[k], depth, False
            i = j
        elif ch == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i)
            j = n if j < 0 else j + 2
            for k in range(i, j):
                yield k, sql[k], depth, False
            i = j
        else:
            if ch in "([":
                depth += 1
            out_depth = depth
            if ch in ")]":
                depth -= 1
                out_depth = depth
            yield i, ch, out_depth, True
            i += 1


def _code_mask(sql: str) -> list[bool]:
    mask = [False] * len(sql)
    for i, _, _, in_code in _scan(sql):
        mask[i] = in_code
    return mask


def _find_kw(sql: str, word: str, at_depth: int | None = 0, start: int = 0) -> int:
    """Index of the first whole-word, code-level occurrence of
    ``word`` (case-insensitive), optionally at an exact paren depth.
    -1 if absent."""
    target = word.upper()
    positions = {}
    for i, ch, depth, in_code in _scan(sql):
        if in_code:
            positions[i] = depth
    n, m = len(sql), len(target)
    up = sql.upper()
    i = up.find(target, start)
    while i >= 0:
        ok = all(positions.get(i + k) is not None for k in range(m))
        if ok and (at_depth is None or positions[i] == at_depth):
            before = sql[i - 1] if i > 0 else " "
            after = sql[i + m] if i + m < n else " "
            if not (before.isalnum() or before == "_") and not (
                after.isalnum() or after == "_"
            ):
                return i
        i = up.find(target, i + 1)
    return -1


def _replace_intdiv(sql: str) -> str:
    mask = _code_mask(sql)
    out = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "/" and i + 1 < n and sql[i + 1] == "/" and mask[i] and mask[i + 1]:
            out.append(" DIV ")
            i += 2
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


_EXCLUDE_RE = re.compile(r"(\*\s*)EXCLUDE\b", re.IGNORECASE)


def _replace_exclude(sql: str) -> str:
    mask = _code_mask(sql)

    def sub(m: re.Match) -> str:
        if all(mask[k] for k in range(m.start(), m.end())):
            return m.group(1) + "EXCEPT"
        return m.group(0)

    return _EXCLUDE_RE.sub(sub, sql)


def _split_tail(sql: str, start: int) -> tuple[str, str]:
    """Split ``sql[start:]`` into (head, tail) where tail begins at
    the first top-level ORDER BY / LIMIT (or is empty)."""
    for kw in ("ORDER", "LIMIT"):
        i = _find_kw(sql, kw, at_depth=0, start=start)
        if i >= 0:
            return sql[start:i].rstrip(), sql[i:].rstrip("; \n\t")
    return sql[start:].rstrip("; \n\t"), ""


def _rewrite_qualify(sql: str) -> str:
    q = _find_kw(sql, "QUALIFY", at_depth=0)
    if q < 0:
        return sql
    base = sql[:q].rstrip()
    pred, tail = _split_tail(sql, q + len("QUALIFY"))
    frm = _find_kw(base, "FROM", at_depth=0)
    if frm < 0:
        return sql
    injected = f"{base[:frm].rstrip()}, ({pred.strip()}) AS __qualify {base[frm:]}"
    return (
        f"SELECT * EXCEPT (__qualify) FROM ({injected}) __qualify_src "
        f"WHERE __qualify {tail}".rstrip()
    )


def _rewrite_distinct_on(sql: str) -> str:
    s = _find_kw(sql, "SELECT", at_depth=0)
    if s < 0:
        return sql
    d = _find_kw(sql, "DISTINCT", at_depth=0, start=s)
    if d < 0 or sql[s + 6 : d].strip() != "":
        return sql
    o = _find_kw(sql, "ON", at_depth=0, start=d)
    if o < 0 or sql[d + 8 : o].strip() != "":
        return sql
    # keys live in the parens right after ON
    i = o + 2
    n = len(sql)
    while i < n and sql[i] in _WS:
        i += 1
    if i >= n or sql[i] != "(":
        return sql
    depth = 0
    j = i
    while j < n:
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    keys = sql[i + 1 : j]
    rest = sql[j + 1 :]
    frm = _find_kw(rest, "FROM", at_depth=0)
    if frm < 0:
        return sql
    select_list = rest[:frm].strip()
    body, tail = _split_tail(rest, frm)
    order = keys
    if tail.upper().lstrip().startswith("ORDER"):
        order = tail.lstrip()[len("ORDER") :].lstrip()
        if order.upper().startswith("BY"):
            order = order[2:]
    inner = (
        f"SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order}) "
        f"AS __don_rn {body}"
    )
    return (
        f"SELECT {select_list} FROM ({inner}) __don_src WHERE __don_rn = 1 {tail}"
    ).rstrip()


def duckdb_to_spark(sql: str) -> str:
    """Best-effort translation of DuckDB-dialect SQL to Spark SQL.

    Idempotent on Spark-valid input by construction of each rule
    (``//`` / ``EXCLUDE`` / top-level ``QUALIFY`` / leading
    ``DISTINCT ON`` simply do not occur in valid Spark SQL).
    Returns the input unchanged when no rule applies — callers use
    that to decide whether a retry is worth it.
    """
    out = _replace_intdiv(sql)
    out = _replace_exclude(out)
    out = _rewrite_distinct_on(out)
    out = _rewrite_qualify(out)
    return out
