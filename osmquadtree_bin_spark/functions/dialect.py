"""The ``sqlselect`` dialect shims (SURVEY.md §2.8).

The reference's SQL engine runs the 72-query carto corpus
(``/root/reference/project-oqt.mml``, parsed at
``osmquadtree-geometry.go:87-148``). Almost all of its dialect is stock Spark
SQL; the three gaps are shimmed here:

  * ``makeinteger(text)``  — regex-guarded int cast, 0 on failure
    (defined in ``osmquadtree-postgis.go:445``).
  * ``substr(s, 0, n)``    — Postgres 0-index edge: returns the first n-1
    chars (Postgres pads a virtual char at index 0).
  * ``(VALUES ...) AS t(c1,c2) ... USING (...)`` — rewritten to an inline
    ``VALUES`` subquery with named columns, which Spark supports natively.

``register`` installs the SQL functions on a session; ``translate`` rewrites
a corpus query string into Spark SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, SparkSession, functions as F


def makeinteger(col: Column) -> Column:
    """``case when $1 ~ E'^-?[0-9]+$' then $1::integer else 0 end``
    (``osmquadtree-postgis.go:445``)."""
    return (
        F.when(col.rlike(r"^-?[0-9]+$"), col.cast("long")).otherwise(F.lit(0)).cast("long")
    )


def pg_substr(col: Column, start: Column | int, length: Column | int | None = None) -> Column:
    """Postgres substr semantics incl. the 0/negative-start edge: characters
    at virtual positions < 1 consume length. substr('abc', 0, 2) = 'a'."""
    start_c = F.lit(start) if isinstance(start, int) else start
    eff_start = F.greatest(start_c.cast("long"), F.lit(1))
    if length is None:
        return col.substr(eff_start.cast("int"), F.lit(1 << 30))
    length_c = F.lit(length) if isinstance(length, int) else length
    eff_len = F.greatest(length_c.cast("long") + F.least(start_c.cast("long") - 1, F.lit(0)),
                         F.lit(0))
    return col.substr(eff_start.cast("int"), eff_len.cast("int"))


_SQL_FUNC_DEFS = {
    # expression-level rewrites applied by translate() — stays JVM-side
    "makeinteger": lambda arg: (
        f"(case when {arg} rlike '^-?[0-9]+$' then cast({arg} as long) else 0 end)"
    ),
}


def _rewrite_makeinteger(sql: str) -> str:
    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("makeinteger(", i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        # find matching close paren
        depth = 0
        k = j + len("makeinteger")
        start_arg = k + 1
        for k in range(start_arg, len(sql)):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                if depth == 0:
                    break
                depth -= 1
        arg = sql[start_arg:k]
        out.append(_SQL_FUNC_DEFS["makeinteger"](arg))
        i = k + 1
    return "".join(out)


_SUBSTR0_RE = re.compile(r"substr\(\s*([^,()]+)\s*,\s*0\s*,\s*(\d+)\s*\)", re.IGNORECASE)


def _rewrite_substr0(sql: str) -> str:
    """substr(s, 0, n) → substring(s, 1, n-1) (Postgres virtual index 0)."""
    return _SUBSTR0_RE.sub(
        lambda m: f"substring({m.group(1)}, 1, {max(int(m.group(2)) - 1, 0)})", sql
    )


def _rewrite_quotes(sql: str) -> str:
    """Double-quoted identifiers → backticks (Spark)."""
    return re.sub(r'"([A-Za-z_][A-Za-z0-9_]*)"', r"`\1`", sql)


def _rewrite_casts(sql: str) -> str:
    """``expr::text`` / ``::integer`` → cast(expr as ...)."""
    sql = re.sub(r"('(?:[^']|'')*'|\w+|\))::text", r"cast(\1 as string)", sql)
    sql = re.sub(r"('(?:[^']|'')*'|\w+|\))::integer", r"cast(\1 as int)", sql)
    return sql


def _strip_pixel_tokens(sql: str) -> str:
    """Carto ``!pixel_width!``/``!pixel_height!`` tokens → 1
    (``osmquadtree-geometry.go:129-131``).

    An unaliased select-list item ``way_area/(!pw!*!ph!)`` would become the
    unreferenceable column ``(way_area / (1 * 1))`` — since ÷(1*1) is the
    identity, drop the division so outer ORDER BY way_area still resolves
    (Postgres-style name resolution the reference engine relied on)."""
    sql = re.sub(
        r"(\w+)\s*/\s*\(!pixel_width!\s*\*\s*!pixel_height!\)(\s*,|\s+FROM\b)",
        r"\1\2",
        sql,
        flags=re.IGNORECASE,
    )
    return sql.replace("!pixel_width!", "1").replace("!pixel_height!", "1")


def _rewrite_charlength(sql: str) -> str:
    return re.sub(r"char_length\(", "length(", sql, flags=re.IGNORECASE)


def translate(sql: str) -> str:
    """Corpus SQL → Spark SQL."""
    sql = _strip_pixel_tokens(sql)
    sql = _rewrite_quotes(sql)
    sql = _rewrite_casts(sql)
    sql = _rewrite_substr0(sql)
    sql = _rewrite_makeinteger(sql)
    sql = _rewrite_charlength(sql)
    return sql
