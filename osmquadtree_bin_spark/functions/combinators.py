"""Tag-combinator expression library (SURVEY.md §2.9).

The reference's feature-extraction DSL
(``/root/reference/osmquadtree-geometry-features.go``) is a set of pure
scalar transforms over the dynamic tag map. Each combinator here is a
``Column`` builder over a ``map<string,string>`` tags column — built-in
functions only, so everything stays in whole-stage codegen.

Combinator semantics carry the reference's exact quirks (null-propagation,
the yes/no normalization list, default-key fallback of ``replval``), each
cited to its implementation lines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TAGS = "tags"


def _tag(key: str, tags: str = TAGS) -> Column:
    return F.element_at(F.col(tags), key)


def passcol(key: str, tags: str = TAGS) -> Column:
    """Pass tag through, null if absent (features.go:311-320)."""
    return _tag(key, tags)


def renamecol(key: str, alias: str, tags: str = TAGS) -> Column:
    """Alias (features.go:322-329)."""
    return _tag(key, tags).alias(alias)


def cutsuffix(key: str, suffix: str, tags: str = TAGS) -> Column:
    """Strip suffix if present, e.g. 'motorway_link' → 'motorway'
    (features.go:331-344)."""
    v = _tag(key, tags)
    return F.when(
        v.endswith(suffix), F.expr(f"substring({tags}['{key}'], 1, length({tags}['{key}']) - {len(suffix)})")
    ).otherwise(v)


def replval(key: str, mapping: dict[str, str], tags: str = TAGS) -> Column:
    """Value remap with default-key '' fallback, else null (features.go:346-369)."""
    v = _tag(key, tags)
    expr = None
    default = mapping.get("")
    for k, out in mapping.items():
        if k == "":
            continue
        cond = v == k
        expr = F.when(cond, out) if expr is None else expr.when(cond, out)
    if expr is None:
        return F.when(v.isNotNull(), F.lit(default))
    if default is not None:
        return expr.otherwise(F.when(v.isNotNull(), F.lit(default)))
    return expr


_NO_VALUES = ["no", "0", "false"]


def yesno(key: str, tags: str = TAGS) -> Column:
    """'no'/'0'/'false' → 'no'; any other nonempty → 'yes'; absent → null
    (features.go:371-387)."""
    v = _tag(key, tags)
    return (
        F.when(v.isin(_NO_VALUES), "no")
        .when(v.isNotNull() & (F.length(v) > 0), "yes")
        .otherwise(F.lit(None).cast("string"))
    )


def hassuffix(key: str, suffix: str, tags: str = TAGS) -> Column:
    """yes/no on suffix test (features.go:390-405)."""
    v = _tag(key, tags)
    return F.when(v.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(v.endswith(suffix), "yes").otherwise("no")
    )


def splitcol(key: str, tags: str = TAGS) -> tuple[Column, Column, Column]:
    """Split on ';' → (array, count, maxlen) (features.go:411-440)."""
    v = _tag(key, tags)
    parts = F.split(v, ";")
    return (
        parts,
        F.when(v.isNotNull(), F.size(parts)).otherwise(0),
        F.when(
            v.isNotNull(), F.array_max(F.transform(parts, lambda p: F.length(p)))
        ).otherwise(0),
    )


def joincol(key_a: str, key_b: str, tags: str = TAGS) -> Column:
    """Concat two tags with a space, null-tolerant (features.go:442-456):
    both null → null; one null → the other; else 'a b'."""
    a, b = _tag(key_a, tags), _tag(key_b, tags)
    return (
        F.when(a.isNull() & b.isNull(), F.lit(None).cast("string"))
        .when(a.isNull(), b)
        .when(b.isNull(), a)
        .otherwise(F.concat_ws(" ", a, b))
    )


def isval(key: str, value: str, tags: str = TAGS) -> Column:
    """Equality → yes/no (features.go:458-468)."""
    v = _tag(key, tags)
    return F.when(v.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(v == value, "yes").otherwise("no")
    )


def haseither(cols: list[Column]) -> Column:
    """OR of yes-tests (features.go:470-484)."""
    expr = None
    for c in cols:
        t = c == "yes"
        expr = t if expr is None else (expr | t)
    return F.when(expr, "yes").otherwise("no")


def asint(key: str, tags: str = TAGS) -> Column:
    """Lenient int cast, null on failure (features.go:495-511)."""
    v = _tag(key, tags)
    return F.when(v.rlike(r"^-?[0-9]+$"), v.cast("long"))


def haskey(key: str, tags: str = TAGS) -> Column:
    """Key-presence feature (features.go:613-627)."""
    return F.when(_tag(key, tags).isNotNull(), "yes").otherwise("no")


def is_building(tags: str = TAGS) -> Column:
    """Polygon + building tag not in (no,0,false) (features.go:595-610);
    geometry-type check applied by the caller."""
    v = _tag("building", tags)
    return v.isNotNull() & ~v.isin(_NO_VALUES)
