"""S10: PostGIS sink — DDL, row routing, roads-table statement, and the ST_
geometry helpers the reference's roads DDL needs, as Spark-native functions.

Reference contract (``/root/reference/osmquadtree-postgis.go``):
  * column lists per table       — make_point/line/polygon_col (:60-112)
  * COPY-IN row routing          — prepareCopyRow (:253-290): GeometryType
    1 → point, 2 → line, 3 and 7 (Multi) → polygon; osm_id = low 40 bits,
    negated for relations (id >> 59 == 2)
  * roads table DDL              — roads_stmt (:401-420), which uses
    st_exteriorring / st_geometryn / st_numgeometries / generate_series /
    st_geometrytype over the polygon table

Spark shape: the geometry tables are DataFrames; the sink is
``DataFrame.write.jdbc`` per routed table (this sandbox has no database, so
``write_postgis`` raises a clear error if the JDBC write fails to connect —
everything up to the write, including routing, DDL text and the ST_ helper
columns, is real and unit-tested offline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------------------ ST_ fns
# WKT-based analogues of the PostGIS functions the roads DDL uses. All pure
# Spark SQL expressions (regexp + higher-order functions) — no Python.


def st_geometrytype(way: Column) -> Column:
    """'POLYGON' / 'MULTIPOLYGON' / 'LINESTRING' / 'POINT' from WKT."""
    return F.upper(F.regexp_extract(way, r"^\s*([A-Za-z]+)", 1))


def st_numgeometries(way: Column) -> Column:
    """Number of component geometries: 1 for simple types; for MULTI* the
    count of top-level '((...))' groups = count of '((' openers."""
    multi = st_geometrytype(way).startswith("MULTI")
    n_parts = F.size(F.split(way, r"\)\s*\)\s*,\s*\(\s*\("))
    return F.when(multi, n_parts).otherwise(F.lit(1)).cast("int")


def st_geometryn(way: Column, n: Column) -> Column:
    """n-th (1-based) component of a MULTIPOLYGON as a POLYGON WKT; simple
    geometries return themselves for n=1."""
    multi = st_geometrytype(way).startswith("MULTI")
    # body between the outermost parens, split on the ')),((' separators
    body = F.regexp_extract(way, r"^\s*MULTI[A-Z]+\s*\(\s*(.*)\s*\)\s*$", 1)
    parts = F.split(body, r"\)\s*\)\s*,\s*\(\s*\(")
    # F.get (0-based, null-safe): ANSI element_at errors out-of-bounds, and
    # the non-multi CASE arm can still be CSE-evaluated in fallback codegen
    part = F.get(parts, (n - 1).cast("int"))
    # re-close the parens stripped by the split
    fixed = F.concat(
        F.lit("POLYGON(("),
        F.regexp_replace(F.regexp_replace(part, r"^\s*\(\s*\(", ""), r"\)\s*\)\s*$", ""),
        F.lit("))"),
    )
    return F.when(multi, fixed).otherwise(F.when(n == 1, way))


def st_exteriorring(way: Column) -> Column:
    """Outer ring of a POLYGON WKT as a LINESTRING WKT."""
    ring = F.regexp_extract(way, r"^\s*POLYGON\s*\(\s*\(([^)]*)\)", 1)
    return F.when(
        st_geometrytype(way) == "POLYGON",
        F.concat(F.lit("LINESTRING("), ring, F.lit(")")),
    )


def generate_series_explode(df: DataFrame, n_col: Column, out: str = "n") -> DataFrame:
    """PostgreSQL generate_series(1, n) as a Spark explode — the lateral the
    reference's roads DDL relies on."""
    return df.withColumn(out, F.explode(F.sequence(F.lit(1), n_col)))


# ------------------------------------------------------------------ routing
def route_tables(elements: DataFrame) -> dict[str, DataFrame]:
    """prepareCopyRow's table routing (:265-274): GeometryType 1 → point,
    2 → line, 3 and 7 (Multi) → polygon. Our geom_type ints: 0/1/2 with
    MULTI* already folded to base type in spans.explode_geoms — so Multi
    polygons land in polygon exactly as type 7 does in the reference."""
    return {
        "point": elements.filter(F.col("geom_type") == 0),
        "line": elements.filter(F.col("geom_type") == 1),
        "polygon": elements.filter(F.col("geom_type") == 2),
    }


# ---------------------------------------------------------------------- DDL
def table_ddl(prefix: str, table: str, text_cols: list[str]) -> str:
    """CREATE TABLE mirroring make_*_col (:60-112): osm_id bigint, quadtree
    text, style text columns, then z_order integer (+ way_area real for
    polygon), way (geometry as WKT text here; geometry(...) on PostGIS)."""
    cols = [("osm_id", "bigint"), ("quadtree", "text")]
    cols += [(c, "text") for c in text_cols]
    cols.append(("z_order", "integer"))
    if table == "polygon":
        cols.append(("way_area", "real"))
    cols.append(("way", "text"))
    body = ", ".join(f'"{c}" {t}' for c, t in cols)
    return f"CREATE TABLE {prefix}_{table} ({body})"


# roads DDL re-expressed over Spark views: the three UNION branches of
# roads_stmt (:401-420). The polygon branches need the ST_ helpers above.
def roads_frame(line: DataFrame, polygon: DataFrame) -> DataFrame:
    """The reference roads table as a DataFrame (UNION of highway/railway/
    boundary lines + exterior rings of administrative multi/polygons)."""
    keep = [
        "osm_id", "quadtree", "name", "ref", "admin_level", "highway",
        "railway", "boundary", "service", "tunnel", "bridge", "z_order", "way",
    ]

    def missing_as_null(df, cols):
        for c in cols:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        return df

    lines = missing_as_null(line, keep).filter(
        F.col("highway").isin(
            "secondary", "secondary_link", "primary", "primary_link",
            "trunk", "trunk_link", "motorway", "motorway_link",
        )
        | F.col("railway").isNotNull()
        | (F.col("boundary") == "administrative")
    ).select(*keep)

    admin = missing_as_null(polygon, ["name", "admin_level", "boundary"]).filter(
        (F.col("osm_id") < 0) & (F.col("boundary") == "administrative")
    )
    is_poly = st_geometrytype(F.col("way")) == "POLYGON"
    # POLYGON branch: exterior ring directly
    simple = admin.filter(is_poly).withColumn("way", st_exteriorring(F.col("way")))
    # MULTIPOLYGON branch: generate_series over components, ring per part
    multi = generate_series_explode(
        admin.filter(~is_poly), st_numgeometries(F.col("way")), "n"
    ).withColumn("way", st_exteriorring(st_geometryn(F.col("way"), F.col("n"))))

    def as_roads(df):
        return df.select(
            "osm_id", "quadtree", "name",
            F.lit(None).cast("string").alias("ref"), "admin_level",
            F.lit(None).cast("string").alias("highway"),
            F.lit(None).cast("string").alias("railway"), "boundary",
            F.lit(None).cast("string").alias("service"),
            F.lit(None).cast("string").alias("tunnel"),
            F.lit(None).cast("string").alias("bridge"),
            F.lit(0).cast("long").alias("z_order"), "way",
        )

    out = lines
    for df in (as_roads(simple), as_roads(multi)):
        out = out.unionByName(df)
    return out.dropDuplicates()


# --------------------------------------------------------------------- sink
def write_postgis(
    tables: dict[str, DataFrame],
    url: str,
    prefix: str = "planet_osm",
    mode: str = "overwrite",
    properties: dict | None = None,
) -> None:
    """Write each routed table via JDBC (the reference's CopyIn, :243).
    ``url`` like jdbc:postgresql://host/db?user=...&password=... — no DB in
    this sandbox, so expect the connect to fail here; the call shape is the
    production one."""
    props = {"driver": "org.postgresql.Driver"} | (properties or {})
    for name, df in tables.items():
        df.write.jdbc(url, f"{prefix}_{name}", mode=mode, properties=props)
