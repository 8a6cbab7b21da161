"""The four virtual tables (SURVEY.md §1.3) + style-driven projection (P5).

Reference: table col lists assembled from the style at
``/root/reference/osmquadtree-geometry.go:859-893``; style format
``extrastyle.json``. The roads view SQL is the reference's verbatim contract
(``osmquadtree-geometry.go:889``), translated through the dialect shims.

Spark shape: one geometry elements DataFrame (from ``spans.explode_geoms``,
optionally tiled) → three projected temp views (point/line/polygon) with the
style tags pivoted to real columns (``element_at(tags, k)`` — Catalyst prunes
unused ones per query) → roads as a Spark SQL view over them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dialect import translate
from ..functions.zorder import way_area_merc, z_order

# Public style-vocabulary fixture (jharris2268/osmquadtree-bin ships it as
# extrastyle.json). A copy lives in tests/fixtures/ so the repo is
# self-contained; SPARK_GRAFT_STYLE_PATH overrides.
STYLE_PATH = os.environ.get(
    "SPARK_GRAFT_STYLE_PATH",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tests", "fixtures", "extrastyle.json"),
)

# Verbatim from osmquadtree-geometry.go:889, with one fix: the reference's
# polygon branch omits `covered` (12 vs 13 cols) and its lenient sqlselect
# engine tolerated it; ANSI UNION requires matching arity, so we pad
# `null as covered` — semantics unchanged (the column was null-ish anyway).
ROADS_VIEW_SQL = (
    "SELECT osm_id,name,ref,admin_level,highway,railway,boundary, service,"
    "tunnel,bridge,covered,z_order, way FROM planet_osm_line WHERE highway in "
    "( 'secondary','secondary_link','primary','primary_link', 'trunk',"
    "'trunk_link','motorway','motorway_link') OR railway is not null or "
    "boundary = 'administrative' UNION SELECT osm_id,name,null as ref,"
    "admin_level,null as highway, null as railway, boundary, null as service, "
    "null as tunnel,null as bridge, null as covered, 0 as z_order,way "
    "FROM planet_osm_polygon WHERE osm_id<0 and boundary='administrative'"
)


def load_style(path: str = STYLE_PATH) -> list[dict]:
    with open(path) as f:
        return json.load(f)


def _osm_id():
    """Reference id unpack (``osmquadtree-postgis.go:279-284``): low 40 bits,
    negative for relations (type bits >= 59 == 2)."""
    oid = F.col("id").bitwiseAND(F.lit((1 << 40) - 1))
    return F.when(F.shiftrightunsigned(F.col("id"), 59) == 2, -oid).otherwise(oid)


_PH_DEPTH = 12  # grid depth cap for the parent_highway cell join


def _cell_key(a, x, y):
    """Pack (depth, cell_x, cell_y) into one join key."""
    return (
        F.shiftleft(a.cast("long"), 40)
        .bitwiseOR(F.shiftleft(x.cast("long"), 20))
        .bitwiseOR(y.cast("long"))
    )


def _grid_xy(lon_col: str, lat_col: str):
    """Fixed-point lon/lat → depth-_PH_DEPTH integer grid coords (equirect
    grid is fine here: the key only buckets, the exact bbox test follows)."""
    n = 1 << _PH_DEPTH
    x = F.floor((F.col(lon_col) + 1_800_000_000) / F.lit(3_600_000_000) * n)
    y = F.floor((F.col(lat_col) + 900_000_000) / F.lit(1_800_000_000) * n)
    clamp = lambda c: F.greatest(F.least(c, F.lit(n - 1)), F.lit(0))  # noqa: E731
    return clamp(x).cast("long"), clamp(y).cast("long")


def _bitlen(col: str, maxbits: int) -> str:
    """Exact integer bit_length (sum of threshold tests — no float log2,
    whose last-ulp rounding could silently skip grid cells)."""
    return " + ".join(
        f"(CASE WHEN {col} >= {1 << k} THEN 1 ELSE 0 END)" for k in range(maxbits)
    )


def _parent_highway(pts: DataFrame, hwy_lines: DataFrame) -> DataFrame:
    """A6 calc_parent as a CELL EQUI-JOIN (scales; no broadcast, no theta).

    Each highway line picks the deepest grid depth at which its bbox covers
    <= 2 cells per axis (capped at _PH_DEPTH) and explodes into those <= 4
    cells; each point explodes into its ancestor cells at every depth
    0.._PH_DEPTH. Hash-join on the packed (depth, cx, cy) key, then the exact
    bbox predicate, then min_by. Complete: a point inside a line's bbox
    shares its ancestor cell at the line's chosen depth with one of the
    line's covered cells. Skew-safe: nearly all lines land at full depth, so
    shallow-depth point keys meet only the few continent-sized lines.
    """
    D = _PH_DEPTH
    x0, y0 = _grid_xy("lminx", "lminy")
    x1, y1 = _grid_xy("lmaxx", "lmaxy")
    lines_k = (
        hwy_lines.withColumn("_x0", x0).withColumn("_y0", y0)
        .withColumn("_x1", x1).withColumn("_y1", y1)
        # common-prefix depth per axis -> deepest depth with <= 2 cells/axis
        .withColumn(
            "_d",
            F.expr(
                f"least({D} - ({_bitlen('(_x0 ^ _x1)', D)}) + 1, "
                f"least({D} - ({_bitlen('(_y0 ^ _y1)', D)}) + 1, {D}))"
            ),
        )
        .withColumn(
            "_ck",
            F.explode(
                F.expr(
                    f"array_distinct(array("
                    f"shiftleft(CAST(_d AS BIGINT), 40) | shiftleft(shiftright(_x0, {D} - _d), 20) | shiftright(_y0, {D} - _d),"
                    f"shiftleft(CAST(_d AS BIGINT), 40) | shiftleft(shiftright(_x1, {D} - _d), 20) | shiftright(_y0, {D} - _d),"
                    f"shiftleft(CAST(_d AS BIGINT), 40) | shiftleft(shiftright(_x0, {D} - _d), 20) | shiftright(_y1, {D} - _d),"
                    f"shiftleft(CAST(_d AS BIGINT), 40) | shiftleft(shiftright(_x1, {D} - _d), 20) | shiftright(_y1, {D} - _d)))"
                )
            ),
        )
        .drop("_x0", "_y0", "_x1", "_y1", "_d")
    )
    px, py = _grid_xy("minx", "miny")
    pts_k = (
        pts.select("id", "minx", "miny")
        .withColumn("_px", px).withColumn("_py", py)
        .withColumn(
            "_ck",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {D}), a -> "
                    f"shiftleft(CAST(a AS BIGINT), 40) | "
                    f"shiftleft(shiftright(_px, {D} - a), 20) | shiftright(_py, {D} - a))"
                )
            ),
        )
        .drop("_px", "_py")
    )
    return (
        pts_k.join(lines_k, "_ck")
        .filter(
            (F.col("minx") >= F.col("lminx")) & (F.col("minx") <= F.col("lmaxx"))
            & (F.col("miny") >= F.col("lminy")) & (F.col("miny") <= F.col("lmaxy"))
        )
        .groupBy("id")
        .agg(F.min_by("l_highway", "l_osm_id").alias("parent_highway"))
    )


def register_tables(
    spark: SparkSession,
    elements: DataFrame,
    style_path: str = STYLE_PATH,
    parent_highway: bool = True,
    relations: DataFrame | None = None,
    ways: DataFrame | None = None,
    nodes: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Create temp views planet_osm_point / line / polygon / roads.

    Geometry routing: our doc model declares geometry type per span
    (POINT/LINESTRING/POLYGON), so the point table takes geom_type 0, line 1,
    polygon 2 — with the reference's IsPoly='maybe' area-tag override: a
    POLYGON span tagged ``area=no`` lands in the line table instead
    (``extrastyle.json:9``, IsPoly maybe semantics).

    When ``relations``/``ways``/``nodes`` are given, multipolygon-relation
    geometries (rel_wkt — ``geometry.Multi``) are assembled and unioned into
    planet_osm_polygon with NEGATIVE osm_ids and member-LCA quadtrees, the
    reference's relation-row convention (``osmquadtree-postgis.go:279-284``
    id sign, ``:265-274`` GeometryType 7 rows).
    """
    style = load_style(style_path)
    node_tags = [s["Tag"] for s in style if s.get("IsNode") and s["Type"] == "text"]
    way_tags = [s["Tag"] for s in style if s.get("IsWay") and s["Type"] == "text"]

    def proj(tags: list[str]):
        return [F.element_at(F.col("tags"), t).alias(t) for t in sorted(set(tags))]

    base = elements.withColumn("osm_id", _osm_id()).withColumn(
        "quadtree", F.col("qt")
    ).withColumn("way", F.col("wkt"))

    area_no = F.element_at(F.col("tags"), "area").isin("no", "0", "false")

    # A6 calc_parent (extrastyle.json:73): a point inherits the highway value
    # of a containing way — doc-model analogue: highway of the smallest-id
    # LINESTRING whose bbox contains the point center. Cell equi-join (see
    # _parent_highway) — never a broadcast nested-loop theta join. Built only
    # when `parent_highway=True`: the left join would survive in every plan
    # over planet_osm_point even when the column is never projected (Catalyst
    # cannot eliminate an outer join without unique-key metadata), so callers
    # whose query set never touches the column can skip it outright.
    pts = base.filter(F.col("geom_type") == 0)
    if parent_highway:
        hwy_lines = (
            base.filter(
                (F.col("geom_type") == 1)
                & F.element_at(F.col("tags"), "highway").isNotNull()
            )
            .select(
                F.col("minx").alias("lminx"), F.col("miny").alias("lminy"),
                F.col("maxx").alias("lmaxx"), F.col("maxy").alias("lmaxy"),
                F.col("osm_id").alias("l_osm_id"),
                F.element_at(F.col("tags"), "highway").alias("l_highway"),
            )
        )
        parent = _parent_highway(pts, hwy_lines)
        point = pts.join(parent, "id", "left").select(
            "osm_id", "quadtree", "way", F.col("parent_highway"), *proj(node_tags)
        )
    else:
        point = pts.select(
            "osm_id", "quadtree", "way",
            F.lit(None).cast("string").alias("parent_highway"), *proj(node_tags)
        )
    line = (
        base.filter(
            (F.col("geom_type") == 1) | ((F.col("geom_type") == 2) & area_no)
        )
        .withColumn("z_order", z_order())
        .select("osm_id", "quadtree", "way", "z_order", *proj(way_tags))
    )
    polygon = (
        base.filter((F.col("geom_type") == 2) & ~F.coalesce(area_no, F.lit(False)))
        .withColumn("z_order", z_order())
        .withColumn("way_area", way_area_merc(F.col("wkt")))
        .select("osm_id", "quadtree", "way", "z_order", "way_area", *proj(way_tags))
    )
    if relations is not None:
        from ..operators.element_joins import (
            node_qts,
            rel_wkt,
            relation_qts,
            way_qts,
        )

        rq = relation_qts(relations, node_qts(nodes), way_qts(ways, nodes))
        mp = rel_wkt(relations, ways, nodes).filter(F.col("wkt").isNotNull())
        rel_tags = (
            relations.select("id", "tags")
            if "tags" in relations.columns
            else relations.select(
                "id", F.lit(None).cast("map<string,string>").alias("tags")
            )
        )
        mp_rows = (
            mp.join(rel_tags, "id", "left")
            .join(rq.withColumnRenamed("qt", "quadtree"), "id", "left")
            .withColumn("z_order", z_order())
            .select(
                (-F.col("id")).alias("osm_id"),  # relation rows: negative ids
                F.coalesce("quadtree", F.lit(0)).alias("quadtree"),
                F.col("wkt").alias("way"),
                "z_order",
                way_area_merc(F.col("wkt")).alias("way_area"),
                *proj(way_tags),
            )
        )
        polygon = polygon.unionByName(mp_rows)

    point.createOrReplaceTempView("planet_osm_point")
    line.createOrReplaceTempView("planet_osm_line")
    polygon.createOrReplaceTempView("planet_osm_polygon")
    roads = spark.sql(translate(ROADS_VIEW_SQL))
    roads.createOrReplaceTempView("planet_osm_roads")
    return {
        "planet_osm_point": point,
        "planet_osm_line": line,
        "planet_osm_polygon": polygon,
        "planet_osm_roads": roads,
    }
