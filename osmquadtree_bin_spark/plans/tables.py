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

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dialect import translate
from ..functions.zorder import way_area_merc, z_order

STYLE_PATH = "/root/reference/extrastyle.json"

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


def register_tables(
    spark: SparkSession, elements: DataFrame, style_path: str = STYLE_PATH
) -> dict[str, DataFrame]:
    """Create temp views planet_osm_point / line / polygon / roads.

    Geometry routing: our doc model declares geometry type per span
    (POINT/LINESTRING/POLYGON), so the point table takes geom_type 0, line 1,
    polygon 2 — with the reference's IsPoly='maybe' area-tag override: a
    POLYGON span tagged ``area=no`` lands in the line table instead
    (``extrastyle.json:9``, IsPoly maybe semantics).
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
    # LINESTRING whose bbox contains the point center. Broadcast the (small)
    # highway-line side; at planet scale this becomes a tile-equi-join against
    # the tiled table instead of a theta join.
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
    pts = base.filter(F.col("geom_type") == 0)
    parent = (
        pts.select("id", "minx", "miny")
        .join(
            F.broadcast(hwy_lines),
            (F.col("minx") >= F.col("lminx")) & (F.col("minx") <= F.col("lmaxx"))
            & (F.col("miny") >= F.col("lminy")) & (F.col("miny") <= F.col("lmaxy")),
        )
        .groupBy("id")
        .agg(F.min_by("l_highway", "l_osm_id").alias("parent_highway"))
    )
    point = (
        pts.join(parent, "id", "left")
        .select("osm_id", "quadtree", "way", F.col("parent_highway"), *proj(node_tags))
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
