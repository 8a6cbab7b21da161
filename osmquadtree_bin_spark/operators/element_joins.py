"""Element-assembly joins (J2, J3, J4) — the rebase/prepare quadtree resolution.

Reference semantics (``/root/reference/osmquadtree-rebase.go``):
  J2 (:397-404)  way bbox = min/max over member node locations, then
                 ``quadtree.Calculate(bbox, 0.05, 18)``.
  J3 (:365-379)  each member node's qt merges the way qt via Common (LCA);
                 a node not used by any way falls back to its own point qt
                 (:108-113).
  J4 (:184-312)  relation qt = LCA of member node/way qts; relation-of-
                 relation resolved by 5 fixed-point iterations (:275-282);
                 unresolved leftovers default to qt 0 (:304-312).

Spark shape (SURVEY.md §2.3): explode refs → equi-join on node id (THE big
shuffle — both sides repartitioned on ref) → groupBy way → min/max agg →
vectorized Calculate; back-propagation is the reverse join + LCA grouped agg;
relations are a fixed 5-iteration loop of explode-join-agg, exactly the
reference's unroll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.qtsql import with_qt_sql
from ..udfs import qt_lca_agg, qt_point


def node_qts(nodes: DataFrame) -> DataFrame:
    """Own-location qt per node (fallback when no way contains it)."""
    return nodes.select("id", qt_point(F.col("lon"), F.col("lat")).alias("qt"))


def way_qts(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J2: (way id, qt) via member-location bbox + Calculate."""
    refs = ways.select("id", F.explode("refs").alias("ref"))
    joined = refs.join(
        nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref"
    )
    bbox = joined.groupBy("id").agg(
        F.min("lon").alias("minx"),
        F.min("lat").alias("miny"),
        F.max("lon").alias("maxx"),
        F.max("lat").alias("maxy"),
    )
    return with_qt_sql(bbox).select("id", "qt")


def way_wkt(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Way-geometry assembly: ordered member-node coordinates → WKT — the
    analogue of ``geometry.GenerateGeometries``
    (``/root/reference/osmquadtree-geometry.go:811``): a way whose ref list
    closes (first == last, >= 4 points) becomes a POLYGON ring, otherwise a
    LINESTRING; fixed-point int coords (the engine's WKT convention).

    Spark shape: posexplode refs → equi-join on node id (the one big
    shuffle, same as way_qts) → groupBy way → array_sort(collect_list) by
    position → pure JVM string assembly. Refs pointing at missing nodes are
    dropped from the sequence (the reference skips unresolvable members);
    ways with < 2 resolved points yield wkt = NULL."""
    refs = ways.select("id", F.posexplode("refs").alias("pos", "ref"))
    joined = refs.join(
        nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref"
    )
    pts = joined.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))),
            lambda s: F.concat_ws(
                " ", s["lon"].cast("string"), s["lat"].cast("string")
            ),
        ).alias("coords")
    )
    n = F.size("coords")
    closed = (n >= 4) & (F.element_at("coords", 1) == F.element_at("coords", -1))
    body = F.concat_ws(", ", F.col("coords"))
    wkt = (
        F.when(n < 2, F.lit(None).cast("string"))
        .when(closed, F.concat(F.lit("POLYGON(("), body, F.lit("))")))
        .otherwise(F.concat(F.lit("LINESTRING("), body, F.lit(")")))
    )
    # left join back so refs-but-no-resolved-node ways still appear (null)
    return ways.select("id").join(
        pts.select("id", wkt.alias("wkt"), n.alias("npoints")), "id", "left"
    ).select("id", "wkt", F.coalesce("npoints", F.lit(0)).alias("npoints"))


def node_qts_with_way_backprop(nodes: DataFrame, ways: DataFrame, wqts: DataFrame) -> DataFrame:
    """J3: node qt = LCA(own point qt, qts of all ways using it)."""
    own = node_qts(nodes)
    way_member = (
        ways.select("id", F.explode("refs").alias("nid"))
        .join(wqts.withColumnRenamed("qt", "way_qt"), "id")
        .select(F.col("nid").alias("id"), F.col("way_qt").alias("qt"))
    )
    merged = own.unionByName(way_member)
    return merged.groupBy("id").agg(qt_lca_agg(F.col("qt")).alias("qt"))


def way_admin_levels(relations: DataFrame) -> DataFrame:
    """A5 calc_minmax (``extrastyle.json:71-72``, cols added
    ``osmquadtree-postgis.go:83-86``): per way, min/max admin_level over the
    administrative-boundary relations containing it. ``relations`` needs
    (id, members, tags:map)."""
    admin = relations.filter(
        (F.element_at(F.col("tags"), "boundary") == "administrative")
        & F.element_at(F.col("tags"), "admin_level").rlike(r"^[0-9]+$")
    ).select(
        F.element_at(F.col("tags"), "admin_level").cast("long").alias("admin_level"),
        F.explode("members").alias("m"),
    )
    way_members = admin.filter(F.col("m.mtype") == 1).select(
        F.col("m.ref").alias("id"), "admin_level"
    )
    return way_members.groupBy("id").agg(
        F.min("admin_level").alias("min_admin_level"),
        F.max("admin_level").alias("max_admin_level"),
    )


def way_route_lists(relations: DataFrame, route_type: str = "bus") -> DataFrame:
    """A7 calc_list (``extrastyle.json:74``, split back out
    ``osmquadtree-geometry-features.go:411-440``): per way, the sorted
    ';'-joined refs of the ``route=<type>`` relations containing it."""
    routes = relations.filter(
        (F.element_at(F.col("tags"), "route") == route_type)
        & F.element_at(F.col("tags"), "ref").isNotNull()
    ).select(
        F.element_at(F.col("tags"), "ref").alias("ref"), F.explode("members").alias("m")
    )
    way_members = routes.filter(F.col("m.mtype") == 1).select(
        F.col("m.ref").alias("id"), "ref"
    )
    return way_members.groupBy("id").agg(
        F.concat_ws(";", F.sort_array(F.collect_set("ref"))).alias(f"{route_type}_routes")
    )


def relation_qts(
    relations: DataFrame, nqts: DataFrame, wqts: DataFrame, iterations: int = 5
) -> DataFrame:
    """J4: relation qt = LCA of member qts; rel-of-rel via the reference's
    fixed 5-iteration unroll; unresolved → qt 0 (``osmquadtree-rebase.go:304``)."""
    members = relations.select(
        "id", F.explode("members").alias("m")
    ).select("id", F.col("m.mtype").alias("mtype"), F.col("m.ref").alias("ref"))

    node_side = members.filter(F.col("mtype") == 0).join(
        nqts.select(F.col("id").alias("ref"), F.col("qt")), "ref"
    ).select("id", "qt")
    way_side = members.filter(F.col("mtype") == 1).join(
        wqts.select(F.col("id").alias("ref"), F.col("qt")), "ref"
    ).select("id", "qt")
    base = node_side.unionByName(way_side)

    rel_members = members.filter(F.col("mtype") == 2).cache()
    # iteration 0: relations with only node/way members resolve immediately
    resolved = base.groupBy("id").agg(qt_lca_agg(F.col("qt")).alias("qt"))
    for _ in range(iterations):
        # rel-of-rel: pull current member-relation qts in, recompute LCA
        from_rels = rel_members.join(
            resolved.select(F.col("id").alias("ref"), F.col("qt")), "ref"
        ).select("id", "qt")
        resolved = (
            base.unionByName(from_rels)
            .groupBy("id")
            .agg(qt_lca_agg(F.col("qt")).alias("qt"))
        )
    # leftovers (circular / missing members, empty relations) default to 0
    all_rels = relations.select("id")
    return all_rels.join(resolved, "id", "left").select(
        "id", F.coalesce(F.col("qt"), F.lit(0)).alias("qt")
    )
