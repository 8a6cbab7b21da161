"""Multipolygon relation assembly (rel_wkt / assemble_multipolygon — the
``geometry.Multi`` analogue, ``osmquadtree-geometry.go:174-178``): kernel unit
tests for every edge the spec pins (two-way ring closure, reversed member
ways, hole assignment, unclosed/degenerate/unresolved drops), the Spark
operator, ring-aware way_area, and the planet_osm_polygon integration.
Engine-vs-independent-oracle equality is pinned separately in
tests/test_independent_oracles.py (q35)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_bin_spark.operators.element_joins import (
    assemble_multipolygon,
    rel_wkt,
)

# hand-built square + hole + open arc, outer split across two ways
OUTER_SQ = [(0, 0), (100, 0), (100, 100), (0, 100)]
HOLE_SQ = [(20, 20), (40, 20), (40, 40), (20, 40)]


def _members_basic(reverse_second=False):
    w11_refs = [3, 4, 1]
    w11_xy = [OUTER_SQ[2], OUTER_SQ[3], OUTER_SQ[0]]
    if reverse_second:
        w11_refs, w11_xy = w11_refs[::-1], w11_xy[::-1]
    return [
        ("outer", 10, [1, 2, 3], [OUTER_SQ[0], OUTER_SQ[1], OUTER_SQ[2]]),
        ("outer", 11, w11_refs, w11_xy),
        ("inner", 12, [5, 6, 7, 8, 5], HOLE_SQ + [HOLE_SQ[0]]),
    ]


EXPECT_WKT = (
    "POLYGON((0 0, 100 0, 100 100, 0 100, 0 0), "
    "(20 20, 20 40, 40 40, 40 20, 20 20))"
)


def test_kernel_two_way_ring_with_hole():
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(_members_basic())
    assert wkt == EXPECT_WKT
    assert (n_outer, n_inner, n_dropped) == (1, 1, 0)


def test_kernel_reversed_member_way():
    """A member way stored in the opposite direction still stitches."""
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(
        _members_basic(reverse_second=True)
    )
    assert wkt == EXPECT_WKT
    assert (n_outer, n_inner, n_dropped) == (1, 1, 0)


def test_kernel_unclosed_chain_dropped():
    members = _members_basic() + [("outer", 13, [9, 10], [(500, 500), (600, 500)])]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert wkt == EXPECT_WKT
    assert (n_outer, n_inner, n_dropped) == (1, 1, 1)


def test_kernel_unresolved_way_dropped_whole():
    """refs=None marks a way with missing nodes: dropped, partner chain
    never closes and is dropped too."""
    members = [
        ("outer", 10, [1, 2, 3], [OUTER_SQ[0], OUTER_SQ[1], OUTER_SQ[2]]),
        ("outer", 11, None, None),
    ]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert wkt is None and n_outer == 0 and n_dropped == 2


def test_kernel_zero_area_ring_dropped():
    members = [("outer", 10, [1, 2, 3, 1], [(0, 0), (10, 0), (20, 0), (0, 0)])]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert wkt is None and n_outer == 0 and n_dropped == 1


def test_kernel_unassigned_inner_dropped():
    # closed triangle far outside the outer → contained by nothing → dropped
    tri = [(900, 900), (950, 900), (950, 950)]
    members = _members_basic() + [
        ("inner", 14, [20, 21, 22, 20], tri + [tri[0]]),
    ]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert wkt == EXPECT_WKT
    assert (n_inner, n_dropped) == (1, 1)


def test_kernel_multipolygon_two_outers():
    far = [(1000, 0), (1100, 0), (1100, 100), (1000, 100)]
    members = _members_basic() + [
        ("outer", 15, [30, 31, 32, 33, 30], far + [far[0]]),
    ]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert n_outer == 2 and n_inner == 1 and n_dropped == 0
    assert wkt.startswith("MULTIPOLYGON(((0 0, ")
    assert "((1000 0, 1100 0, 1100 100, 1000 100, 1000 0))" in wkt
    # the hole is attached to the FIRST (containing) outer, not the second
    assert wkt.index("20 20") < wkt.index("1000 0")


def test_rel_wkt_operator_on_generated_fixture(spark):
    """The Spark operator over the F7 fixture: edge-case classes produce the
    drops they encode; every non-null wkt is well-formed."""
    from osmquadtree_bin_spark.datagen import gen_multipolygon

    nodes, ways, rels = gen_multipolygon(spark, n_rels=21)
    out = rel_wkt(rels, ways, nodes).toPandas().set_index("id").sort_index()
    assert len(out) == 21
    assert (out["n_outer"] >= 1).all()  # every relation has a closing outer
    for r in out.index:
        w = out.loc[r, "wkt"]
        assert w.startswith(("POLYGON((", "MULTIPOLYGON((("))
        if out.loc[r, "n_outer"] > 1:
            assert w.startswith("MULTIPOLYGON")
    # keyed edge cases (classes keyed on r = id - 1, ids are 1-based):
    # zero-area (r%7==1), open arc (r%7==3), outside inner (r%7==5),
    # poisoned ref (r%7==6) all drop at least one way
    for rid in out.index:
        r = rid - 1
        if r % 7 in (1, 3, 5, 6):
            assert out.loc[rid, "n_dropped"] >= 1, rid
        elif r % 7 in (0, 2, 4):
            assert out.loc[rid, "n_dropped"] == 0, rid


def test_way_area_merc_hole_and_multi(spark):
    """Ring-aware way_area: holes subtract, multipolygon parts add."""
    from osmquadtree_bin_spark.functions.zorder import way_area_merc

    s = 1_000_000  # ~0.1 degree squares — mercator-nonlinear but pointwise
    def sq(x0, y0, side):
        pts = [(x0, y0), (x0 + side, y0), (x0 + side, y0 + side), (x0, y0 + side)]
        return ", ".join(f"{x} {y}" for x, y in pts + [pts[0]])

    wkts = [
        f"POLYGON(({sq(0, 0, 10 * s)}))",                       # outer alone
        f"POLYGON(({sq(2 * s, 2 * s, 3 * s)}))",                # hole alone
        # outer with hole (hole clockwise per the rel_wkt contract)
        "POLYGON((" + sq(0, 0, 10 * s) + "), ("
        + ", ".join(
            f"{x} {y}"
            for x, y in [
                (2 * s, 2 * s), (2 * s, 5 * s), (5 * s, 5 * s), (5 * s, 2 * s),
                (2 * s, 2 * s),
            ]
        )
        + "))",
        # two disjoint outers
        f"MULTIPOLYGON((({sq(0, 0, 10 * s)})), (({sq(20 * s, 0, 10 * s)})))",
        "LINESTRING(0 0, 10 10)",
    ]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(wkts)], "i int, wkt string")
    got = dict(
        df.select("i", way_area_merc("wkt").alias("a")).toPandas().itertuples(
            index=False
        )
    )
    outer, hole, with_hole, multi, line = (got[i] for i in range(5))
    assert outer > 0 and hole > 0
    assert abs(with_hole - (outer - hole)) < 1e-6 * outer
    assert line == 0.0
    assert multi > outer  # two disjoint parts add


def test_polygon_table_includes_relation_rows(spark):
    """register_tables(relations=...) unions assembled multipolygons into
    planet_osm_polygon with negative osm_ids (the reference's relation-row
    convention) and member-LCA quadtrees."""
    from osmquadtree_bin_spark.datagen import gen_docs, gen_multipolygon
    from osmquadtree_bin_spark.plans.tables import register_tables
    from osmquadtree_bin_spark.spans import explode_geoms

    docs = gen_docs(spark, n_docs=100, seed=42)
    nodes, ways, rels = gen_multipolygon(spark, n_rels=7)
    # the doc model itself contains relation-typed spans (negative osm_ids),
    # so count the DELTA the multipolygon union adds, then check the added
    # rows by their known 1-based fixture ids (-1 .. -7)
    base = register_tables(spark, explode_geoms(docs), parent_highway=False)
    n_base_neg = base["planet_osm_polygon"].filter(F.col("osm_id") < 0).count()
    tables = register_tables(
        spark, explode_geoms(docs), parent_highway=False,
        relations=rels, ways=ways, nodes=nodes,
    )
    poly = tables["planet_osm_polygon"]
    assert poly.filter(F.col("osm_id") < 0).count() == n_base_neg + 7
    rel_rows = (
        poly.join(base["planet_osm_polygon"], ["osm_id", "way"], "left_anti")
        .filter(F.col("osm_id") < 0)
        .toPandas()
    )
    assert sorted(rel_rows["osm_id"]) == [-7, -6, -5, -4, -3, -2, -1]
    assert rel_rows["way"].str.startswith(("POLYGON", "MULTIPOLYGON")).all()
    assert (rel_rows["way_area"] > 0).all()
    assert (rel_rows["quadtree"] != 0).any()  # member-LCA qts resolved
    # doc-model polygon rows still there (the doc model types every polygon
    # span as a relation, so they're negative too — assert by total count)
    assert poly.count() == base["planet_osm_polygon"].count() + 7
