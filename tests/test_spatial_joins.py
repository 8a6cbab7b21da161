"""PIP join, kNN, raster↔vector join, element-assembly joins (SURVEY.md §2.3)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_bin_spark import quadtree as qtk
from osmquadtree_bin_spark.datagen import gen_elements, gen_regions, gen_tile_requests
from osmquadtree_bin_spark.operators.element_joins import (
    node_qts,
    node_qts_with_way_backprop,
    relation_qts,
    way_qts,
)
from osmquadtree_bin_spark.operators.knn import knn_bruteforce, knn_tiled
from osmquadtree_bin_spark.operators.pip_join import idset_trim, pip_join, region_tiles
from osmquadtree_bin_spark.operators.raster_vector import raster_vector_join
from osmquadtree_bin_spark.spans import explode_geoms


@pytest.fixture(scope="module")
def elements(spark, docs):
    return explode_geoms(docs).cache()


# ------------------------------------------------------------------ PIP join
def test_pip_bbox_matches_pandas_oracle(spark, elements):
    regions = gen_regions(spark)
    got = (
        pip_join(elements, regions)
        .toPandas()
        .sort_values(["region_id", "id"])
        .reset_index(drop=True)
    )
    el = elements.toPandas()
    regs = regions.toPandas()
    rows = []
    for r in regs.itertuples():
        if r.kind == "bbox":
            hit = el[
                (el.minx <= r.maxx) & (el.maxx >= r.minx)
                & (el.miny <= r.maxy) & (el.maxy >= r.miny)
            ]
        else:
            lons = np.asarray(r.lons, dtype=np.float64)
            lats = np.asarray(r.lats, dtype=np.float64)
            cx = ((el.minx + el.maxx) // 2).to_numpy(np.float64)
            cy = ((el.miny + el.maxy) // 2).to_numpy(np.float64)
            from osmquadtree_bin_spark.operators.pip_join import _point_in_rings

            hit = el[_point_in_rings(cx, cy, lons, lats)]
        for _, h in hit.iterrows():
            rows.append((r.region_id, h.id))
    want = pd.DataFrame(rows, columns=["region_id", "id"]).sort_values(
        ["region_id", "id"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["region_id", "id"]], want)


def test_pip_hot_region_nonempty_empty_region_empty(spark, elements):
    regions = gen_regions(spark)
    counts = (
        pip_join(elements, regions).groupBy("region_id").count().toPandas()
        .set_index("region_id")["count"]
    )
    assert counts.get("region_hot", 0) > 0
    assert counts.get("region_empty", 0) == 0


def test_idset_trim_semi_join(spark, elements):
    regions = gen_regions(spark)
    matched = pip_join(elements, regions)
    trimmed = idset_trim(elements, matched)
    assert trimmed.count() == matched.select("id").distinct().count()
    assert set(trimmed.columns) == set(elements.columns)


def test_region_tiles_pruning(spark, elements):
    from osmquadtree_bin_spark.tiling import count_tree, find_groups

    counts = count_tree(elements)
    g = find_groups(
        counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64), 200, 100
    )
    keys = g["tile_qt"].to_numpy(np.int64)
    # London hot bbox should hit a small subset of tiles
    sub = region_tiles(
        int(-0.45e7), int(51.2e7), int(0.25e7), int(51.8e7), keys
    )
    assert 0 < len(sub) < len(keys)


# ---------------------------------------------------------------------- kNN
def test_knn_bruteforce_oracle(spark, elements):
    queries = spark.createDataFrame(
        [("q0", int(-0.13e7), int(51.5e7)), ("q1", int(13.4e7), int(52.5e7))],
        "query_id string, qx long, qy long",
    )
    got = knn_bruteforce(elements, queries, k=5).toPandas()
    el = elements.toPandas()
    cx = (el.minx + el.maxx) // 2
    cy = (el.miny + el.maxy) // 2
    for qid, qx, qy in [("q0", int(-0.13e7), int(51.5e7)), ("q1", int(13.4e7), int(52.5e7))]:
        d2 = (qx - cx).astype(float) ** 2 + (qy - cy).astype(float) ** 2
        order = pd.DataFrame({"id": el.id, "d2": d2}).sort_values(["d2", "id"])
        want_ids = order["id"].head(5).tolist()
        got_ids = got[got.query_id == qid].sort_values("rank")["id"].tolist()
        assert got_ids == want_ids


def test_knn_tiled_matches_bruteforce(spark, elements):
    from osmquadtree_bin_spark.tiling import assign_tiles, count_tree, find_groups

    counts = count_tree(elements)
    g = find_groups(
        counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64), 200, 100
    )
    tiled = assign_tiles(elements, g)
    queries = spark.createDataFrame(
        [("q0", int(-0.13e7), int(51.5e7))], "query_id string, qx long, qy long"
    )
    bf = knn_bruteforce(elements, queries, k=3).toPandas().sort_values("rank")
    tl = knn_tiled(tiled, queries, g, k=3, ring_levels=14).toPandas().sort_values("rank")
    assert tl["id"].tolist() == bf["id"].tolist()


# ------------------------------------------------------------- raster↔vector
def test_raster_vector_join(spark, elements):
    reqs = gen_tile_requests(spark, n=32)
    got = raster_vector_join(elements, reqs).toPandas()
    el = elements.toPandas()
    reqs_pd = reqs.toPandas()
    # oracle: element qt rounded to tilez equals the request cell
    for r in reqs_pd.itertuples():
        key = int(
            qtk.from_tuple(
                np.array([r.tilex]), np.array([r.tiley]), np.array([r.tilez])
            )[0]
        )
        deep = el[(el.qt & 31) >= r.tilez]
        want = set(
            deep.id[qtk.round_to(deep.qt.to_numpy(np.int64), int(r.tilez)) == key]
        )
        have = set(
            got[(got.tilex == r.tilex) & (got.tiley == r.tiley) & (got.tilez == r.tilez)]["id"]
        )
        assert have == want


# ----------------------------------------------------- element assembly joins
def test_way_qts_contains_members(spark):
    nodes, ways, rels = gen_elements(spark)
    wq = way_qts(ways, nodes).toPandas()
    assert len(wq) == ways.count()
    assert ((wq.qt & 31) <= qtk.MAX_DEPTH).all()


def test_node_backprop_is_ancestor_of_own(spark):
    nodes, ways, rels = gen_elements(spark)
    wq = way_qts(ways, nodes)
    own = node_qts(nodes).toPandas().set_index("id")["qt"]
    merged = node_qts_with_way_backprop(nodes, ways, wq).toPandas().set_index("id")["qt"]
    # merged qt must be ancestor-of-or-equal of the node's own point qt
    common_idx = own.index.intersection(merged.index)
    anc = merged.loc[common_idx].to_numpy(np.int64)
    chl = own.loc[common_idx].to_numpy(np.int64)
    assert qtk.is_ancestor(anc, chl).all()


def test_relation_qts_edge_cases(spark):
    nodes, ways, rels = gen_elements(spark)
    wq = way_qts(ways, nodes)
    nq = node_qts_with_way_backprop(nodes, ways, wq)
    rq = relation_qts(rels, nq, wq).toPandas().set_index("id")["qt"]
    n_rels = rels.count()
    assert len(rq) == n_rels
    # circular, empty, and missing-member relations default to qt 0
    assert rq.loc[n_rels - 3] == 0
    assert rq.loc[n_rels - 2] == 0
    assert rq.loc[n_rels - 1] == 0
    # ordinary relations resolve to a valid key
    assert (rq.drop([n_rels - 3, n_rels - 2, n_rels - 1]) >= 0).all()


def test_way_wkt_assembly(spark):
    """Ordered coord assembly (geometry.GenerateGeometries analogue):
    closed ring -> POLYGON, open -> LINESTRING, missing refs skipped,
    under-2-point ways -> NULL wkt; member order preserved exactly."""
    from osmquadtree_bin_spark.operators.element_joins import way_wkt

    nodes = spark.createDataFrame(
        [(1, 10, 20), (2, 30, 20), (3, 30, 40), (4, 10, 40)],
        "id long, lon long, lat long",
    )
    ways = spark.createDataFrame(
        [
            (100, [1, 2, 3, 4, 1]),      # closed ring -> POLYGON
            (101, [4, 2, 3]),            # open -> LINESTRING (order kept)
            (102, [1, 999, 3]),          # missing ref dropped -> 2-pt line
            (103, [2]),                  # 1 point -> NULL
            (104, [999, 998]),           # nothing resolves -> NULL, npoints 0
        ],
        "id long, refs array<long>",
    )
    got = {r["id"]: (r["wkt"], r["npoints"]) for r in way_wkt(ways, nodes).collect()}
    assert got[100] == ("POLYGON((10 20, 30 20, 30 40, 10 40, 10 20))", 5)
    assert got[101] == ("LINESTRING(10 40, 30 20, 30 40)", 3)
    assert got[102] == ("LINESTRING(10 20, 30 40)", 2)
    assert got[103] == (None, 1)
    assert got[104] == (None, 0)
    # assembled WKT round-trips through the span bbox parser convention
    import re
    toks = [int(t) for t in re.split(r"[^-0-9]+", got[100][0]) if t]
    assert min(toks[0::2]) == 10 and max(toks[1::2]) == 40
