"""kNN lookups over tiled geometry (north-rule operator).

Two physical strategies:
  * ``knn_bruteforce`` — cross-join query points × elements with a cheap
    JVM-side squared-distance expression + ``row_number() <= k`` window.
    Correctness baseline; fine when one side is small (broadcast).
  * ``knn_tiled`` — scale path: candidates limited to elements in the tile
    neighbourhood of each query (tile ring grown until >= k candidates can
    exist), then exact distance + window. The candidate join is an equi-join
    on tile id → shuffle-free against the tile-partitioned table after
    partition pruning.

Distance: squared euclidean in fixed-point lon/lat on the element bbox center
(deterministic integer math — ties broken by id, so results are stable for
golden comparison).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from .. import quadtree as qtk


def _dist2():
    dx = (F.col("qx") - F.col("_cx")).cast("double")
    dy = (F.col("qy") - F.col("_cy")).cast("double")
    return dx * dx + dy * dy


def _with_center(elements: DataFrame) -> DataFrame:
    return elements.withColumn(
        "_cx", ((F.col("minx") + F.col("maxx")) / 2).cast("long")
    ).withColumn("_cy", ((F.col("miny") + F.col("maxy")) / 2).cast("long"))


def knn_bruteforce(elements: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """queries: (query_id string, qx long, qy long). Returns
    (query_id, id, rank) with rank 1..k by (distance, id)."""
    cand = _with_center(elements).crossJoin(F.broadcast(queries))
    w = Window.partitionBy("query_id").orderBy(_dist2().asc(), F.col("id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "rank")
    )


def knn_tiled(
    elements_tiled: DataFrame,
    queries: DataFrame,
    groups,
    k: int = 5,
    ring_levels: int = 2,
) -> DataFrame:
    """Scale path: prune candidates by tile neighbourhood before the exact
    window. ``groups`` is the tiling groups pdf (tile_idx, tile_qt, cnt).

    For each query point we take every tile whose buffered bounds intersect a
    window around the query sized by the ``ring_levels``-th ancestor of the
    query's level-17 cell — driver-side, tiny. The candidate join is then
    ``tile_idx IN (...)`` per query, unioned; with few queries this is
    partition pruning, with many it becomes a broadcast equi-join on tile_idx.
    """
    tile_keys = groups["tile_qt"].to_numpy(np.int64)
    tile_idx = groups["tile_idx"].to_numpy(np.int64)
    qrows = queries.collect()
    pairs = []  # (query_id, tile_idx)
    for r in qrows:
        qkey = qtk.point_quadtree(np.array([r["qx"]]), np.array([r["qy"]]), qtk.MAX_DEPTH)
        anc = qtk.round_to(qkey, max(0, 17 - ring_levels))[0]
        aminx, aminy, amaxx, amaxy = (v[0] for v in qtk.bounds(np.array([anc]), 0.05))
        bminx, bminy, bmaxx, bmaxy = qtk.bounds(tile_keys, 0.05)
        hit = (bminx <= amaxx) & (bmaxx >= aminx) & (bminy <= amaxy) & (bmaxy >= aminy)
        for t in tile_idx[hit]:
            pairs.append((r["query_id"], int(t)))
    spark = elements_tiled.sparkSession
    cand_tiles = spark.createDataFrame(pairs, "query_id string, tile_idx long")
    cand = _with_center(elements_tiled).join(F.broadcast(cand_tiles), "tile_idx")
    cand = cand.join(F.broadcast(queries), "query_id")
    w = Window.partitionBy("query_id").orderBy(_dist2().asc(), F.col("id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "rank")
    )
