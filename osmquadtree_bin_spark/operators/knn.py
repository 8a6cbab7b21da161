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
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

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

    Fully distributed in the query count: candidate tiles per query are
    computed INSIDE a vectorized pandas UDF (no driver collect, no per-query
    Python loop on the driver) — the tile bounds table (<= ~500k rows at
    planet scale) is closure-broadcast, sorted by minx so each query narrows
    to an x-strip with two searchsorteds before the exact y/x filter. The
    query window is the buffered bbox of the ``ring_levels``-th ancestor of
    the query's level-17 cell; the candidate join is a plain equi-join on
    tile_idx (partition-prunable; AQE broadcasts whichever side is small).
    """
    tile_keys = groups["tile_qt"].to_numpy(np.int64)
    tile_idx = groups["tile_idx"].to_numpy(np.int64)
    bminx, bminy, bmaxx, bmaxy = qtk.bounds(tile_keys, 0.05)
    order = np.argsort(bminx, kind="stable")
    sminx, smaxx = bminx[order], bmaxx[order]
    sminy, smaxy = bminy[order], bmaxy[order]
    sidx = tile_idx[order]
    max_w = int((smaxx - sminx).max()) if len(sminx) else 0
    anc_level = max(0, 17 - ring_levels)

    @pandas_udf(ArrayType(LongType()))
    def _cand_tiles(qx: pd.Series, qy: pd.Series) -> pd.Series:
        qxa = qx.to_numpy(np.int64)
        qya = qy.to_numpy(np.int64)
        qkey = qtk.point_quadtree(qxa, qya, qtk.MAX_DEPTH)
        anc = qtk.round_to(qkey, anc_level)
        aminx, aminy, amaxx, amaxy = qtk.bounds(anc, 0.05)
        out = []
        for i in range(len(qxa)):
            lo = np.searchsorted(sminx, aminx[i] - max_w, side="left")
            hi = np.searchsorted(sminx, amaxx[i], side="right")
            sl = slice(lo, hi)
            m = (
                (smaxx[sl] >= aminx[i])
                & (sminy[sl] <= amaxy[i])
                & (smaxy[sl] >= aminy[i])
            )
            out.append(sidx[sl][m].tolist())
        return pd.Series(out)

    cand_tiles = queries.select(
        "query_id", "qx", "qy",
        F.explode(_cand_tiles(F.col("qx"), F.col("qy"))).alias("tile_idx"),
    )
    cand = _with_center(elements_tiled).join(cand_tiles, "tile_idx")
    w = Window.partitionBy("query_id").orderBy(_dist2().asc(), F.col("id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "rank")
    )
