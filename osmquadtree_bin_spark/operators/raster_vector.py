"""Raster-tile ↔ vector-feature join (J8).

Reference contract: a raster tile request (tilex, tiley, tilez) maps to the
quadtree cell ``quadtree.FromTuple(tx,ty,tz)`` and fetches every feature whose
tile intersects it (``/root/reference/osmquadtree-geometry.go:283-314,436-445``).

Spark shape: requests (small) → encode to qt keys on the driver/UDF →
broadcast equi-join against the tiled feature table on the ancestor
relationship, expressed as a range join on the DFS-pre-order key interval:
a cell C covers element qt E iff round(E, depth(C)) == C, i.e.
``C <= E_pathtrunc`` — implemented as an equi-join on the request cell's
*rounded element key*, so Catalyst keeps it a broadcast hash join (no theta
join, no cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..udfs import qt_from_tuple, qt_round


def raster_vector_join(elements: DataFrame, tile_requests: DataFrame) -> DataFrame:
    """Returns (tilex, tiley, tilez, id) — every element whose qt cell is a
    DESCENDANT-or-equal of the requested raster cell.

    The element side computes round(qt, tz) per distinct zoom present in the
    requests (few — zooms 0..18) and equi-joins on that rounded key: a
    broadcast hash join per zoom, unioned. Elements shallower than the
    request cell are excluded (same as the reference raw-tile fetch, which
    serves the stored tile at exactly that cell and deeper).
    """
    reqs = tile_requests.withColumn(
        "req_qt", qt_from_tuple(F.col("tilex"), F.col("tiley"), F.col("tilez"))
    )
    zooms = [r["tilez"] for r in reqs.select("tilez").distinct().collect()]
    out = None
    for z in sorted(zooms):
        r_z = reqs.filter(F.col("tilez") == z)
        e_z = elements.withColumn("_rq", qt_round(F.col("qt"), F.lit(int(z)))).filter(
            (F.col("qt").bitwiseAND(F.lit(31))) >= int(z)
        )
        j = e_z.join(F.broadcast(r_z), e_z["_rq"] == r_z["req_qt"]).select(
            "tilex", "tiley", "tilez", "id"
        )
        out = j if out is None else out.unionByName(j)
    if out is None:
        return tile_requests.sparkSession.createDataFrame(
            [], "tilex long, tiley long, tilez long, id long"
        )
    return out
