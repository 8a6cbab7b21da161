"""Interleaved-document span handling.

Input table shape (BASELINE.json ``input_hint``):
    doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>

``explode_geoms`` flattens the geometry-bearing spans into element rows with
(doc_id, span_idx) lineage, WKT bbox, tags, packed id and quadtree key — the
Spark analogue of the reference's element stream (SURVEY.md §1.4).

SPAN-SEQUENCE INVARIANT (the graft's hard rule): the ``spans`` array itself is
NEVER exploded-and-regrouped by the pipeline — results join back to documents
by ``doc_id``, so (kind, text, media_ref, order) survives bit-identical.
``span_fingerprint`` gives an order-sensitive digest used by tests and by the
lineage ledger to prove it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from .udfs import qt_calculate

# packed id: element type in bits >=59, low 40 bits the sequence id
# (reference convention: /root/reference/osmquadtree-postgis.go:279-284)
TYPE_POINT, TYPE_LINE, TYPE_POLYGON = 0, 1, 2


_WKT_BBOX_SCHEMA = StructType(
    [
        StructField("geom_type", IntegerType()),
        StructField("minx", LongType()),
        StructField("miny", LongType()),
        StructField("maxx", LongType()),
        StructField("maxy", LongType()),
        StructField("npoints", IntegerType()),
    ]
)


@pandas_udf(_WKT_BBOX_SCHEMA)
def _wkt_bbox(wkt: pd.Series) -> pd.DataFrame:
    """Vectorized WKT → (type, bbox, npoints). Pandas str ops only (C loops
    inside Arrow batches, no per-row Python UDF)."""
    s = wkt.astype("string").fillna("")
    gtype = np.where(
        s.str.startswith("POINT"), TYPE_POINT,
        np.where(s.str.startswith("LINESTRING"), TYPE_LINE, TYPE_POLYGON),
    ).astype(np.int32)
    nums = s.str.findall(r"-?\d+")
    minx = np.zeros(len(s), dtype=np.int64)
    miny = np.zeros(len(s), dtype=np.int64)
    maxx = np.zeros(len(s), dtype=np.int64)
    maxy = np.zeros(len(s), dtype=np.int64)
    npts = np.zeros(len(s), dtype=np.int32)
    for i, lst in enumerate(nums):
        if not isinstance(lst, list) or not lst:
            continue
        arr = np.asarray(lst, dtype=np.int64)
        xs, ys = arr[0::2], arr[1::2]
        minx[i], maxx[i] = xs.min(), xs.max()
        miny[i], maxy[i] = ys.min(), ys.max()
        npts[i] = len(xs)
    return pd.DataFrame(
        {"geom_type": gtype, "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
         "npoints": npts}
    )


def explode_geoms(docs: DataFrame) -> DataFrame:
    """Flatten geom spans → element rows with lineage + qt key.

    Spark shape: posexplode → filter → split → str_to_map → pandas-UDF bbox →
    pandas-UDF quadtree. All narrow (no shuffle); Catalyst prunes the scan to
    (doc_id, spans).
    """
    e = (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .filter(F.col("span.kind") == "geom")
        .select(
            "doc_id",
            "span_idx",
            F.col("span.offset").alias("offset"),
            F.split(F.col("span.text"), r"\|", 2).alias("_parts"),
        )
        .select(
            "doc_id",
            "span_idx",
            "offset",
            F.col("_parts")[0].alias("wkt"),
            F.coalesce(F.col("_parts")[1], F.lit("")).alias("tagstr"),
        )
        .withColumn("tags", F.str_to_map("tagstr", F.lit(";"), F.lit("=")))
        .withColumn("_g", _wkt_bbox(F.col("wkt")))
        .select(
            "doc_id", "span_idx", "offset", "wkt", "tags",
            F.col("_g.geom_type").alias("geom_type"),
            F.col("_g.minx").alias("minx"), F.col("_g.miny").alias("miny"),
            F.col("_g.maxx").alias("maxx"), F.col("_g.maxy").alias("maxy"),
            F.col("_g.npoints").alias("npoints"),
        )
        .withColumn("qt", qt_calculate("minx", "miny", "maxx", "maxy"))
    )
    # packed id: (geom_type << 59) | (doc seq * 64 + span_idx)  — low 40 bits
    seq = F.regexp_extract("doc_id", r"(\d+)", 1).cast("long") * 64 + F.col("span_idx")
    return e.withColumn(
        "id",
        F.shiftleft(F.col("geom_type").cast("long"), 59).bitwiseOR(
            seq.bitwiseAND(F.lit((1 << 40) - 1))
        ),
    )


def span_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive per-doc digest of (kind, text, media_ref, order).

    Pure built-in functions (no shuffle, no explode): the invariant check is
    a narrow map over the original array column.
    """
    return docs.select(
        "doc_id",
        F.md5(
            F.to_json(
                F.transform(
                    "spans",
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                        s["offset"].alias("offset"),
                    ),
                )
            )
        ).alias("span_digest"),
    )
