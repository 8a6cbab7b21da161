"""spark-submit entry point: spatial extract (the osmquadtree-filter analog).

    spark-submit --py-files dist/osmquadtree_bin_spark.zip jobs/extract_job.py \
        --store <prepare output dir> \
        (--bbox minlon,minlat,maxlon,maxlat | --poly region.poly) \
        --output <dir> [--geojson]

Reads the tiled store written by prepare_job, prunes tiles against the
region (P1), PIP-matches (J7), trims by id set (P4), sorts by id (O2), and
writes parquet (+ optional GeoJSON, S11).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--bbox")
    ap.add_argument("--poly")
    ap.add_argument("--output", required=True)
    ap.add_argument("--geojson", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    from osmquadtree_bin_spark.plans.store import TileQueryEngine
    from osmquadtree_bin_spark.quadtree import COORD_SCALE
    from osmquadtree_bin_spark.sources import poly_to_regions, to_geojson

    spark = SparkSession.builder.appName("oqt-extract").getOrCreate()

    # reconstruct the tile-group table from the tiled store itself
    from pyspark.sql import functions as F

    tiles_df = spark.read.parquet(os.path.join(args.store, "tiles"))
    groups_pdf = (
        tiles_df.groupBy("tile_idx")
        .agg(F.first("tile_qt").alias("tile_qt"), F.count("*").alias("cnt"))
        .toPandas()
        .sort_values("tile_idx")
        .reset_index(drop=True)
    )

    eng = TileQueryEngine(spark, os.path.join(args.store, "tiles"), groups_pdf)

    if args.bbox:
        mnx, mny, mxx, mxy = (float(v) for v in args.bbox.split(","))
        regions = spark.createDataFrame(
            [("extract", "bbox", int(mnx * COORD_SCALE), int(mny * COORD_SCALE),
              int(mxx * COORD_SCALE), int(mxy * COORD_SCALE), None, None)],
            "region_id string, kind string, minx long, miny long, maxx long, "
            "maxy long, lons array<long>, lats array<long>",
        )
    elif args.poly:
        regions = poly_to_regions(spark, args.poly)
    else:
        ap.error("--bbox or --poly required")

    result = eng.extract(regions)
    result.write.mode("overwrite").parquet(os.path.join(args.output, "extract"))
    n = spark.read.parquet(os.path.join(args.output, "extract")).count()
    if args.geojson:
        with open(os.path.join(args.output, "extract.geojson"), "w") as f:
            f.write(to_geojson(result.select("doc_id", "wkt", "geom_type", "id")))
    print(json.dumps({"extracted_rows": n}))


if __name__ == "__main__":
    main()
