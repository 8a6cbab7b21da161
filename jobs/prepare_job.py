"""spark-submit entry point: the prepare pipeline (SURVEY.md §3.1) end to end.

    spark-submit --py-files dist/osmquadtree_bin_spark.zip jobs/prepare_job.py \
        --input  <interleaved-docs parquet/Iceberg path> \
        --output <output dir> [--target 8000] [--minimum 4000] [--gen-docs N]

Writes under --output:
    tiles/            tile-partitioned, id-sorted elements (S8)
    assignments/      (id, qt, tile_idx) — the golden S9 output
    qts.txt           count-tree dump, reference "%6d %s" format (S12)
    groups.txt        tile-group dump (S12)
    metrics.json      per-phase wall times (the reference's self-report,
                      osmquadtree-prepare.go:301-305)

``--gen-docs N`` generates a deterministic synthetic input instead of
--input (sandbox/demo mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--target", type=int, default=8000)
    ap.add_argument("--minimum", type=int, default=4000)
    ap.add_argument("--gen-docs", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    from osmquadtree_bin_spark.datagen import gen_docs_dist
    from osmquadtree_bin_spark.spans import explode_geoms, span_fingerprint
    from osmquadtree_bin_spark.tiling import (
        assign_tiles,
        count_tree,
        find_groups,
        group_lines,
        tree_lines,
        write_tiled,
    )

    spark = SparkSession.builder.appName("oqt-prepare").getOrCreate()
    metrics: dict[str, float] = {}

    t0 = time.perf_counter()
    if args.gen_docs:
        docs = gen_docs_dist(spark, args.gen_docs, seed=42)
    else:
        if not args.input:
            ap.error("--input or --gen-docs required")
        docs = spark.read.parquet(args.input)

    # phase 1: calc qts (span parse + Calculate)
    elements = explode_geoms(docs)
    n_elements = elements.count()
    metrics["calc_qts_sec"] = round(time.perf_counter() - t0, 3)

    # phase 2: count tree
    t1 = time.perf_counter()
    counts = count_tree(elements, n_rows_hint=n_elements)
    metrics["make_qt_tree_sec"] = round(time.perf_counter() - t1, 3)

    # phase 3: groups
    t2 = time.perf_counter()
    groups = find_groups(
        counts["cell"].to_numpy(np.int64),
        counts["cnt"].to_numpy(np.int64),
        args.target,
        args.minimum,
    )
    metrics["find_groups_sec"] = round(time.perf_counter() - t2, 3)

    # phase 4: assign + shuffle + write
    t3 = time.perf_counter()
    assigned = assign_tiles(elements, groups, counts=counts)
    write_tiled(assigned, os.path.join(args.output, "tiles"))
    assigned.select("id", "qt", "tile_idx").orderBy("id").write.mode("overwrite").parquet(
        os.path.join(args.output, "assignments")
    )
    metrics["write_tiles_sec"] = round(time.perf_counter() - t3, 3)
    metrics["total_sec"] = round(time.perf_counter() - t0, 3)
    metrics["n_elements"] = n_elements
    metrics["n_groups"] = int(len(groups))

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "qts.txt"), "w") as f:
        f.write(
            "\n".join(
                tree_lines(
                    counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64)
                )
            )
            + "\n"
        )
    with open(os.path.join(args.output, "groups.txt"), "w") as f:
        f.write("\n".join(group_lines(groups)) + "\n")
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
