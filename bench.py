#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs per round):
    python bench.py
    → ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
                      "queries": {name: sec}, "sf": <sf>}
    Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
    /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Scaling mode (north rule: throughput at N vs 4N parallelism, efficiency ≥0.8):
    python bench.py --scaling
    → runs the tile-assignment + PIP-join job at local[8] and local[32] in
      separate JVMs (same input), prints the JSON line with throughput at
      both levels + efficiency, and rewrites BENCH.md.

Internal:
    python bench.py --single-scaling <cpus>   (one scaling measurement, JSON out)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_DOCS_SCALING = int(os.environ.get("BENCH_N_DOCS", "4000"))

HEADLINE = [
    "q01_pricing_summary",
    "q02_join_revenue",
    "q08_newest_wins",
    "q09_minmax_bbox",
    "q14_morton_encode",
    "q15_tile_counts",
    "q17_pip_regions",
    "q19_lca",
    "q20_dedup_exact",
    "q23_lang_counts",
    "q25_knn_cosine",
    "q26_tiling_pipeline",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.0


def run_headline() -> dict:
    from osmquadtree_bin_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app="oqt-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    return {
        "metric": "headline-suite-wall-sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }


def scaling_job(cpus: int) -> dict:
    """The north-rule job: tile assignment over interleaved docs + PIP join.
    Returns rows processed + wall seconds (one JVM at local[cpus])."""
    from pyspark.sql import functions as F

    from osmquadtree_bin_spark.datagen import gen_docs, gen_regions
    from osmquadtree_bin_spark.operators.pip_join import pip_join
    from osmquadtree_bin_spark.session import get_spark
    from osmquadtree_bin_spark.spans import explode_geoms
    from osmquadtree_bin_spark.tiling import assign_tiles, count_tree, find_groups

    spark = get_spark(
        app=f"oqt-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    docs = gen_docs(spark, n_docs=N_DOCS_SCALING, seed=42).repartition(cpus * 2).cache()
    docs.count()  # materialize input outside the timed section
    regions = gen_regions(spark)

    t0 = time.perf_counter()
    elements = explode_geoms(docs).cache()
    n_elements = elements.count()
    counts = count_tree(elements)
    import numpy as np

    groups = find_groups(
        counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64),
        target=2000, minimum=1000,
    )
    assigned = assign_tiles(elements, groups)
    n_assigned = assigned.count()
    pip = pip_join(elements, regions)
    n_pip = pip.count()
    wall = time.perf_counter() - t0

    rows = n_assigned + n_pip
    spark.stop()
    return {
        "cpus": cpus,
        "rows": rows,
        "n_elements": n_elements,
        "wall_sec": round(wall, 4),
        "rows_per_sec": round(rows / wall, 2),
    }


def run_scaling() -> dict:
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single-scaling", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    tput8 = results[8]["rows_per_sec"]
    tput32 = results[32]["rows_per_sec"]
    efficiency = round(tput32 / (4 * tput8), 4)
    payload = {
        "metric": "tile-assign+pip rows/sec scaling local[8]->local[32]",
        "value": efficiency,
        "unit": "efficiency",
        "queries": {
            "local8_rows_per_sec": tput8,
            "local32_rows_per_sec": tput32,
            "local8_wall_sec": results[8]["wall_sec"],
            "local32_wall_sec": results[32]["wall_sec"],
        },
        "sf": N_DOCS_SCALING,
    }
    _write_bench_md(results, efficiency)
    return payload


def _write_bench_md(results: dict, efficiency: float) -> None:
    lines = [
        "# BENCH — scaling evidence (north rule)",
        "",
        "Same tile-assignment + PIP-join job, same deterministic input "
        f"({N_DOCS_SCALING} interleaved docs), two parallelism levels in "
        "separate JVMs (the sandbox stand-in for N vs 4N executors).",
        "",
        "| parallelism | rows | wall (s) | rows/sec |",
        "|---|---|---|---|",
    ]
    for cpus in (8, 32):
        r = results[cpus]
        lines.append(
            f"| local[{cpus}] | {r['rows']} | {r['wall_sec']} | {r['rows_per_sec']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (local[8] → local[32], ×4 cores): {efficiency}**",
        "(target ≥ 0.8 per BASELINE.json north_rule)",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single-scaling":
        print(json.dumps(scaling_job(int(sys.argv[2]))))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
        return
    print(json.dumps(run_headline()))


if __name__ == "__main__":
    main()
