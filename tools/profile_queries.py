#!/usr/bin/env python
"""Per-query profiling harness (guide §1.4): noop-sink isolation + plan capture.

Usage:
    python tools/profile_queries.py [qname ...]      # default: all queries
    PROFILE_REPEAT=3 python tools/profile_queries.py q17_pip_regions

Writes .explain("formatted") to plans/r06/<qname>_<tag>.txt when
PROFILE_PLAN_TAG is set (e.g. before/after); always prints noop-sink seconds.
Separate from bench.py (frozen for measurement).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from osmquadtree_bin_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app="oqt-profile", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    repeat = int(os.environ.get("PROFILE_REPEAT", "2"))
    tag = os.environ.get("PROFILE_PLAN_TAG", "")
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "plans", "r06")
    # same warmup as bench.py so first-query numbers are comparable
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 4096, 1, int(CPUS)).select(_warm("id").alias("w")).count()
    from osmquadtree_bin_spark.datagen import gen_docs_dist
    from osmquadtree_bin_spark.spans import explode_geoms

    explode_geoms(
        gen_docs_dist(spark, n_docs=int(CPUS) * 8, seed=1, partitions=int(CPUS))
    ).count()

    for name in names:
        fn = qs[name]
        times = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        if tag:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        print(f"{name}: {times}", flush=True)


if __name__ == "__main__":
    main()
