"""Salted skew join equivalence + Structured Streaming diff ingest."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtree_bin_spark.operators.skew import hot_keys_from_counts, salted_join


def test_hot_key_detection():
    counts = pd.DataFrame({"cell": [1, 2, 3, 4], "cnt": [10, 12, 11, 500]})
    assert hot_keys_from_counts(counts, skew_ratio=3.0) == [4]
    assert hot_keys_from_counts(pd.DataFrame({"cell": [], "cnt": []})) == []


def test_salted_join_matches_plain_join(spark):
    rng = np.random.default_rng(3)
    # skewed big side: 80% of rows on key 7
    keys = np.where(rng.random(20000) < 0.8, 7, rng.integers(0, 50, 20000))
    big = spark.createDataFrame(
        pd.DataFrame({"tile": keys.astype(np.int64), "val": np.arange(20000, dtype=np.int64)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"tile": np.arange(50, dtype=np.int64),
                      "meta": [f"m{i}" for i in range(50)]})
    )
    plain = big.join(small, "tile").groupBy("tile").count().toPandas()
    salted = (
        salted_join(big, small, "tile", hot_keys=[7], factor=8)
        .groupBy("tile").count().toPandas()
    )
    pd.testing.assert_frame_equal(
        plain.sort_values("tile").reset_index(drop=True),
        salted.sort_values("tile").reset_index(drop=True),
    )
    # row-level equality too
    p = big.join(small, "tile").orderBy("val").toPandas()
    s = salted_join(big, small, "tile", [7], 8).orderBy("val").toPandas()
    pd.testing.assert_frame_equal(p, s[p.columns])


def test_salted_join_no_hot_keys_passthrough(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, m string")
    got = salted_join(big, small, "k", hot_keys=[]).collect()
    assert len(got) == 1 and got[0]["m"] == "x"


def test_streaming_ingest(spark, docs, tmp_path):
    from osmquadtree_bin_spark.spans import explode_geoms
    from osmquadtree_bin_spark.streaming.stream_ingest import run_available
    from osmquadtree_bin_spark.streaming.update import TiledStore
    from osmquadtree_bin_spark.tiling import assign_tiles, count_tree, find_groups

    elements = explode_geoms(docs)
    counts = count_tree(elements)
    groups = find_groups(
        counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64), 200, 100
    )
    assigned = assign_tiles(elements, groups).select(
        "id", "doc_id", "span_idx", "wkt", "qt", "tile_idx"
    )
    store = TiledStore(spark, str(tmp_path / "store"))
    store.write_initial(assigned)
    n0 = store.read().count()

    # two diff states as files in a watched directory
    diff_dir = str(tmp_path / "diffs")
    base = assigned.limit(6)
    d1 = base.limit(3).withColumn("changetype", F.lit("modify")).withColumn(
        "version", F.lit(1)
    ).withColumn("state", F.lit(1)).withColumn("wkt", F.concat(F.lit("S1:"), F.col("wkt")))
    d2 = base.limit(2).withColumn("changetype", F.lit("delete")).withColumn(
        "version", F.lit(2)
    ).withColumn("state", F.lit(2))
    d1.write.mode("append").parquet(diff_dir)
    d2.write.mode("append").parquet(diff_dir)

    schema = (
        "id long, doc_id string, span_idx int, wkt string, qt long, tile_idx long, "
        "changetype string, version int, state int"
    )
    run_available(spark, store, diff_dir, str(tmp_path / "ckpt"), schema)

    assert store.resume_state() == 2
    assert store.read().count() == n0 - 2  # 2 deletes
    assert store.read().filter(F.col("wkt").startswith("S1:")).count() == 1  # 3 mod - 2 del

    # re-run: file-source checkpoint + ledger make it a no-op
    run_available(spark, store, diff_dir, str(tmp_path / "ckpt"), schema)
    assert store.read().count() == n0 - 2
