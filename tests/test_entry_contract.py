"""Driver-contract validation: every queries() entry runs; every oracle_sql()
entry matches the Spark result on row count, column names, and values —
mimicking the driver's order-insensitive compare at sf0.01-style data
(sf0.001 here to keep CI fast; the driver runs the real sf0.01 gate)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
# fixture-backed oracles (q26-q30) must read the fixture set for THIS scale
os.environ["SPARK_GRAFT_ORACLE_SF"] = "sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"tile_idx", "tile_qt", "n_elements"} <= set(df.columns)


def test_all_queries_run(spark):
    qs = entrymod.queries()
    assert len(qs) >= 25
    before = {k for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
    # round-4 verdict #5: no operator may leak a session-lifetime cache —
    # every .persist()/.cache() inside queries() must be released (or never
    # registered) by the time the query's action completes
    after = {k for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    assert after <= before, f"queries() leaked persistent RDDs: {sorted(after - before)}"


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_matches(spark, duck, name):
    qs = entrymod.queries()
    assert name in qs, f"oracle {name} has no queries() entry"
    got = _normalize(qs[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_q26_rollup_equals_distributed(spark):
    """q26's driver-side count-tree rollup must equal the distributed
    assign_tiles + groupBy form bit-for-bit (the r06 optimization replaced
    the second full pass with a rollup of the already-collected level-17
    count tree — guide §8 'decide with small rows'; this pins the
    equivalence end-to-end on the same staged input)."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmquadtree_bin_spark.spans import explode_geoms
    from osmquadtree_bin_spark.tiling import tiling_pipeline

    qs = entrymod.queries()
    got = _normalize(qs["q26_tiling_pipeline"](spark, SF_DIR).toPandas())

    docs = entrymod._staged_docs(spark, 400 * entrymod._sf_mult(SF_DIR))
    assigned, _c, _g = tiling_pipeline(docs, target=500, minimum=250)
    want = _normalize(
        assigned.groupBy("tile_idx", "tile_qt")
        .agg(F.count(F.lit(1)).alias("n_elements"))
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_full_sf_lsh_companions_invariants(spark):
    """q28b/q29b (rows-only, full-sf LSH): the in-plan invariants hold and
    the subset counts are threshold-monotone."""
    qs = entrymod.queries()
    r28 = qs["q28b_minhash_full_sf"](spark, SF_DIR).collect()[0]
    assert r28["threshold_ok"] and r28["bound_ok"]
    assert r28["n_pairs_07"] <= r28["n_pairs_05"]
    r29 = qs["q29b_simhash_full_sf"](spark, SF_DIR).collect()[0]
    assert r29["verified_ok"]
    assert r29["n_pairs_k4"] <= r29["n_pairs_k8"]
