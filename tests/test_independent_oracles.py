"""Engine vs independent-oracle equality for the 7 fixture-oracled queries.

This is the genuine two-implementation cross-check behind the driver's
fixture gate: `tests/independent_oracles.py` re-implements each query in
pure Python/pandas/numpy (no Spark, no engine kernels), and this suite
asserts the Spark engine reproduces those results bit-for-bit (values AND
dtypes) at sf0.001. The driver repeats the same comparison at sf0.01 via the
fixture parquets `make_goldens.py oracle` writes from the same oracles.
"""

import importlib.util
import os

import pytest

import tests.independent_oracles as io

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_queries():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.queries()


def _assert_match(spark_df, oracle_pdf):
    cols = sorted(oracle_pdf.columns)
    got = spark_df.toPandas()
    assert sorted(got.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = oracle_pdf[cols].sort_values(cols).reset_index(drop=True)
    assert dict(a.dtypes.astype(str)) == dict(b.dtypes.astype(str))
    assert len(a) == len(b), f"row count {len(a)} != oracle {len(b)}"
    assert a.equals(b)


def test_q26_tiling_vs_pure_python_walk(spark, entry_queries):
    _assert_match(
        entry_queries["q26_tiling_pipeline"](spark, SF_DIR), io.oracle_q26(400)
    )


def test_q27_pip_vs_scalar_raycast(spark, entry_queries):
    _assert_match(
        entry_queries["q27_pip_polygon"](spark, SF_DIR), io.oracle_q27(200)
    )


def test_q28_minhash_vs_bruteforce_pairs(spark, entry_queries):
    _assert_match(
        entry_queries["q28_minhash_pairs"](spark, SF_DIR), io.oracle_q28(SF_DIR)
    )


def test_q29_simhash_vs_bruteforce_pairs(spark, entry_queries):
    _assert_match(
        entry_queries["q29_simhash_pairs"](spark, SF_DIR), io.oracle_q29(SF_DIR)
    )


def test_q30_multimodal_vs_direct_recompute(spark, entry_queries):
    _assert_match(
        entry_queries["q30_multimodal_features"](spark, SF_DIR), io.oracle_q30(100)
    )


def test_q32_ivf_vs_numpy_ivf(spark, entry_queries):
    _assert_match(
        entry_queries["q32_ivf_topk"](spark, SF_DIR), io.oracle_q32(SF_DIR)
    )


def test_q33_near_dup_vs_bruteforce_cosine(spark, entry_queries):
    _assert_match(
        entry_queries["q33_embedding_near_dup"](spark, SF_DIR), io.oracle_q33(SF_DIR)
    )


def test_q35_multipolygon_vs_scalar_assembly(spark, entry_queries):
    _assert_match(
        entry_queries["q35_multipolygon_assembly"](spark, SF_DIR), io.oracle_q35(40)
    )


def test_fixtures_were_generated_from_oracles():
    """The committed fixture parquets must equal the oracle output — i.e.
    regenerating them is a no-op and the driver's gate compares against the
    independent implementation, not a stale engine snapshot."""
    import pandas as pd

    for sf, mult in (("sf0.001", 1), ("sf0.01", 10)):
        sf_dir = f"/root/testdata/{sf}"
        frames = {
            "q26_tiling_pipeline": io.oracle_q26(400 * mult),
            "q27_pip_polygon": io.oracle_q27(200 * mult),
            "q28_minhash_pairs": io.oracle_q28(sf_dir),
            "q29_simhash_pairs": io.oracle_q29(sf_dir),
            "q30_multimodal_features": io.oracle_q30(100 * mult),
            "q32_ivf_topk": io.oracle_q32(sf_dir),
            "q33_embedding_near_dup": io.oracle_q33(sf_dir),
            "q35_multipolygon_assembly": io.oracle_q35(40 * mult),
        }
        for name, odf in frames.items():
            path = os.path.join(REPO, "tests", "golden", "oracle", sf, f"{name}.parquet")
            fx = pd.read_parquet(path)
            cols = sorted(odf.columns)
            a = odf[cols].sort_values(cols).reset_index(drop=True)
            b = fx[cols].sort_values(cols).reset_index(drop=True)
            assert a.equals(b), f"{sf}/{name} fixture is stale vs oracle"
