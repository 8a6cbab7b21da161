"""JVM-side quadtree Calculate (functions/qtsql.py) must be bit-identical to
the numpy oracle kernel (quadtree.calculate) — the flagship pipeline now runs
the SQL form, the numpy form pins the semantics."""

import numpy as np
import pandas as pd

from osmquadtree_bin_spark import quadtree as qtk
from osmquadtree_bin_spark.functions.qtsql import with_qt_sql


def _random_bboxes(n=50_000, seed=1):
    rng = np.random.default_rng(seed)
    minx = rng.integers(-1_800_000_000, 1_800_000_000, n)
    miny = rng.integers(-900_000_000, 900_000_000, n)
    w = (rng.exponential(1e5, n) * rng.choice([0, 1, 10, 1000], n)).astype(np.int64)
    h = (rng.exponential(1e5, n) * rng.choice([0, 1, 10, 1000], n)).astype(np.int64)
    maxx = np.minimum(minx + w, 1_800_000_000)
    maxy = np.minimum(miny + h, 900_000_000)
    return pd.DataFrame(
        {"minx": minx, "miny": np.minimum(miny, maxy), "maxx": maxx,
         "maxy": np.maximum(miny, maxy)}
    )


def _boundary_bboxes(seed=2):
    """Bboxes pinned to exact cell corners at several depths — the adversarial
    cases where a 1-ulp float divergence would flip the split decision."""
    rng = np.random.default_rng(seed)
    frames = []
    for d in (1, 4, 9, 17, 18):
        k = 1500
        tx = rng.integers(0, 1 << d, k)
        lon = np.round((tx / (1 << d) * 360 - 180) * 1e7).astype(np.int64)
        lat = np.round(qtk.unit_to_lat(tx / (1 << d)) * 1e7).astype(np.int64)
        frames.append(
            pd.DataFrame(
                {"minx": lon, "miny": lat,
                 "maxx": lon + rng.integers(0, 3, k),
                 "maxy": lat + rng.integers(0, 3, k)}
            )
        )
    return pd.concat(frames, ignore_index=True)


def test_qtsql_matches_numpy_kernel(spark):
    pdf = pd.concat([_random_bboxes(), _boundary_bboxes()], ignore_index=True)
    expected = qtk.calculate(
        pdf.minx.values, pdf.miny.values, pdf.maxx.values, pdf.maxy.values
    )
    got = (
        with_qt_sql(spark.createDataFrame(pdf))
        .select("qt")
        .toPandas()["qt"]
        .to_numpy(np.int64)
    )
    mism = got != expected
    assert not mism.any(), pdf[mism].head(10).to_string()


def test_qtsql_plan_has_no_python_eval(spark):
    """The whole point: qt assignment must not leave the JVM."""
    pdf = _random_bboxes(100)
    plan = with_qt_sql(spark.createDataFrame(pdf))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sever_lineage_preserves_rows_and_schema(spark):
    """sever_lineage is semantically the identity: same rows, same schema,
    same column order — only the Catalyst lineage is cut."""
    from osmquadtree_bin_spark.functions.qtsql import sever_lineage

    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0], {"k": "v"}, None), (2, None, [], {}, 7)],
        "id long, s string, arr array<double>, m map<string,string>, n long",
    )
    out = sever_lineage(df, ["id", "n"])
    assert out.columns == ["s", "arr", "m", "id", "n"]  # severed cols re-appended
    key = lambda r: str(r)
    a = sorted(df.select(*out.columns).collect(), key=key)
    b = sorted(out.collect(), key=key)
    assert a == b
    # the Generate barrier is present and survives optimization
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" in plan and "explode" in plan
