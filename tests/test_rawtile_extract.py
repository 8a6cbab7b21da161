"""TileQueryEngine.rawtile (J8 over the store) and the extract path (§3 filter)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtree_bin_spark import quadtree as qtk
from osmquadtree_bin_spark.datagen import gen_regions
from osmquadtree_bin_spark.plans.store import TileQueryEngine
from osmquadtree_bin_spark.spans import explode_geoms
from osmquadtree_bin_spark.tiling import tiling_pipeline, write_tiled


@pytest.fixture(scope="module")
def engine(spark, docs, tmp_path_factory):
    assigned, counts, groups = tiling_pipeline(docs, target=200, minimum=100)
    path = str(tmp_path_factory.mktemp("store") / "tiles")
    write_tiled(assigned, path)
    return TileQueryEngine(spark, path, groups)


def test_rawtile_matches_oracle(spark, docs, engine):
    el = explode_geoms(docs).toPandas()
    # a zoom-10 cell over the London cluster
    key = qtk.point_quadtree(np.array([int(-0.13e7)]), np.array([int(51.5e7)]), 10)
    tx, ty, tz = (int(v[0]) for v in qtk.to_tuple(key))
    got = set(engine.rawtile(tx, ty, tz).toPandas()["id"])
    deep = el[(el.qt & 31) >= tz]
    want = set(deep.id[qtk.round_to(deep.qt.to_numpy(np.int64), tz) == int(key[0])])
    assert got == want
    assert got, "expected a nonempty hot tile"


def test_extract_sorted_and_trimmed(spark, engine):
    regions = gen_regions(spark)
    res = engine.extract(regions)
    pdf = res.toPandas()
    assert len(pdf) > 0
    assert (np.diff(pdf["id"].to_numpy()) >= 0).all()  # O2 global id sort
    assert pdf["id"].is_unique  # P4 trim dedups multi-region matches
