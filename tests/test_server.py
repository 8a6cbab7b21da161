"""HTTP serving surface (server.py) — offline, localhost-only.

Covers the reference server's route set (tile / bbox / sql query / extract /
status / UI page) and its exact cache sizing (1 bbox result, 3 raw-tile
results, osmquadtree-geometry.go:235-243 & :291-298)."""

import json
import urllib.parse
import urllib.request

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    from osmquadtree_bin_spark.datagen import gen_docs
    from osmquadtree_bin_spark.plans.store import TileQueryEngine
    from osmquadtree_bin_spark.server import serve
    from osmquadtree_bin_spark.spans import explode_geoms
    from osmquadtree_bin_spark.tiling import assign_tiles, count_tree, find_groups, write_tiled

    docs = gen_docs(spark, n_docs=200, seed=42)
    elements = explode_geoms(docs)
    counts = count_tree(elements)
    groups = find_groups(
        counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64), 200, 100
    )
    assigned = assign_tiles(elements, groups)
    store = str(tmp_path_factory.mktemp("srv") / "tiles")
    write_tiled(assigned, store)
    engine = TileQueryEngine(spark, store, groups)
    httpd, ts = serve(engine)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", ts, engine
    httpd.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read().decode()


def test_index_page(served):
    base, _, _ = served
    status, body = _get(base + "/")
    assert status == 200 and "leaflet" in body.lower() and "/bbox?" in body


def test_bbox_endpoint_geojson(served):
    base, _, _ = served
    # London hot cluster: guaranteed elements in the synthetic skew
    bb = "minx=-4500000&miny=510000000&maxx=2500000&maxy=520000000"
    status, body = _get(f"{base}/bbox?{bb}")
    assert status == 200
    gj = json.loads(body)
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) > 0
    assert gj["features"][0]["geometry"]["type"] in (
        "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString", "MultiPolygon",
    )


def test_tile_endpoint_and_lru(served):
    base, ts, engine = served
    import osmquadtree_bin_spark.quadtree as qtk

    # a tile that actually contains data: take a stored qt, round to z8
    row = engine.spark.read.parquet(engine.store_path).select("qt").first()
    tx, ty, tz = (int(v[0]) for v in qtk.to_tuple(qtk.round_to(np.array([row["qt"]]), 8)))
    m0 = ts.tile_cache.misses
    status, body = _get(f"{base}/tile/{tz}/{tx}/{ty}")
    assert status == 200 and json.loads(body)["type"] == "FeatureCollection"
    h0 = ts.tile_cache.hits
    _get(f"{base}/tile/{tz}/{tx}/{ty}")  # identical request → cache hit
    assert ts.tile_cache.hits == h0 + 1
    assert ts.tile_cache.misses == m0 + 1
    # LRU depth 3: three OTHER tiles evict the first
    for dx in (1, 2, 3):
        _get(f"{base}/tile/{tz}/{tx + dx}/{ty}")
    m1 = ts.tile_cache.misses
    _get(f"{base}/tile/{tz}/{tx}/{ty}")
    assert ts.tile_cache.misses == m1 + 1  # evicted → recomputed


def test_query_endpoint_sql_dialect(served):
    base, _, _ = served
    sql = urllib.parse.quote(
        "SELECT osm_id, highway FROM planet_osm_line WHERE highway is not null"
    )
    bb = "-4500000,510000000,2500000,520000000"
    status, body = _get(f"{base}/query?sql={sql}&bbox={bb}")
    assert status == 200
    out = json.loads(body)
    assert out["n"] == len(out["rows"])
    if out["rows"]:
        assert {"osm_id", "highway"} <= set(out["rows"][0])


def test_extract_endpoint(served):
    base, _, _ = served
    bb = "minx=-4500000&miny=510000000&maxx=2500000&maxy=520000000"
    status, body = _get(f"{base}/extract?{bb}")
    assert status == 200
    gj = json.loads(body)
    assert gj["type"] == "FeatureCollection" and len(gj["features"]) > 0
    # extract is the trimmed full-row view: lineage columns present
    assert "doc_id" in gj["features"][0]["properties"]


def test_status_and_errors(served):
    base, _, _ = served
    status, body = _get(base + "/status")
    assert status == 200
    st = json.loads(body)
    assert st["n_tiles"] > 0 and "cache" in st
    # bad requests → 400, unknown route → 404, engine guard → 500 surfaced
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/bbox?minx=0")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:  # oversized-bbox guard
        _get(base + "/bbox?minx=-1790000000&miny=-800000000&maxx=1790000000&maxy=800000000")
    assert e.value.code == 400  # ValueError from the reference guard → client error
    assert "bbox too large" in json.loads(e.value.read().decode())["error"]


def test_extract_parquet_artifact_roundtrip(served, tmp_path):
    """/extract?format=parquet returns a single re-ingestible parquet file
    (the WritePbfIndexed analogue): reading the downloaded bytes back
    through a fresh Spark scan row-matches the engine-side extract, keeps
    the id sort, and re-tiles cleanly through TiledStore."""
    base, _, engine = served
    bb = dict(minx=-4500000, miny=510000000, maxx=2500000, maxy=520000000)
    qs = "&".join(f"{k}={v}" for k, v in bb.items())
    req = urllib.request.Request(f"{base}/extract?{qs}&format=parquet")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/vnd.apache.parquet"
        assert "extract.parquet" in r.headers.get("Content-Disposition", "")
        blob = r.read()
    path = tmp_path / "extract.parquet"
    path.write_bytes(blob)

    spark = engine.spark
    back = spark.read.parquet(str(path))
    regions = spark.createDataFrame(
        [("req", "bbox", bb["minx"], bb["miny"], bb["maxx"], bb["maxy"], None, None)],
        "region_id string, kind string, minx long, miny long, "
        "maxx long, maxy long, lons array<long>, lats array<long>",
    )
    want = engine.extract(regions).toPandas()
    got = back.toPandas()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(want.columns)

    def canon(df):
        # map/list cells (tags) aren't hashable — stringify for sort/compare
        out = df[cols].copy()
        for c in cols:
            if out[c].dtype == object:
                out[c] = out[c].map(lambda v: json.dumps(v, sort_keys=True, default=str))
        return out.sort_values(cols).reset_index(drop=True)

    assert canon(got).equals(canon(want))

    # re-ingest: fresh tiling over the downloaded artifact
    from osmquadtree_bin_spark.streaming.update import TiledStore
    from osmquadtree_bin_spark.tiling import assign_tiles, count_tree, find_groups

    counts = count_tree(back)
    groups = find_groups(
        counts["cell"].to_numpy(np.int64), counts["cnt"].to_numpy(np.int64), 200, 100
    )
    store = TiledStore(spark, str(tmp_path / "reingested"))
    store.write_initial(assign_tiles(back, groups, counts=counts))
    assert store.read().count() == len(want)


def test_serve_rejects_non_loopback_without_optin():
    """/query executes arbitrary SQL with the driver's filesystem access —
    non-loopback binds need the explicit allow_remote opt-in."""
    from osmquadtree_bin_spark.server import serve

    with pytest.raises(ValueError, match="allow_remote"):
        serve(None, host="0.0.0.0")
