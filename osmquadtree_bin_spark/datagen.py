"""Deterministic synthetic generators for the engine's fixtures (FIXTURES.md).

F1 ``docs``      — interleaved text+media+geom documents, the exact input
                   shape from BASELINE.json ``input_hint``:
                   (doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>)
F3 ``regions``   — bbox / polygon spatial-join right side
F4 ``tile_requests`` — raster↔vector join left side
F5 ``diffs``     — incremental change sets

All generation is numpy with a fixed seed — byte-stable across runs, which the
golden-fixture tests (tests/test_tiling_golden.py) rely on. Coordinates are
fixed-point int degrees ×10⁷; ~30% of spans carry geometry; coordinates are
drawn from 3 hot clusters + a uniform background to exercise skew salting
(FIXTURES.md F1 sizing contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .quadtree import COORD_SCALE

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

_TAG_VOCAB = [
    # drawn from the style vocabulary, /root/reference/extrastyle.json:1-75
    ("highway", ["motorway", "primary", "secondary", "residential", "footway", "motorway_link"]),
    ("railway", ["rail", "subway", "tram"]),
    ("landuse", ["forest", "residential", "industrial", "meadow"]),
    ("natural", ["water", "wood", "scrub"]),
    ("waterway", ["river", "stream", "canal"]),
    ("building", ["yes", "house", "no"]),
    ("amenity", ["school", "cafe", "parking"]),
    ("boundary", ["administrative"]),
    ("admin_level", ["2", "4", "6", "8"]),
    ("layer", ["-1", "0", "1", "2"]),
    ("bridge", ["yes", "no"]),
    ("tunnel", ["yes", "no"]),
]

_WORDS = (
    "the spark quad tree tile span doc merge join scan filter group "
    "sort shuffle batch stream vector raster point line polygon"
).split()

# hot clusters (lon, lat, spread_deg) — city-like skew — plus uniform background
_CLUSTERS = [(-0.1278, 51.5074, 0.15), (13.4050, 52.5200, 0.12), (2.3522, 48.8566, 0.10)]


def _wkt_and_tags(rng: np.random.Generator) -> str:
    """One geom-span payload: 'WKT|k=v;k=v' (deterministic given rng state)."""
    r = rng.random()
    if r < 0.55:
        lon, lat = _coord(rng)
        wkt = f"POINT({lon} {lat})"
    elif r < 0.85:
        lon, lat = _coord(rng)
        n = int(rng.integers(2, 6))
        pts = []
        for _ in range(n):
            lon += int(rng.integers(-50000, 50000))
            lat += int(rng.integers(-50000, 50000))
            pts.append(f"{lon} {lat}")
        wkt = f"LINESTRING({', '.join(pts)})"
    else:
        lon, lat = _coord(rng)
        w = int(rng.integers(5000, 80000))
        h = int(rng.integers(5000, 80000))
        wkt = (
            f"POLYGON(({lon} {lat}, {lon + w} {lat}, {lon + w} {lat + h}, "
            f"{lon} {lat + h}, {lon} {lat}))"
        )
    ntags = int(rng.integers(1, 4))
    idx = rng.choice(len(_TAG_VOCAB), size=ntags, replace=False)
    tags = ";".join(
        f"{_TAG_VOCAB[i][0]}={_TAG_VOCAB[i][1][int(rng.integers(0, len(_TAG_VOCAB[i][1])))]}"
        for i in sorted(idx)
    )
    return f"{wkt}|{tags}"


def _coord(rng: np.random.Generator) -> tuple[int, int]:
    """Fixed-point coordinate: 70% from a hot cluster, 30% uniform world."""
    if rng.random() < 0.7:
        cx, cy, s = _CLUSTERS[int(rng.integers(0, len(_CLUSTERS)))]
        lon = cx + rng.normal(0, s)
        lat = cy + rng.normal(0, s)
    else:
        lon = rng.uniform(-179, 179)
        lat = rng.uniform(-80, 80)
    return int(round(lon * COORD_SCALE)), int(round(lat * COORD_SCALE))


def gen_docs_pdf(n_docs: int = 1000, seed: int = 42) -> pd.DataFrame:
    """F1: interleaved docs as a pandas frame (driver-side, small scale).

    At production scale this table is an Iceberg table generated upstream;
    the generator exists only to fabricate deterministic test input.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n_spans = int(rng.integers(3, 21))
        spans = []
        offset = 0
        for j in range(n_spans):
            r = rng.random()
            if r < 0.30:
                kind, text, media = "geom", _wkt_and_tags(rng), ""
            elif r < 0.45:
                kind, text = "media", ""
                media = f"media://{int(rng.integers(0, 1 << 48)):012x}"
            else:
                kind = "text"
                nw = int(rng.integers(3, 12))
                text = " ".join(_WORDS[int(k)] for k in rng.integers(0, len(_WORDS), nw))
                media = ""
            spans.append({"kind": kind, "text": text, "media_ref": media, "offset": offset})
            offset += max(len(text), 1)
        rows.append({"doc_id": f"doc_{i:08d}", "spans": spans})
    return pd.DataFrame(rows)


def gen_docs(spark, n_docs: int = 1000, seed: int = 42):
    pdf = gen_docs_pdf(n_docs, seed)
    data = [(r.doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans])
            for r in pdf.itertuples()]
    return spark.createDataFrame(data, SPAN_SCHEMA)


def _doc_rows(doc_ids, seed: int):
    """Rows for a batch of doc indices — rng seeded PER DOC, so output is
    deterministic regardless of partitioning (the property that lets the
    same generator run at 10^12-doc scale on any cluster layout)."""
    out_ids, out_spans = [], []
    for i in doc_ids:
        rng = np.random.default_rng((int(seed) << 34) ^ int(i))
        n_spans = int(rng.integers(3, 21))
        spans = []
        offset = 0
        for _ in range(n_spans):
            r = rng.random()
            if r < 0.30:
                kind, text, media = "geom", _wkt_and_tags(rng), ""
            elif r < 0.45:
                kind, text = "media", ""
                media = f"media://{int(rng.integers(0, 1 << 48)):012x}"
            else:
                kind = "text"
                nw = int(rng.integers(3, 12))
                text = " ".join(_WORDS[int(k)] for k in rng.integers(0, len(_WORDS), nw))
                media = ""
            spans.append({"kind": kind, "text": text, "media_ref": media, "offset": offset})
            offset += max(len(text), 1)
        out_ids.append(f"doc_{int(i):08d}")
        out_spans.append(spans)
    return pd.DataFrame({"doc_id": out_ids, "spans": out_spans})


def gen_docs_dist(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed F1 generator: spark.range → mapInPandas. Use for bench /
    scale runs; ``gen_docs`` stays the small golden-fixture generator."""
    rng_seed = seed
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield _doc_rows(pdf["id"].to_numpy(), rng_seed)

    return base.mapInPandas(gen, SPAN_SCHEMA)


def gen_regions(spark, n_bbox: int = 8, n_poly: int = 4, seed: int = 43):
    """F3: bbox + polygon regions; one region pinned over a hot cluster (skew),
    one over empty ocean (matches nothing)."""
    rng = np.random.default_rng(seed)
    rows = []
    # pinned: hot-cluster bbox (London) and a no-match bbox (south pacific)
    rows.append(("region_hot", "bbox",
                 int(-0.45 * COORD_SCALE), int(51.2 * COORD_SCALE),
                 int(0.25 * COORD_SCALE), int(51.8 * COORD_SCALE), None, None))
    rows.append(("region_empty", "bbox",
                 int(-140.0 * COORD_SCALE), int(-45.0 * COORD_SCALE),
                 int(-139.0 * COORD_SCALE), int(-44.0 * COORD_SCALE), None, None))
    for i in range(n_bbox - 2):
        lon, lat = _coord(rng)
        w = int(rng.integers(100000, 3000000))
        h = int(rng.integers(100000, 3000000))
        rows.append((f"region_b{i}", "bbox", lon, lat, lon + w, lat + h, None, None))
    for i in range(n_poly):
        lon, lat = _coord(rng)
        n = int(rng.integers(4, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.integers(200000, 2000000, n)
        lons = (lon + rad * np.cos(ang)).astype(np.int64)
        lats = (lat + np.clip(rad * np.sin(ang), -80 * COORD_SCALE - lat, 80 * COORD_SCALE - lat)).astype(np.int64)
        rows.append((f"region_p{i}", "polygon", None, None, None, None,
                     [int(v) for v in lons], [int(v) for v in lats]))
    return spark.createDataFrame(
        rows,
        "region_id string, kind string, minx long, miny long, maxx long, maxy long, "
        "lons array<long>, lats array<long>",
    )


def gen_elements(spark, n_nodes: int = 2000, n_ways: int = 300, n_rels: int = 60, seed: int = 45):
    """F2: node/way/relation tables incl. the FIXTURES.md edge cases:
    a relation containing a relation, a circular relation, an empty relation,
    a member referencing a missing node."""
    rng = np.random.default_rng(seed)
    nodes = []
    for i in range(n_nodes):
        lon, lat = _coord(rng)
        nodes.append((i, lon, lat))
    nodes_df = spark.createDataFrame(nodes, "id long, lon long, lat long")

    ways = []
    for i in range(n_ways):
        nrefs = int(rng.integers(2, 12))
        start = int(rng.integers(0, n_nodes - 1))
        # mostly-local refs (cluster locality), a few long-range ways
        refs = [int((start + int(rng.integers(0, 30))) % n_nodes) for _ in range(nrefs)]
        ways.append((i, refs))
    ways_df = spark.createDataFrame(ways, "id long, refs array<long>")

    rels = []
    for i in range(n_rels - 3):
        nm = int(rng.integers(1, 6))
        members = []
        for _ in range(nm):
            mt = int(rng.integers(0, 2))  # node or way
            ref = int(rng.integers(0, n_nodes if mt == 0 else n_ways))
            members.append((mt, ref, "member"))
        if rng.random() < 0.3 and i > 0:  # rel-of-rel
            members.append((2, int(rng.integers(0, i)), "subrel"))
        rels.append((i, members))
    rels.append((n_rels - 3, [(2, n_rels - 3, "self")]))  # circular
    rels.append((n_rels - 2, []))  # empty
    rels.append((n_rels - 1, [(0, n_nodes + 999, "missing")]))  # missing member
    rels_df = spark.createDataFrame(
        rels, "id long, members array<struct<mtype:int,ref:long,role:string>>"
    )
    return nodes_df, ways_df, rels_df


def gen_tile_requests(spark, n: int = 64, seed: int = 44):
    """F4: raster tile requests biased toward the hot clusters."""
    rng = np.random.default_rng(seed)
    from . import quadtree as qtk

    rows = []
    for _ in range(n):
        lon, lat = _coord(rng)
        z = int(rng.integers(8, 15))
        key = qtk.point_quadtree(np.array([lon]), np.array([lat]), z)
        tx, ty, tz = qtk.to_tuple(key)
        rows.append((int(tx[0]), int(ty[0]), int(tz[0])))
    return spark.createDataFrame(rows, "tilex long, tiley long, tilez long")
