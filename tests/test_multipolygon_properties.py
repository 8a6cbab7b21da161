"""Property-based tests (hypothesis) for the multipolygon assembly kernel.

The kernel spec (element_joins._stitch_chains / assemble_multipolygon) is
deterministic-greedy and exact when no more than two member ways meet at a
node — the OSM multipolygon convention. These properties check the spec
over randomly generated ring decompositions instead of hand-picked cases:

  P1  any simple convex ring, split into arbitrary consecutive way chunks,
      each way independently direction-reversed and the member list shuffled,
      reassembles to the SAME canonical WKT as the unsplit ring;
  P2  hole assignment: a small hole inside the outer ring survives any
      split/reversal of either ring; a hole placed far outside is dropped;
  P3  WKT validity invariants: every emitted ring closes (first == last
      vertex), outer rings have positive (CCW) shoelace area, holes negative.
"""

import math
import re

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from osmquadtree_bin_spark.operators.element_joins import (
    _ring_area2,
    assemble_multipolygon,
)


def _convex_ring(n: int, radius: int, cx: int = 0, cy: int = 0):
    """Regular n-gon (convex, strictly simple, CCW) on integer coords."""
    return [
        (
            cx + int(radius * math.cos(2 * math.pi * k / n)),
            cy + int(radius * math.sin(2 * math.pi * k / n)),
        )
        for k in range(n)
    ]


def _split_ring(ring, cuts, node_base):
    """Split a ring (vertex list, unclosed) into member ways at the given cut
    positions. Returns list of (way_refs, way_coords); node ids are
    node_base + vertex index."""
    m = len(ring)
    vids = [node_base + k for k in range(m)]
    cuts = sorted(set(c % m for c in cuts)) or [0]
    rot = cuts[0]
    seq_v = vids[rot:] + vids[:rot] + [vids[rot]]
    seq_c = ring[rot:] + ring[:rot] + [ring[rot]]
    rel = sorted((c - rot) % m for c in cuts) + [m]
    ways = []
    for a, b in zip(rel, rel[1:]):
        ways.append((seq_v[a : b + 1], seq_c[a : b + 1]))
    return ways


@st.composite
def ring_decomposition(draw, min_verts=3, max_verts=12, node_base=100):
    n = draw(st.integers(min_verts, max_verts))
    radius = draw(st.integers(1000, 10_000_000))
    cx = draw(st.integers(-10_000_000, 10_000_000))
    cy = draw(st.integers(-10_000_000, 10_000_000))
    ring = _convex_ring(n, radius, cx, cy)
    n_cuts = draw(st.integers(1, min(4, n)))
    cuts = draw(
        st.lists(st.integers(0, n - 1), min_size=n_cuts, max_size=n_cuts, unique=True)
    )
    ways = _split_ring(ring, cuts, node_base)
    flips = draw(st.lists(st.booleans(), min_size=len(ways), max_size=len(ways)))
    perm = draw(st.permutations(range(len(ways))))
    out = []
    for i in perm:
        refs, coords = ways[i]
        if flips[i]:
            refs, coords = refs[::-1], coords[::-1]
        out.append((refs, coords))
    return ring, out


def _canonical(ring, members_wkt):
    """The WKT the assembler produces for the UNSPLIT ring — the ground truth
    a split/reversed/shuffled decomposition must reproduce."""
    one_way = [("outer", 1, [100 + k for k in range(len(ring))] + [100], ring + [ring[0]])]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(one_way)
    assert (n_outer, n_inner, n_dropped) == (1, 0, 0)
    return wkt


@settings(max_examples=60, deadline=None)
@given(ring_decomposition())
def test_split_reverse_shuffle_reassembles_identically(data):
    ring, ways = data
    truth = _canonical(ring, None)
    members = [
        ("outer", 10 + i, refs, coords) for i, (refs, coords) in enumerate(ways)
    ]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert wkt == truth
    assert (n_outer, n_inner, n_dropped) == (1, 0, 0)


@settings(max_examples=40, deadline=None)
@given(
    ring_decomposition(min_verts=4, max_verts=10, node_base=100),
    st.integers(0, 3),
    st.booleans(),
)
def test_hole_assignment_survives_decomposition(data, hole_cut, hole_outside):
    ring, ways = data
    # place a small square hole at the ring's centroid (strictly inside a
    # convex ring) or far outside it
    cx = sum(x for x, _ in ring) // len(ring)
    cy = sum(y for _, y in ring) // len(ring)
    # hole must fit inside: quarter of the min vertex distance to centroid
    r = min(math.hypot(x - cx, y - cy) for x, y in ring)
    h = max(2, int(r / 4))
    if hole_outside:
        cx += int(4 * r) + 100
    hole = [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h), (cx - h, cy + h)]
    hole_ways = _split_ring(hole, [hole_cut], node_base=10_000)
    members = [
        ("outer", 10 + i, refs, coords) for i, (refs, coords) in enumerate(ways)
    ] + [
        ("inner", 100 + i, refs, coords) for i, (refs, coords) in enumerate(hole_ways)
    ]
    wkt, n_outer, n_inner, n_dropped = assemble_multipolygon(members)
    assert n_outer == 1
    if hole_outside:
        assert n_inner == 0 and n_dropped == len(hole_ways)
        assert "POLYGON((" in wkt and wkt.count("(") == 2
    else:
        assert n_inner == 1 and n_dropped == 0
        assert wkt.count("(") == 3  # outer ring + one hole


@settings(max_examples=40, deadline=None)
@given(ring_decomposition())
def test_emitted_rings_close_and_orient(data):
    ring, ways = data
    members = [
        ("outer", 10 + i, refs, coords) for i, (refs, coords) in enumerate(ways)
    ]
    wkt, _, _, _ = assemble_multipolygon(members)
    assert wkt is not None
    for i, ring_txt in enumerate(re.findall(r"\(([^()]+)\)", wkt)):
        pts = [
            tuple(int(v) for v in p.split())
            for p in ring_txt.split(", ")
        ]
        assert pts[0] == pts[-1]  # closed
        a2 = _ring_area2(pts[:-1])
        assert a2 > 0 if i == 0 else a2 < 0  # outer CCW, holes CW
