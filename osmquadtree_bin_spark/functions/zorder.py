"""z_order / way_area computed columns (A8, A9) and the roads priority table.

Reference: ``calc_zorder`` style type (``extrastyle.json:69``), consumed at
``osmquadtree-postgis.go:304-313``; priority values mirror the highway class
table in ``osmquadtree-geometry-features.go:722-770`` and the corpus's roads
ordering. way_area: shoelace area over mercator coords
(``osmquadtree-postgis.go:317-333``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..quadtree import COORD_SCALE, lat_to_unit, lon_to_unit

# EXACT mirror of the reference's highway_prios map
# (osmquadtree-geometry-features.go:722-770): keys are "<tagkey>_<value>".
Z_ORDER_TABLE = {
    "railway_rail": 440,
    "railway_INT-preserved-ssy": 430,
    "railway_INT-spur-siding-yard": 430,
    "railway_subway": 420,
    "railway_narrow_gauge": 420,
    "railway_light_rail": 420,
    "railway_preserved": 420,
    "railway_funicular": 420,
    "railway_monorail": 420,
    "railway_miniature": 420,
    "railway_turntable": 420,
    "railway_tram": 410,
    "railway_tram-service": 405,
    "railway_disused": 400,
    "railway_construction": 400,
    "highway_motorway": 380,
    "highway_trunk": 370,
    "highway_primary": 360,
    "highway_secondary": 350,
    "highway_tertiary": 340,
    "highway_residential": 330,
    "highway_unclassified": 330,
    "highway_road": 330,
    "highway_living_street": 320,
    "highway_pedestrian": 310,
    "highway_raceway": 300,
    "highway_motorway_link": 240,
    "highway_trunk_link": 230,
    "highway_primary_link": 220,
    "highway_secondary_link": 210,
    "highway_tertiary_link": 200,
    "highway_service": 150,
    "highway_track": 110,
    "highway_path": 100,
    "highway_footway": 100,
    "highway_bridleway": 100,
    "highway_cycleway": 100,
    "highway_steps": 100,
    "highway_platform": 90,
    "railway_platform": 90,
    "aeroway_runway": 60,
    "aeroway_taxiway": 50,
    "highway_construction": 10,
    "highway_bus_guideway": 10,
    "aerialway_cable_car": 10,
    "aerialway_goods": 10,
    "aerialway_chair_lift": 10,
}
LAYER_STEP = 1000  # a layer=n tag shifts z_order by n*1000 (carto convention)


def z_order(tags: str = "tags") -> Column:
    """Priority of the first matching (tagkey, value) row — one JVM map
    lookup per tag key, no per-value CASE ladder."""
    prio_map = F.create_map(
        *[F.lit(x) for kv in Z_ORDER_TABLE.items() for x in kv]
    )
    lookups = [
        F.element_at(
            prio_map,
            F.concat(F.lit(f"{key}_"), F.element_at(F.col(tags), key)),
        )
        for key in ("highway", "railway", "aeroway", "aerialway")
    ]
    base = F.coalesce(*lookups, F.lit(0))
    layer = F.element_at(F.col(tags), "layer")
    layer_n = F.when(layer.rlike(r"^-?[0-9]+$"), layer.cast("long")).otherwise(0)
    return (base + layer_n * LAYER_STEP).cast("long")


@pandas_udf(DoubleType())
def way_area_merc(wkt: pd.Series) -> pd.Series:
    """Shoelace area of the first POLYGON ring in spherical-mercator *unit*
    coords scaled to the reference's pseudo-meters (EPSG:900913 extent).
    Vectorized pandas str parse + numpy shoelace. Non-polygons → 0.0."""
    out = np.zeros(len(wkt), dtype=np.float64)
    s = wkt.astype("string").fillna("")
    is_poly = s.str.startswith("POLYGON")
    nums = s.str.findall(r"-?\d+")
    world = 2 * 20037508.342789244  # mercator extent in meters
    for i, (poly, lst) in enumerate(zip(is_poly, nums)):
        if not poly or not isinstance(lst, list) or len(lst) < 8:
            continue
        arr = np.asarray(lst, dtype=np.int64)
        xs = lon_to_unit(arr[0::2]) * world
        ys = (1.0 - lat_to_unit(arr[1::2])) * world  # north-up
        out[i] = 0.5 * abs(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1)))
    return pd.Series(out)
