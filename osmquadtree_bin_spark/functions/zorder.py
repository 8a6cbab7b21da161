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

# highway class → z_order (reference priority semantics: motorway highest)
Z_ORDER_TABLE = {
    "motorway": 380, "trunk": 370, "primary": 360, "secondary": 350,
    "tertiary": 340, "residential": 330, "unclassified": 330, "road": 330,
    "living_street": 320, "pedestrian": 310, "service": 150,
    "footway": 100, "track": 100, "path": 100, "cycleway": 100, "steps": 100,
    "motorway_link": 240, "trunk_link": 230, "primary_link": 220,
    "secondary_link": 210, "tertiary_link": 200,
}
RAILWAY_Z = 440
LAYER_STEP = 1000  # a layer=n tag shifts z_order by n*1000 (carto convention)


def z_order(tags: str = "tags") -> Column:
    hw = F.element_at(F.col(tags), "highway")
    rw = F.element_at(F.col(tags), "railway")
    layer = F.element_at(F.col(tags), "layer")
    base = None
    for k, v in sorted(Z_ORDER_TABLE.items()):
        cond = hw == k
        base = F.when(cond, v) if base is None else base.when(cond, v)
    base = base.when(rw.isNotNull(), RAILWAY_Z).otherwise(0)
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
