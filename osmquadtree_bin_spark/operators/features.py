"""Feature-extraction fan-out engine (§2.9 tail — groupFeature/processObj).

Reference: ``/root/reference/osmquadtree-geometry-features.go:872-927``
(``processObj``): one element produces ONE OUTPUT ROW PER TABLE it matches —
a feature spec routes by geometry type to the point/line/polygon tables
(``passVal``, :542-569), linestring features get a priority from a literal
map (``checkPrio``, :571-592, table :722-770), and per-table duplicate
features collapse (grouped tags).

Spark shape: build an ``array<struct<table,feature>>`` of matches per element
with pure column expressions, ``explode`` it (the one-to-many fan-out), then
``dropDuplicates`` per (id, table). Priorities attach via a broadcast literal
map. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# feature keys by geometry routing (extrastyle.json IsFeature + IsNode/IsWay/IsPoly)
POINT_FEATURES = ["amenity", "highway", "railway", "natural", "place", "shop", "tourism"]
LINE_FEATURES = ["highway", "railway", "waterway", "boundary", "barrier", "route"]
POLYGON_FEATURES = ["building", "landuse", "natural", "amenity", "leisure", "water"]

# linestring priority table (checkPrio semantics, features.go:722-770)
LINE_PRIO = {
    "motorway": 380, "trunk": 370, "primary": 360, "secondary": 350, "tertiary": 340,
    "residential": 330, "rail": 440, "river": 50, "stream": 40, "administrative": 10,
}


def feature_fanout(elements: DataFrame) -> DataFrame:
    """elements (id, geom_type, tags) → one row per (element, table, feature).

    Output: (id, table, feature, feature_value, prio) sorted-ready; dedup per
    (id, table, feature) mirrors the reference's per-table grouping.
    """
    def matches(keys: list[str], table: str):
        return [
            F.when(
                F.element_at(F.col("tags"), k).isNotNull(),
                F.struct(
                    F.lit(table).alias("table"),
                    F.lit(k).alias("feature"),
                    F.element_at(F.col("tags"), k).alias("feature_value"),
                ),
            )
            for k in keys
        ]

    arr = (
        F.when(F.col("geom_type") == 0, F.array(*matches(POINT_FEATURES, "point")))
        .when(F.col("geom_type") == 1, F.array(*matches(LINE_FEATURES, "line")))
        .otherwise(F.array(*matches(POLYGON_FEATURES, "polygon")))
    )
    exploded = (
        elements.select("id", "geom_type", F.explode(F.filter(arr, lambda x: x.isNotNull())).alias("m"))
        .select(
            "id",
            F.col("m.table").alias("table"),
            F.col("m.feature").alias("feature"),
            F.col("m.feature_value").alias("feature_value"),
        )
        .dropDuplicates(["id", "table", "feature"])
    )
    prio = None
    for k, v in sorted(LINE_PRIO.items()):
        cond = F.col("feature_value") == k
        prio = F.when(cond, v) if prio is None else prio.when(cond, v)
    prio = prio.otherwise(0)
    return exploded.withColumn(
        "prio", F.when(F.col("table") == "line", prio).otherwise(0).cast("long")
    )


def feature_summary(fanout: DataFrame) -> DataFrame:
    """O4 deterministic feature sort: counts per (table, feature), ordered
    (featureSlice.Sort, features.go:286-295)."""
    return (
        fanout.groupBy("table", "feature")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("table", "feature")
    )
