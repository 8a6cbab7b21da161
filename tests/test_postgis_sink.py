"""S10 PostGIS sink: ST_ helpers, row routing, DDL, roads frame — everything
up to the JDBC write (no database in the sandbox) is exercised offline."""

from pyspark.sql import functions as F

from osmquadtree_bin_spark.sinks.postgis import (
    generate_series_explode,
    roads_frame,
    route_tables,
    st_exteriorring,
    st_geometryn,
    st_geometrytype,
    st_numgeometries,
    table_ddl,
)

MPOLY = "MULTIPOLYGON(((0 0,4 0,4 4,0 0)),((10 10,14 10,14 14,10 10)))"
POLY = "POLYGON((0 0,4 0,4 4,0 0),(1 1,2 1,2 2,1 1))"


def test_st_helpers(spark):
    df = spark.createDataFrame([(POLY,), (MPOLY,), ("LINESTRING(0 0,1 1)",)], "way string")
    got = df.select(
        st_geometrytype(F.col("way")).alias("t"),
        st_numgeometries(F.col("way")).alias("n"),
        st_exteriorring(F.col("way")).alias("ring"),
        st_geometryn(F.col("way"), F.lit(2)).alias("g2"),
    ).collect()
    assert [r["t"] for r in got] == ["POLYGON", "MULTIPOLYGON", "LINESTRING"]
    assert [r["n"] for r in got] == [1, 2, 1]
    assert got[0]["ring"] == "LINESTRING(0 0,4 0,4 4,0 0)"  # outer ring only
    assert got[1]["g2"] == "POLYGON((10 10,14 10,14 14,10 10))"
    assert got[2]["ring"] is None  # not a polygon


def test_multipolygon_rings_via_series(spark):
    df = spark.createDataFrame([(1, MPOLY)], "osm_id long, way string")
    rings = (
        generate_series_explode(df, st_numgeometries(F.col("way")))
        .withColumn("ring", st_exteriorring(st_geometryn(F.col("way"), F.col("n"))))
        .collect()
    )
    assert [r["ring"] for r in rings] == [
        "LINESTRING(0 0,4 0,4 4,0 0)",
        "LINESTRING(10 10,14 10,14 14,10 10)",
    ]


def test_route_tables(spark, docs):
    from osmquadtree_bin_spark.spans import explode_geoms

    el = explode_geoms(docs)
    routed = route_tables(el)
    total = sum(routed[t].count() for t in ("point", "line", "polygon"))
    assert total == el.count()  # every element routed exactly once


def test_table_ddl():
    ddl = table_ddl("planet_osm", "polygon", ["name", "boundary"])
    assert ddl.startswith("CREATE TABLE planet_osm_polygon (")
    for frag in ('"osm_id" bigint', '"quadtree" text', '"name" text',
                 '"z_order" integer', '"way_area" real', '"way" text'):
        assert frag in ddl
    assert "way_area" not in table_ddl("planet_osm", "line", ["name"])


def test_roads_frame_union_branches(spark):
    line = spark.createDataFrame(
        [
            (1, "A", "l1", None, None, "motorway", None, None, None, None, None, 380, "LINESTRING(0 0,1 1)"),
            (2, "A", "l2", None, None, "footway", None, None, None, None, None, 100, "LINESTRING(0 0,2 2)"),
        ],
        "osm_id long, quadtree string, name string, ref string, admin_level string, "
        "highway string, railway string, boundary string, service string, "
        "tunnel string, bridge string, z_order long, way string",
    )
    polygon = spark.createDataFrame(
        [
            (-3, "B", "adm_multi", "2", "administrative", MPOLY),
            (-4, "B", "adm_simple", "4", "administrative", POLY),
            (5, "B", "not_admin", None, None, POLY),  # osm_id > 0: excluded
        ],
        "osm_id long, quadtree string, name string, admin_level string, "
        "boundary string, way string",
    )
    rows = roads_frame(line, polygon).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["osm_id"], []).append(r)
    assert set(by_id) == {1, -3, -4}  # footway excluded, positive polygon excluded
    assert len(by_id[-3]) == 2  # one ring per MULTIPOLYGON component
    assert by_id[-4][0]["way"] == "LINESTRING(0 0,4 0,4 4,0 0)"
