"""Spatial operators: haversine, grid cells, two-phase bbox join, WKT
ray-cast refinement (J6)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_haversine_known_distance(spark):
    from sdg_big_data_spark.operators.spatial import haversine_m

    # Paris -> London ≈ 343.5 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    d = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).first()["d"]
    assert abs(d - 343_500) < 2_000


def test_spatial_join_bbox(spark):
    from sdg_big_data_spark.operators.spatial import spatial_join_bbox

    points = spark.createDataFrame(
        [
            (1, 0.005, 0.005),   # inside A
            (2, 0.015, 0.005),   # inside B (north of A)
            (3, 0.005, 0.045),   # inside no box
            (4, 0.0099, 0.0099), # inside A near corner
            (5, -0.005, 0.005),  # below all boxes
        ],
        "point_id long, lat double, lon double",
    )
    boxes = spark.createDataFrame(
        [
            ("A", 0.0, 0.0, 0.01, 0.01),
            ("B", 0.01, 0.0, 0.02, 0.01),
        ],
        "geom_id string, min_lat double, min_lon double, max_lat double, max_lon double",
    )
    out = spatial_join_bbox(points, boxes, cell_deg=0.01)
    got = {(r.point_id, r.geom_id) for r in out.collect()}
    assert got == {(1, "A"), (4, "A"), (2, "B")}


def test_spatial_join_wkt_triangle(spark):
    from sdg_big_data_spark.operators.spatial import spatial_join_wkt

    # right triangle (0,0)-(1,0)-(0,1): below the diagonal lon+lat<1 is inside
    polys = spark.createDataFrame(
        [("T", "POLYGON ((0 0, 1 0, 0 1, 0 0))")], "geom_id string, geometry string"
    )
    points = spark.createDataFrame(
        [
            (1, 0.2, 0.2),   # inside
            (2, 0.6, 0.6),   # outside (beyond hypotenuse), inside bbox
            (3, 0.9, 0.05),  # inside, near vertex
            (4, 1.5, 0.5),   # outside bbox entirely
        ],
        "point_id long, lat double, lon double",
    )
    out = spatial_join_wkt(points, polys, cell_deg=0.5)
    got = {(r.point_id, r.geom_id) for r in out.collect()}
    assert got == {(1, "T"), (3, "T")}


def test_grid_cell_cover_consistency(spark):
    """Any point inside a bbox must land in a cell covered by the bbox —
    the coarse phase can't lose candidates (no false negatives)."""
    from sdg_big_data_spark.operators.spatial import cover_bbox, grid_cell

    import random

    rng = random.Random(3)
    rows = [
        (rng.uniform(-10, 10), rng.uniform(-10, 10)) for _ in range(200)
    ]
    pts = spark.createDataFrame(rows, "lat double, lon double")
    box = {"min_lat": -3.33, "min_lon": -7.77, "max_lat": 5.55, "max_lon": 2.22}
    cells = spark.createDataFrame([tuple(box.values())],
        "min_lat double, min_lon double, max_lat double, max_lon double"
    ).select(F.explode(cover_bbox(
        F.col("min_lat"), F.col("min_lon"), F.col("max_lat"), F.col("max_lon"), 0.7
    )).alias("cell"))
    cell_set = {r.cell for r in cells.collect()}
    inside = pts.where(
        F.col("lat").between(box["min_lat"], box["max_lat"])
        & F.col("lon").between(box["min_lon"], box["max_lon"])
    ).select(grid_cell(F.col("lat"), F.col("lon"), 0.7).alias("cell"))
    assert all(r.cell in cell_set for r in inside.collect())


def test_spatial_join_wkt_border_buffer(spark):
    """ST_Buffer(poly, 0.005) analogue (geocode_stop_locations.scala:40):
    a point just outside the polygon joins when within the buffer."""
    from sdg_big_data_spark.operators.spatial import spatial_join_wkt

    square = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    polys = spark.createDataFrame(
        [("sq", square)], schema="geom_id string, geometry string"
    )
    pts = spark.createDataFrame(
        [
            (1, 0.5, 0.5),     # inside
            (2, 0.5, 1.003),   # 0.003 beyond the top edge (lat > 1)
            (3, 0.5, 1.02),    # beyond the buffer
        ],
        schema="pid long, lon double, lat double",
    )
    plain = spatial_join_wkt(pts, polys, cell_deg=0.5)
    assert {r["pid"] for r in plain.collect()} == {1}
    buffered = spatial_join_wkt(pts, polys, cell_deg=0.5, buffer_deg=0.005)
    assert {r["pid"] for r in buffered.collect()} == {1, 2}


def test_wkt_join_polygon_size_guard(spark):
    """The broadcast-dimension contract is enforced: a polygon side over
    max_polygons fails loudly before any driver-side collect."""
    import pytest

    from sdg_big_data_spark.operators.spatial import spatial_join_wkt

    pts = spark.createDataFrame(
        [(1, 0.5, 0.5)], schema="event_id long, lat double, lon double"
    )
    polys = spark.range(50).select(
        F.concat(F.lit("g"), F.col("id")).alias("geom_id"),
        F.lit("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))").alias("geometry"),
    )
    with pytest.raises(ValueError, match="grid-cell-explode"):
        spatial_join_wkt(pts, polys, max_polygons=10)
    # under the cap the join runs fine
    out = spatial_join_wkt(pts, polys.limit(3), max_polygons=10)
    assert out.count() == 3


class TestColocationPairs:
    def _naive(self, rows, r, w):
        out = {}
        for i, (ida, ua, la, lo, t) in enumerate(rows):
            for idb, ub, lb, lob, tb in rows[i + 1:]:
                if ua == ub or abs(t - tb) > w:
                    continue
                d2 = (la - lb) ** 2 + (lo - lob) ** 2
                if d2 <= r * r:
                    k = (min(ua, ub), max(ua, ub))
                    n, m = out.get(k, (0, float("inf")))
                    out[k] = (n + 1, min(m, d2))
        return out

    def test_planted_contacts(self, spark):
        from sdg_big_data_spark.operators.spatial import colocation_pairs

        rows = [
            # u1/u2 meet twice (same spot, 100s apart); u3 far away;
            # u4 same spot as u1 but 2h later — time gate drops it
            (1, 1, 0.0100, 0.0100, 1000),
            (2, 2, 0.0101, 0.0101, 1100),
            (3, 1, 0.0100, 0.0100, 5000),
            (4, 2, 0.0100, 0.0102, 5050),
            (5, 3, 0.5000, 0.5000, 1050),
            (6, 4, 0.0100, 0.0100, 8600),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, lat double, lon double, t long"
        )
        got = {
            (r["user_a"], r["user_b"]): (r["n_contacts"], r["min_d2"])
            for r in colocation_pairs(df, radius_deg=0.002, window_s=600).collect()
        }
        want = self._naive(rows, 0.002, 600)
        assert got.keys() == want.keys() == {(1, 2)}
        assert got[(1, 2)][0] == want[(1, 2)][0] == 2

    def test_matches_naive_on_random_fixture(self, spark):
        import numpy as np

        from sdg_big_data_spark.operators.spatial import colocation_pairs

        rng = np.random.RandomState(3)
        rows = [
            (
                int(i),
                int(rng.randint(0, 25)),
                float(rng.randint(0, 40)) / 1000.0,
                float(rng.randint(0, 40)) / 1000.0,
                int(rng.randint(0, 50_000)),
            )
            for i in range(400)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, lat double, lon double, t long"
        )
        got = {
            (r["user_a"], r["user_b"]): (r["n_contacts"], round(r["min_d2"], 12))
            for r in colocation_pairs(df, radius_deg=0.003, window_s=2000).collect()
        }
        want = {
            k: (v[0], round(v[1], 12))
            for k, v in self._naive(rows, 0.003, 2000).items()
        }
        assert len(want) > 5  # fixture produces real mass
        assert got == want  # banding finds EVERY pair the quadratic scan finds


def test_mobility_metrics_hand_computed(spark):
    import math

    from sdg_big_data_spark.operators.spatial import mobility_metrics

    # u1: 4 points, two cells (3:1 split); u2: all points one spot
    rows = [
        (1, 0.000, 0.000), (1, 0.001, 0.001), (1, 0.002, 0.000),
        (1, 0.020, 0.020),
        (2, 0.050, 0.050), (2, 0.050, 0.050),
    ]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    got = {r["user_id"]: r for r in mobility_metrics(df, cell_deg=0.01).collect()}

    lats = [r[1] for r in rows if r[0] == 1]
    lons = [r[2] for r in rows if r[0] == 1]
    var = lambda xs: sum((x - sum(xs) / len(xs)) ** 2 for x in xs) / len(xs)
    assert abs(got[1]["rog_deg"] - math.sqrt(var(lats) + var(lons))) < 1e-12
    assert got[1]["n_cells"] == 2
    want_h = math.log(4) - (3 * math.log(3) + 1 * math.log(1)) / 4
    assert abs(got[1]["entropy"] - want_h) < 1e-12
    assert got[2]["rog_deg"] == 0.0 and got[2]["n_cells"] == 1
    assert got[2]["entropy"] == 0.0
