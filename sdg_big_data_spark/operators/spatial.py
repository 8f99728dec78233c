"""Spatial operators — SURVEY.md §2.3 J6, §2.9 geospatial family.

The reference geocodes stops with Sedona + H3: cover each polygon with
grid cells, equi-join points to cells, then refine with exact
``ST_Intersects`` (`geocode_stop_locations.scala:46-88`; rationale
`compiled-bookdown/03-geocode.Rmd:19-32`). That two-phase shape is the one
genuinely custom physical strategy in the whole reference — and it is a
*library composition*, not a Catalyst rule:

  coarse: cell(point) = cell id → equi-join → Catalyst picks
          broadcast/hash join, prunes, pushes filters
  refine: exact geometry predicate on the (small) surviving pairs

H3/Sedona are NOT dependencies here. Grid cells are lat/lon quantization
(``floor(lat/δ) , floor(lon/δ)`` composite key) — same asymptotics, pure
built-in expressions. Exact refinement:

- rectangles (bounding boxes): native range predicates (fully
  codegen'd, used by the oracle-checked catalog query);
- arbitrary WKT polygons: ray-casting in a vectorized pandas UDF
  (admin tables are dimension-sized and broadcast, so the UDF touches
  only candidate pairs).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters as a pure SQL expression (JVM
    codegen; the reference needed a C++ helper for this)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Composite grid-cell id for a point: ``floor(lat/δ):floor(lon/δ)``."""
    return F.concat_ws(
        ":",
        F.floor(lat / F.lit(cell_deg)).cast("long"),
        F.floor(lon / F.lit(cell_deg)).cast("long"),
    )


def cover_bbox(
    min_lat: Column, min_lon: Column, max_lat: Column, max_lon: Column, cell_deg: float
) -> Column:
    """All grid cells intersecting a bounding box → array<string>.
    The polygon-side analogue of the reference's ``multiPolygonToH3``
    (`geocode_stop_locations.scala:47`), built from sequence × sequence."""
    lat_idx = F.sequence(
        F.floor(min_lat / F.lit(cell_deg)).cast("long"),
        F.floor(max_lat / F.lit(cell_deg)).cast("long"),
    )
    lon_idx = F.sequence(
        F.floor(min_lon / F.lit(cell_deg)).cast("long"),
        F.floor(max_lon / F.lit(cell_deg)).cast("long"),
    )
    return F.flatten(
        F.transform(
            lat_idx,
            lambda la: F.transform(lon_idx, lambda lo: F.concat_ws(":", la, lo)),
        )
    )


def spatial_join_bbox(
    points: DataFrame,
    boxes: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 0.01,
) -> DataFrame:
    """J6 — two-phase point-in-rectangle join.

    ``boxes`` needs columns geom_id, min_lat, min_lon, max_lat, max_lon.
    Phase 1: explode box cell covers (broadcast — admin tables are small),
    equi-join on the point's cell. Phase 2: exact range predicate.
    At 100 TB of points this shuffles nothing on the point side: the
    coarse join is a broadcast hash join keyed by an expression over
    stored columns."""
    covered = boxes.withColumn(
        "cell",
        F.explode(
            cover_bbox(
                F.col("min_lat"), F.col("min_lon"),
                F.col("max_lat"), F.col("max_lon"),
                cell_deg,
            )
        ),
    )
    pts = points.withColumn("cell", grid_cell(F.col(lat_col), F.col(lon_col), cell_deg))
    coarse = pts.join(F.broadcast(covered), "cell")
    return coarse.where(
        F.col(lat_col).between(F.col("min_lat"), F.col("max_lat"))
        & F.col(lon_col).between(F.col("min_lon"), F.col("max_lon"))
    ).drop("cell")


# --- arbitrary polygons (WKT) ----------------------------------------------


def parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    """Minimal WKT POLYGON parser → [(lon, lat), ...] outer ring only."""
    body = wkt.strip()
    if not body.upper().startswith("POLYGON"):
        raise ValueError(f"not a POLYGON: {wkt[:40]}")
    inner = body[body.index("((") + 2 : body.index("))")]
    ring = []
    for pair in inner.split(","):
        x, y = pair.strip().split()[:2]
        ring.append((float(x), float(y)))
    return ring


def _point_in_ring(lon: np.ndarray, lat: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized ray casting (even-odd rule) for many points vs one ring."""
    inside = np.zeros(len(lon), dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cond = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= cond & (lon < xint)
    return inside


def _dist_to_ring_deg(
    lon: np.ndarray, lat: np.ndarray, ring: list[tuple[float, float]]
) -> np.ndarray:
    """Vectorized min point-to-segment distance (degrees) over a ring's
    edges — the exact-refine half of the reference's border buffer
    (`ST_Buffer(poly, 0.005)`, geocode_stop_locations.scala:40)."""
    best = np.full(len(lon), np.inf)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        dx, dy = x2 - x1, y2 - y1
        seg2 = dx * dx + dy * dy
        if seg2 == 0:
            d2 = (lon - x1) ** 2 + (lat - y1) ** 2
        else:
            t = np.clip(((lon - x1) * dx + (lat - y1) * dy) / seg2, 0.0, 1.0)
            d2 = (lon - (x1 + t * dx)) ** 2 + (lat - (y1 + t * dy)) ** 2
        best = np.minimum(best, d2)
    return np.sqrt(best)


def spatial_join_wkt(
    points: DataFrame,
    polygons: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    geom_id_col: str = "geom_id",
    wkt_col: str = "geometry",
    cell_deg: float = 0.01,
    buffer_deg: float = 0.0,
    max_polygons: int = 100_000,
) -> DataFrame:
    """J6 (general form) — coarse bbox/grid join, then exact ray-cast
    point-in-polygon refinement in a vectorized Arrow batch.

    Polygon bboxes are derived on the driver (polygons are dimension
    tables by assumption, as in the reference where admin CSVs are
    broadcast); the refine UDF receives only coarse-join survivors.

    The dimension-table assumption is ENFORCED, not assumed:
    ``max_polygons`` caps the driver-side collect (the world's admin-2
    boundaries are ~48k rows, well inside the default 100k). A polygon
    side that trips the guard is fact-table-sized and needs a
    partitioned geometry join (grid-cell explode both sides), not this
    broadcast plan.
    """
    from ..session import ship_package

    ship_package(points.sparkSession)
    # The guard rides the collect the join needs anyway (limit max+1 →
    # one job, bounded driver memory) instead of a separate count pass.
    pdf = polygons.select(geom_id_col, wkt_col).limit(max_polygons + 1).toPandas()
    if len(pdf) > max_polygons:
        raise ValueError(
            f"spatial_join_wkt collects the polygon side to the driver "
            f"(broadcast-dimension contract) but it has > {max_polygons} "
            f"rows. Raise max_polygons only if driver memory allows; for a "
            f"fact-sized geometry table, grid-cell-explode BOTH sides and "
            f"equi-join on cell instead."
        )
    rings = {r[geom_id_col]: parse_wkt_polygon(r[wkt_col]) for _, r in pdf.iterrows()}
    boxes = []
    for gid, ring in rings.items():
        lons = [p[0] for p in ring]
        lats = [p[1] for p in ring]
        # coarse bboxes expanded by the border buffer
        boxes.append(
            (
                gid,
                min(lats) - buffer_deg,
                min(lons) - buffer_deg,
                max(lats) + buffer_deg,
                max(lons) + buffer_deg,
            )
        )
    spark = points.sparkSession
    box_df = spark.createDataFrame(
        boxes, schema=f"{geom_id_col} string, min_lat double, min_lon double, max_lat double, max_lon double"
    )
    coarse = spatial_join_bbox(points, box_df, lat_col, lon_col, cell_deg)

    ring_items = sorted(rings.items())
    buf = float(buffer_deg)

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_map = dict(ring_items)
        for pdf_b in batches:
            pdf_b = pdf_b.reset_index(drop=True)
            keep = np.zeros(len(pdf_b), dtype=bool)
            for gid, grp in pdf_b.groupby(geom_id_col):
                lon = grp[lon_col].to_numpy()
                lat = grp[lat_col].to_numpy()
                mask = _point_in_ring(lon, lat, ring_map[gid])
                if buf > 0:
                    mask |= _dist_to_ring_deg(lon, lat, ring_map[gid]) <= buf
                keep[grp.index.to_numpy()] = mask
            yield pdf_b[keep]

    schema = coarse.drop("min_lat", "min_lon", "max_lat", "max_lon").schema
    out = coarse.drop("min_lat", "min_lon", "max_lat", "max_lon")
    return out.mapInPandas(lambda it: refine(it), schema=schema)


def colocation_pairs(
    events: DataFrame,
    entity_col: str = "user_id",
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    epoch_col: str = "t",
    radius_deg: float = 0.002,
    window_s: int = 600,
) -> DataFrame:
    """Spatio-temporal co-location: pairs of DISTINCT entities with
    events within ``radius_deg`` (squared-degree ε-ball — exact
    arithmetic, engine-portable; swap :func:`haversine_m` into the
    refine for production metres) and within ``window_s`` seconds of
    each other — the contact-tracing / co-visit join of the mobility
    literature, aggregated to one row per entity pair:
    (user_a, user_b, n_contacts, min_d2) with user_a < user_b.

    Two-phase, never a theta join: both sides bucket to cells sized
    2·radius (and time buckets sized 2·window). A point within
    ``radius`` of another can then only be in the point's own cell or
    the ONE neighbor on the side the point sits in (left half → −1,
    right half → +1; at the exact midpoint the ball stays inside the
    cell, so +1 is safe) — so the probe side replicates to just
    2×2×2 = 8 keys (vs 27 for radius-sized cells), the build side keeps
    its exact bucket, and candidates come from a plain hash equi-join.
    Each candidate pair arises from exactly ONE replica (replica keys
    are distinct), so no candidate dedup is needed; ``id_a < id_b``
    emits each event pair once, and the final per-(pair) aggregate
    canonicalizes entity order with least/greatest. A stadium-cell
    hotspot is an AQE skew split on the join key; replicas carry only
    (keys, id, entity, lat, lon, t).
    """
    base = events.select(
        F.col(id_col).alias("__id"),
        F.col(entity_col).alias("__e"),
        F.col(lat_col).cast("double").alias("__lat"),
        F.col(lon_col).cast("double").alias("__lon"),
        F.col(epoch_col).cast("long").alias("__t"),
    )
    cw, tw = 2.0 * radius_deg, 2 * int(window_s)

    def _cell(v, width):
        return F.floor(v / F.lit(width))

    def _side(v, width, cell):
        # +1 if the value sits in the upper half of its cell, else -1
        return F.when(v / F.lit(width) - cell >= 0.5, F.lit(1)).otherwise(
            F.lit(-1)
        )

    cx = _cell(F.col("__lat"), cw)
    cy = _cell(F.col("__lon"), cw)
    tb = _cell(F.col("__t").cast("double"), float(tw))
    b = base.select("*", cx.alias("__cx"), cy.alias("__cy"), tb.alias("__tb"))
    sx = _side(F.col("__lat"), cw, F.col("__cx"))
    sy = _side(F.col("__lon"), cw, F.col("__cy"))
    st = _side(F.col("__t").cast("double"), float(tw), F.col("__tb"))
    probe = (
        b.withColumn("__dx", F.explode(F.array(F.lit(0), sx)))
        .withColumn("__dy", F.explode(F.array(F.lit(0), sy)))
        .withColumn("__dt", F.explode(F.array(F.lit(0), st)))
        .select(
            (F.col("__cx") + F.col("__dx")).alias("__cx"),
            (F.col("__cy") + F.col("__dy")).alias("__cy"),
            (F.col("__tb") + F.col("__dt")).alias("__tb"),
            F.col("__id").alias("id_a"),
            F.col("__e").alias("ea"),
            F.col("__lat").alias("lat_a"),
            F.col("__lon").alias("lon_a"),
            F.col("__t").alias("t_a"),
        )
    )
    build = b.select(
        "__cx", "__cy", "__tb",
        F.col("__id").alias("id_b"),
        F.col("__e").alias("eb"),
        F.col("__lat").alias("lat_b"),
        F.col("__lon").alias("lon_b"),
        F.col("__t").alias("t_b"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    pairs = (
        probe.join(build, ["__cx", "__cy", "__tb"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("ea") != F.col("eb"))
        .where(F.abs(F.col("t_a") - F.col("t_b")) <= window_s)
        .withColumn("__d2", d2)
        .where(F.col("__d2") <= F.lit(radius_deg) * F.lit(radius_deg))
    )
    return pairs.groupBy(
        F.least("ea", "eb").alias("user_a"),
        F.greatest("ea", "eb").alias("user_b"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_contacts"),
        F.min("__d2").alias("min_d2"),
    )


def mobility_metrics(
    points: DataFrame,
    entity_col: str = "user_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 0.01,
) -> DataFrame:
    """Per-entity mobility summary — the canonical metrics of the GPS
    literature (González et al. 2008), beyond the reference's
    stay-at-home/migration indicators:

    - ``rog_deg`` — radius of gyration: RMS distance of the entity's
      points from their centroid. Since
      E[(x−μx)² + (y−μy)²] = Var(x) + Var(y), it is
      ``sqrt(var_pop(lat) + var_pop(lon))`` — a SINGLE-PASS moment
      aggregate (map-side combined), no centroid-join second pass.
      Degree metric for engine portability; multiply by ~111 km/deg (or
      recompute with :func:`haversine_m` against the centroid) for
      metres.
    - ``n_cells`` / ``entropy`` — distinct ``cell_deg`` grid cells
      visited and the Shannon entropy (natural log) of the visit
      distribution over them: the predictability measure.

    Two dimension-bounded shuffles: one (entity, cell) count, one
    per-entity aggregate.
    """
    cx = F.floor(F.col(lat_col) / cell_deg)
    cy = F.floor(F.col(lon_col) / cell_deg)
    per_cell = points.groupBy(
        F.col(entity_col).alias("__e"), cx.alias("__cx"), cy.alias("__cy")
    ).agg(F.count(F.lit(1)).alias("__c"))
    # H = -Σ (c/N) ln(c/N) = ln(N) - Σ c·ln(c) / N — pure aggregates,
    # no per-group share window
    ent = per_cell.groupBy("__e").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.log(F.sum("__c").cast("double"))
            - F.sum(F.col("__c").cast("double") * F.log(F.col("__c").cast("double")))
            / F.sum("__c").cast("double")
        ).alias("entropy"),
    )
    rog = points.groupBy(F.col(entity_col).alias("__e")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sqrt(
            F.var_pop(F.col(lat_col).cast("double"))
            + F.var_pop(F.col(lon_col).cast("double"))
        ).alias("rog_deg"),
    )
    return rog.join(ent, "__e").select(
        F.col("__e").alias(entity_col), "n_points", "rog_deg", "n_cells", "entropy"
    )
