"""Geospatial radius join via grid-cell bucketing.

Reference parity: the reference ETL (child.py) has no spatial surface;
this extends SURVEY.md section 2 Part C with the standard Spark recipe
for "join points within R km" — the workload class (store/courier
matching, POI conflation, geo dedup) that naive engines write as a
cross join. The testdata carries no coordinates, so both sides DERIVE
deterministic lat/lon from integer keys with pure modular arithmetic —
exactly reproducible in the DuckDB oracle, which runs the brute-force
quadratic haversine and thereby PROVES the grid join drops no pairs.

Coverage argument (why grid + 1-cell neighborhood is exact here):
latitudes are clamped to (-60, 60), so one degree of longitude is at
least 111.32*cos(60) = 55.66 km. With GEO_CELL_DEG = 4 a pair within
GEO_RADIUS_KM = 200 km is at most 200/55.66 = 3.6 degrees apart in
longitude and 1.8 in latitude — strictly less than one cell — so
matching partners always sit in the same or an adjacent cell. Longitudes
are clamped to (-170, 170), so neighborhoods never wrap the antimeridian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

GEO_RADIUS_KM = 200.0
GEO_CELL_DEG = 4
EARTH_RADIUS_KM = 6371.0
GEO_KNN_K = 3

#: Deterministic coordinate derivation (same expressions in the oracle):
#: multiplier primes decorrelate the two tables' grids.
_LAT_C = "((c_custkey * 7919) % 12000) / 100.0 - 60.0"
_LON_C = "((c_custkey * 104729) % 34000) / 100.0 - 170.0"
_LAT_S = "((s_suppkey * 6007) % 12000) / 100.0 - 60.0"
_LON_S = "((s_suppkey * 31337) % 34000) / 100.0 - 170.0"


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"  sin(radians(({lat2}) - ({lat1})) / 2) ^ 2"
        f"  + cos(radians({lat1})) * cos(radians({lat2}))"
        f"    * sin(radians(({lon2}) - ({lon1})) / 2) ^ 2))"
    )


_GEO_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey, {_LAT_C} AS lat_c, {_LON_C} AS lon_c FROM customer
    ),
    s AS (
      SELECT s_suppkey, {_LAT_S} AS lat_s, {_LON_S} AS lon_s FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_suppkey,
             {_haversine_sql("lat_c", "lon_c", "lat_s", "lon_s")} AS dist
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey, ROUND(dist, 4) AS dist_km
    FROM pairs WHERE dist <= {GEO_RADIUS_KM}
"""


def _haversine(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


@register("join_geo_distance", oracle=_GEO_ORACLE)
def join_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within GEO_RADIUS_KM great-circle
    km, via grid-cell bucketing: each side keys on its floor(lat/4°,
    lon/4°) cell, the SMALL side (suppliers) replicates into its 3x3
    cell neighborhood, and an equi-join on the cell key feeds the exact
    haversine verify. The module docstring carries the proof that the
    1-cell neighborhood covers the radius on this latitude band, so
    this plan is EXACTLY the brute-force cross join the oracle runs —
    candidate generation only ever discards.

    Scale shape: the quadratic cross join becomes one equi-join whose
    key (the cell) has bounded collision sets; the 9x replication lands
    on the small side only. The join carries NO broadcast hint:
    supplier is an SF-scaling table, so a hard hint would force a
     9x-replicated full-table broadcast at any scale (the r7 OOM
    class). AQE sizes the replicated side at runtime — it broadcasts
    at fixture scale and degrades gracefully to a shuffle-hash join on
    the cell key when suppliers outgrow the threshold; skewed megacity
    cells get AQE skew-split or a finer GEO_CELL_DEG. Spatial
    libraries (Sedona) generalize this to R-tree partitioning; for
    fixed-radius point joins the flat grid is the right tool."""
    t = load(spark, sf_dir)
    cust = t.customer.select(
        "c_custkey",
        F.expr(_LAT_C).alias("lat_c"),
        F.expr(_LON_C).alias("lon_c"),
    ).withColumns(
        {
            "cell_lat": F.floor(F.col("lat_c") / GEO_CELL_DEG),
            "cell_lon": F.floor(F.col("lon_c") / GEO_CELL_DEG),
        }
    )
    neighbor = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    supp = (
        t.supplier.select(
            "s_suppkey",
            F.expr(_LAT_S).alias("lat_s"),
            F.expr(_LON_S).alias("lon_s"),
        )
        .withColumn("dlat", F.explode(neighbor))
        .withColumn("dlon", F.explode(neighbor))
        .select(
            "s_suppkey",
            "lat_s",
            "lon_s",
            (F.floor(F.col("lat_s") / GEO_CELL_DEG) + F.col("dlat")).alias(
                "cell_lat"
            ),
            (F.floor(F.col("lon_s") / GEO_CELL_DEG) + F.col("dlon")).alias(
                "cell_lon"
            ),
        )
    )
    dist = _haversine(
        F.col("lat_c"), F.col("lon_c"), F.col("lat_s"), F.col("lon_s")
    )
    return (
        cust.join(supp, ["cell_lat", "cell_lon"])
        .withColumn("dist", dist)
        .where(F.col("dist") <= GEO_RADIUS_KM)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round("dist", 4).alias("dist_km"),
        )
    )


_GEO_KNN_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey, {_LAT_C} AS lat_c, {_LON_C} AS lon_c FROM customer
    ),
    s AS (
      SELECT s_suppkey, {_LAT_S} AS lat_s, {_LON_S} AS lon_s FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_suppkey,
             {_haversine_sql("lat_c", "lon_c", "lat_s", "lon_s")} AS dist
      FROM c CROSS JOIN s
    ),
    ranked AS (
      SELECT c_custkey, s_suppkey, dist,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist, s_suppkey) AS rnk
      FROM pairs WHERE dist <= {GEO_RADIUS_KM}
    )
    SELECT c_custkey, s_suppkey, ROUND(dist, 4) AS dist_km,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {GEO_KNN_K}
"""


@register("join_geo_knn", oracle=_GEO_KNN_ORACLE)
def join_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded k-nearest-neighbor join: for each customer, the
    GEO_KNN_K nearest suppliers within GEO_RADIUS_KM (courier
    assignment, nearest-warehouse routing). "Within R" is what makes a
    grid kNN EXACT without ring expansion: the module docstring's
    coverage proof guarantees every supplier inside R sits in the 3x3
    cell neighborhood, so ranking the radius-join candidates per
    customer IS the true bounded kNN — the same candidates the oracle's
    brute-force cross join ranks. (Unbounded kNN would need iterative
    ring growth for customers whose neighborhood is empty; bounding by
    R is the form that stays one-pass and is what dispatch/matching
    workloads actually ask.)

    Scale shape: candidate generation is join_geo_distance's grid join
    (hint-free — AQE broadcasts the replicated supplier side at
    fixture scale, shuffle-hash beyond); the per-customer top-k runs
    under Window.partitionBy(c_custkey) — millions of independent
    partitions each bounded by the 3x3-cell supplier density, never a
    table-scale sort. Tie/determinism note: ranking orders by the raw
    double distance with the supplier key as total tiebreak; distances
    of distinct synthetic points are separated by far more than the
    1-ulp libm divergence Spark/DuckDB trig can exhibit."""
    t = load(spark, sf_dir)
    cust = t.customer.select(
        "c_custkey",
        F.expr(_LAT_C).alias("lat_c"),
        F.expr(_LON_C).alias("lon_c"),
    ).withColumns(
        {
            "cell_lat": F.floor(F.col("lat_c") / GEO_CELL_DEG),
            "cell_lon": F.floor(F.col("lon_c") / GEO_CELL_DEG),
        }
    )
    neighbor = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    supp = (
        t.supplier.select(
            "s_suppkey",
            F.expr(_LAT_S).alias("lat_s"),
            F.expr(_LON_S).alias("lon_s"),
        )
        .withColumn("dlat", F.explode(neighbor))
        .withColumn("dlon", F.explode(neighbor))
        .select(
            "s_suppkey",
            "lat_s",
            "lon_s",
            (F.floor(F.col("lat_s") / GEO_CELL_DEG) + F.col("dlat")).alias(
                "cell_lat"
            ),
            (F.floor(F.col("lon_s") / GEO_CELL_DEG) + F.col("dlon")).alias(
                "cell_lon"
            ),
        )
    )
    from pyspark.sql.window import Window

    dist = _haversine(
        F.col("lat_c"), F.col("lon_c"), F.col("lat_s"), F.col("lon_s")
    )
    w = Window.partitionBy("c_custkey").orderBy("dist", "s_suppkey")
    return (
        cust.join(supp, ["cell_lat", "cell_lon"])
        .withColumn("dist", dist)
        .where(F.col("dist") <= GEO_RADIUS_KM)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= GEO_KNN_K)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round("dist", 4).alias("dist_km"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


#: Standard geohash base32 (no a/i/l/o) and quantization depth: 20 bits
#: per axis -> 40 interleaved bits -> 8 characters (~19 m cell height).
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 20

#: Closed-form bit math shared verbatim by both engines: every shift is
#: floor(x / 2^k) arithmetic (exact — the operands are integer-valued
#: doubles below 2^53 and powers of two are exact), so no engine's
#: bitwise-operator semantics enter the comparison.
_GH40_SQL = """
    CAST(list_sum(list_transform(range(0, 40), p ->
      (floor((CASE WHEN p % 2 = 0 THEN lon_q ELSE lat_q END)
              / pow(2, 19 - p // 2))
       - 2 * floor((CASE WHEN p % 2 = 0 THEN lon_q ELSE lat_q END)
                   / pow(2, 20 - p // 2)))
      * pow(2, 39 - p))) AS BIGINT)
"""

_GEOHASH_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey,
             {_LAT_C} AS lat, {_LON_C} AS lon,
             CAST(floor((({_LAT_C}) + 90.0) / 180.0 * 1048576) AS BIGINT)
               AS lat_q,
             CAST(floor((({_LON_C}) + 180.0) / 360.0 * 1048576) AS BIGINT)
               AS lon_q
      FROM customer
    ),
    gh AS (
      SELECT c_custkey, lat, lon, {_GH40_SQL} AS gh40 FROM pts
    )
    SELECT c_custkey, lat, lon,
           (SELECT string_agg(
              substr('{GEOHASH_ALPHABET}',
                     CAST(floor(gh40 / pow(2, 35 - 5 * j))
                          - 32 * floor(gh40 / pow(2, 40 - 5 * j))
                          AS INT) + 1, 1), '' ORDER BY j)
            FROM range(0, 8) t(j)) AS geohash,
           (SELECT string_agg(
              substr('{GEOHASH_ALPHABET}',
                     CAST(floor(gh40 / pow(2, 35 - 5 * j))
                          - 32 * floor(gh40 / pow(2, 40 - 5 * j))
                          AS INT) + 1, 1), '' ORDER BY j)
            FROM range(0, 4) t(j)) AS gh_prefix4
    FROM gh
"""


@register("fn_geohash", oracle=_GEOHASH_ORACLE)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (Niemeyer's interleaved-bit base32) of the
    derived customer coordinates — the standard prefix-joinable spatial
    bucketing key (a shared k-char prefix bounds the distance between
    two points, so geohash prefixes are the portable alternative to
    this module's explicit grid cells, and the layout key spatial
    tables cluster on). 20 bits per axis -> 40 interleaved bits -> 8
    base32 chars; gh_prefix4 is the ~20 km join/cluster granularity.

    Everything is pure Column arithmetic: quantization is one floor per
    axis, bit interleaving is a 40-term fold of floor-division shifts
    (exact dyadic doubles — no engine bitwise ops), characters index a
    literal alphabet array. One scan, zero shuffles, zero UDFs; the
    same expressions run verbatim in the oracle."""
    t = load(spark, sf_dir)
    # cast: Spark parses the SQL literals in _LAT_C as DECIMAL; the
    # oracle computes in DOUBLE, and the quantization floor must see the
    # same binary value on both engines.
    lat = F.expr(_LAT_C).cast("double")
    lon = F.expr(_LON_C).cast("double")
    pts = t.customer.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor((lat + 90.0) / 180.0 * (1 << _GH_BITS)).alias("lat_q"),
        F.floor((lon + 180.0) / 360.0 * (1 << _GH_BITS)).alias("lon_q"),
    )

    def _bit_term(p):
        src = F.when(p % 2 == 0, F.col("lon_q")).otherwise(F.col("lat_q"))
        hi = F.floor(src / F.pow(F.lit(2.0), 19 - F.floor(p / 2)))
        hi2 = F.floor(src / F.pow(F.lit(2.0), 20 - F.floor(p / 2)))
        return (hi - 2 * hi2) * F.pow(F.lit(2.0), 39 - p)

    gh40 = F.aggregate(
        F.sequence(F.lit(0), F.lit(39)),
        F.lit(0.0),
        lambda acc, p: acc + _bit_term(p),
    ).cast("bigint")
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])

    def _char(j):
        code = (
            F.floor(F.col("gh40") / F.pow(F.lit(2.0), F.lit(float(35 - 5 * j))))
            - 32
            * F.floor(F.col("gh40") / F.pow(F.lit(2.0), F.lit(float(40 - 5 * j))))
        ).cast("int")
        return F.element_at(alphabet, code + 1)

    gh = pts.withColumn("gh40", gh40)
    return gh.select(
        "c_custkey",
        "lat",
        "lon",
        F.concat(*[_char(j) for j in range(8)]).alias("geohash"),
        F.concat(*[_char(j) for j in range(4)]).alias("gh_prefix4"),
    )


#: Service-region rectangles derived from the nation key (bounded
#: dimension: one box per nation; spans in whole degrees).
_BOX_LAT0 = "((n_nationkey * 3571) % 9000) / 100.0 - 55.0"
_BOX_LON0 = "((n_nationkey * 7177) % 30000) / 100.0 - 165.0"
BOX_LAT_SPAN = 12.0
BOX_LON_SPAN = 24.0

_BBOX_ORACLE = f"""
    WITH box AS (
      SELECT n_nationkey AS region_id,
             {_BOX_LAT0} AS lat0, {_BOX_LON0} AS lon0
      FROM nation
    ),
    pts AS (
      SELECT c_custkey, {_LAT_C} AS lat, {_LON_C} AS lon FROM customer
    )
    SELECT b.region_id,
           ROUND(b.lat0, 2) AS lat0,
           ROUND(b.lon0, 2) AS lon0,
           CAST(COUNT(p.c_custkey) AS BIGINT) AS n_points
    FROM box b LEFT JOIN pts p
      ON p.lat >= b.lat0 AND p.lat < b.lat0 + {BOX_LAT_SPAN}
     AND p.lon >= b.lon0 AND p.lon < b.lon0 + {BOX_LON_SPAN}
    GROUP BY b.region_id, b.lat0, b.lon0
"""


@register("join_geo_bbox", oracle=_BBOX_ORACLE)
def join_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-rectangle containment join: customers assigned to the
    nation-derived service boxes, counted per region — the
    bounding-box primitive under every point-in-polygon workload (a
    real polygon engine broad-phases with exactly this test, then
    narrow-phases the survivors). Boxes may overlap and points may
    match several or none; the LEFT join keeps empty regions visible.

    Scale shape: the REGION table is dimension-bounded (one box per
    nation — genuinely small, unlike the SF-scaling supplier frame the
    r8 broadcast purge removed), so broadcasting it is the honest
    plan: the theta-join predicate runs map-side against the broadcast
    boxes and the only shuffle is the per-region count. At planetary
    box counts the grid-cell bucketing of join_geo_distance takes
    over."""
    t = load(spark, sf_dir)
    box = t.nation.select(
        F.col("n_nationkey").alias("region_id"),
        (((F.col("n_nationkey") * 3571) % 9000) / 100.0 - 55.0).alias("lat0"),
        (((F.col("n_nationkey") * 7177) % 30000) / 100.0 - 165.0).alias(
            "lon0"
        ),
    )
    pts = t.customer.select(
        "c_custkey",
        (((F.col("c_custkey") * 7919) % 12000) / 100.0 - 60.0).alias("lat"),
        (((F.col("c_custkey") * 104729) % 34000) / 100.0 - 170.0).alias(
            "lon"
        ),
    )
    joined = F.broadcast(box).join(
        pts,
        (F.col("lat") >= F.col("lat0"))
        & (F.col("lat") < F.col("lat0") + BOX_LAT_SPAN)
        & (F.col("lon") >= F.col("lon0"))
        & (F.col("lon") < F.col("lon0") + BOX_LON_SPAN),
        "left",
    )
    return joined.groupBy("region_id", "lat0", "lon0").agg(
        F.count("c_custkey").cast("bigint").alias("n_points")
    ).select(
        "region_id",
        F.round("lat0", 2).alias("lat0"),
        F.round("lon0", 2).alias("lon0"),
        "n_points",
    )
