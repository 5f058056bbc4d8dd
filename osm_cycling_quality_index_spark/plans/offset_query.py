"""Offset-split correctness query (SURVEY.md §2 P8/G4/U2): run
``offset_stage`` with OFFSET_DISTANCE='realistic' over roads synthesized from
supplier, so the geometry-offset UDF actually executes, and mirror the
per-side attribute transfer (reference/cycling_quality_index.py:370-503) and
the offset geometry itself in DuckDB (2-point horizontal lines: the parallel
curve is exactly y +/- offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import params as P
from ..geo.kernels import LAT0, LON0, MPD_X, MPD_Y

_MX = repr(MPD_X)
_MY = repr(MPD_Y)

_HW = ["residential", "primary", "secondary", "living_street"]
_WIDTH = [None, "8.4", "12.6"]
_MAXSPEED = [None, "30", "50"]
_CW = [None, "track", None, "lane", None]
_CW_R = [None, "lane", None, None, "track", None, None]

#: (column, mod, hit, value) keyed on s_suppkey
_SPOT = [
    ("cycleway:left", 6, 2, "lane"),
    ("cycleway:both", 11, 4, "share_busway"),
    ("sidewalk:bicycle", 5, 1, "yes"),
    ("sidewalk:right:bicycle", 8, 3, "designated"),
    ("sidewalk:both:bicycle", 13, 6, "permissive"),
    ("cycleway:right:width", 4, 1, "1.85"),
    ("cycleway:width", 6, 0, "1.5"),
    ("cycleway:both:surface", 5, 2, "paving_stones"),
    ("cycleway:surface", 7, 3, "asphalt"),
    ("cycleway:right:smoothness", 9, 2, "good"),
    ("cycleway:oneway", 4, 2, "yes"),
    ("cycleway:right:traffic_sign", 10, 5, "DE:237"),
    ("sidewalk:right:width", 9, 4, "2.5"),
    ("sidewalk:surface", 6, 5, "sett"),
    ("surface", 2, 0, "asphalt"),
    ("smoothness", 5, 3, "bad"),
]


from .synth_util import pick as _pick, sql_pick as _sql_pick_str  # noqa: E402


def _ways_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    ax = ((k * 53) % 180).cast("double") * 35.0 + 0.25
    ay = ((k * 89) % 190).cast("double") * 55.0 + 0.25
    ln = (230 + (k % 11) * 93).cast("double")
    lon0 = F.lit(LON0) + ax / F.lit(MPD_X)
    lon1 = F.lit(LON0) + (ax + ln) / F.lit(MPD_X)
    lat = F.lit(LAT0) + ay / F.lit(MPD_Y)
    cols = {
        "id": F.concat(F.lit("w"), k),
        "geometry": F.array(
            F.struct(lon0.alias("x"), lat.alias("y")),
            F.struct(lon1.alias("x"), lat.alias("y")),
        ),
        "highway": _pick(k, _HW),
        "width": _pick(k, _WIDTH),
        "maxspeed": _pick(k + 1, _MAXSPEED),
        "cycleway": _pick(k, _CW),
        "cycleway:right": _pick(k + 3, _CW_R),
    }
    for col, mod, hit, val in _SPOT:
        cols[col] = F.when(k % mod == hit, F.lit(val))
    return s.select(*[v.alias(name) for name, v in cols.items()])


def q_cqi_offset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.conform import conform_ways
    from ..operators.offset import offset_stage

    df = conform_ways(_ways_df(spark, sf_dir), keep_geometry=True)
    out = offset_stage(df, mode="realistic")
    y_m = (F.col("geometry")[0]["y"] - F.lit(LAT0)) * F.lit(MPD_Y)
    return out.select(
        "id", "side", "type",
        F.round("offset", 4).alias("offset_r"),
        F.col("width").cast("double").alias("width_d"),
        "oneway", "surface", "smoothness", "traffic_sign", "proc_sidepath",
        F.col("proc_maxspeed").cast("int").alias("proc_maxspeed"),
        F.round(y_m, 4).alias("y_m"),
    )


def offset_oracle_sql() -> str:
    hw_w = {h: P.DEFAULT_HIGHWAY_WIDTH_DICT[h] for h in _HW}
    hw_case = "CASE " + " ".join(
        f"WHEN highway = '{h}' THEN {w}" for h, w in hw_w.items()
    ) + " END"
    spot_cols = ",\n         ".join(
        f"CASE WHEN s_suppkey % {mod} = {hit} THEN '{val}' END AS \"{col}\""
        for col, mod, hit, val in _SPOT
    )
    # every ladder member the mirror reads must exist; declare the
    # non-generated ones as typed NULLs (the engine's schema conformance)
    generated = {c for c, *_ in _SPOT} | {
        "cycleway", "cycleway:right", "width", "maxspeed", "highway",
    }
    ladder_cols = set()
    for typ in ("cycleway", "sidewalk"):
        for attr in ("width", "oneway", "surface", "smoothness", "traffic_sign"):
            for mid in ("left:", "right:", "both:", ""):
                ladder_cols.add(f"{typ}:{mid}{attr}")
    null_cols = ",\n         ".join(
        f'CAST(NULL AS VARCHAR) AS "{c}"'
        for c in sorted(ladder_cols - generated)
    )
    spot_cols = spot_cols + ",\n         " + null_cols
    lts = "('lane','track','share_busway')"
    ydp = "('yes','designated','permissive')"

    def ladder(typ: str, side: str, attr: str) -> str:
        return (f'COALESCE("{typ}:{side}:{attr}", "{typ}:both:{attr}", '
                f'"{typ}:{attr}")')

    def branch(typ: str, side: str, sign: str, cond: str, off: str) -> str:
        if typ == "cycleway":
            is_track = (f'("cycleway:{side}" = \'track\' OR "cycleway:both" = \'track\''
                        f' OR cycleway = \'track\')')
            explicit_s = (f'("cycleway:{side}:surface" IS NOT NULL OR '
                          f'"cycleway:both:surface" IS NOT NULL OR '
                          f'"cycleway:surface" IS NOT NULL)')
            explicit_sm = (f'("cycleway:{side}:smoothness" IS NOT NULL OR '
                           f'"cycleway:both:smoothness" IS NOT NULL OR '
                           f'"cycleway:smoothness" IS NOT NULL)')
            surface = (f"CASE WHEN {is_track} OR {explicit_s} "
                       f"THEN {ladder(typ, side, 'surface')} ELSE surface END")
            smooth = (f"CASE WHEN {is_track} OR {explicit_sm} "
                      f"THEN {ladder(typ, side, 'smoothness')} ELSE smoothness END")
        else:
            surface = ladder(typ, side, "surface")
            smooth = ladder(typ, side, "smoothness")
        return f"""
SELECT id, '{side}' AS side, '{typ}' AS type,
       ROUND({off}, 4) AS offset_r,
       TRY_CAST({ladder(typ, side, 'width')} AS DOUBLE) AS width_d,
       {ladder(typ, side, 'oneway')} AS oneway,
       {surface} AS surface,
       {smooth} AS smoothness,
       {ladder(typ, side, 'traffic_sign')} AS traffic_sign,
       'yes' AS proc_sidepath,
       TRY_CAST(maxspeed AS INT) AS proc_maxspeed,
       ROUND(ay {sign} {off}, 4) AS y_m
FROM raw WHERE {cond}"""

    cyc_l = f"(cycleway IN {lts} OR \"cycleway:both\" IN {lts} OR \"cycleway:left\" IN {lts})"
    cyc_r = f"(cycleway IN {lts} OR \"cycleway:both\" IN {lts} OR \"cycleway:right\" IN {lts})"
    sw_l = f"(\"sidewalk:bicycle\" IN {ydp} OR \"sidewalk:both:bicycle\" IN {ydp})"
    sw_r = (f"(\"sidewalk:bicycle\" IN {ydp} OR \"sidewalk:both:bicycle\" IN {ydp}"
            f" OR \"sidewalk:right:bicycle\" IN {ydp})")
    off_cyc = "(weff / 2)"
    off_sw = "(weff / 2 + 2)"

    return f"""
WITH raw0 AS (
  SELECT 'w' || CAST(s_suppkey AS VARCHAR) AS id, s_suppkey,
         ((({LAT0!r} + ((((s_suppkey * 89) % 190) * 55.0 + 0.25)) / {_MY}) - {LAT0!r}) * {_MY}) AS ay,
         {_sql_pick_str("s_suppkey", _HW)} AS highway,
         {_sql_pick_str("s_suppkey", _WIDTH)} AS width,
         {_sql_pick_str("(s_suppkey + 1)", _MAXSPEED)} AS maxspeed,
         {_sql_pick_str("s_suppkey", _CW)} AS cycleway,
         {_sql_pick_str("(s_suppkey + 3)", _CW_R)} AS "cycleway:right",
         {spot_cols}
  FROM supplier
),
raw AS (
  SELECT *,
    CASE WHEN TRY_CAST(width AS DOUBLE) IS NOT NULL AND TRY_CAST(width AS DOUBLE) <> 0
         THEN TRY_CAST(width AS DOUBLE) ELSE {hw_case} END AS weff
  FROM raw0
)
SELECT id, CAST(NULL AS VARCHAR) AS side, CAST(NULL AS VARCHAR) AS type,
       CAST(NULL AS DOUBLE) AS offset_r,
       TRY_CAST(width AS DOUBLE) AS width_d,
       CAST(NULL AS VARCHAR) AS oneway, surface, smoothness,
       CAST(NULL AS VARCHAR) AS traffic_sign,
       CAST(NULL AS VARCHAR) AS proc_sidepath, CAST(NULL AS INT) AS proc_maxspeed,
       ROUND(ay, 4) AS y_m
FROM raw
UNION ALL {branch("cycleway", "left", "+", cyc_l, off_cyc)}
UNION ALL {branch("sidewalk", "left", "+", sw_l, off_sw)}
UNION ALL {branch("cycleway", "right", "-", cyc_r, off_cyc)}
UNION ALL {branch("sidewalk", "right", "-", sw_r, off_sw)}
"""



