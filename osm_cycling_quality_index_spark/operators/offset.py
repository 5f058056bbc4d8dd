"""Offset split: spawn separate left/right cycleway & sidewalk geometries
from centerline tags (SURVEY.md §2 P8, G4, U2, F2;
reference/cycling_quality_index.py:370-503).

Each branch is a filter + projection of the conformed frame: the per-side
attribute values overwrite the base tag columns exactly as the reference's
``deriveAttribute`` writebacks do (:470-496), the branch rows get
``side``/``type``/``offset`` set and are unioned with the centerline rows
(``native:mergevectorlayers``, :503).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.colcache import ccol

from .. import params as P
from ..functions.nulls import falsy, neq, truthy
from ..functions.tags import derive_attribute, get_number
from ..geo.udfs import make_offset_udf

_LTS_SET = ["lane", "track", "share_busway"]
_YDP = ["yes", "designated", "permissive"]


def _c(name: str) -> Column:
    # memoized: Column leaves are immutable and each F.col is a py4j
    # round-trip (functions/colcache.py)
    return ccol(f"`{name}`")


def _offset_value(width_based: Column, mode) -> Column:
    """Offset distance per parameter mode (reference/cycling_quality_index.py:391-420):
    'realistic' derives from the road width, otherwise a static number."""
    if mode == "realistic":
        return width_based
    return F.lit(float(mode))


def offset_flags(df: DataFrame, mode=None) -> DataFrame:
    """offset_cycleway_left/right, offset_sidewalk_left/right
    (reference/cycling_quality_index.py:376-448)."""
    mode = P.OFFSET_DISTANCE if mode is None else mode
    width = get_number(_c("width"))
    hw_default = F.lit(P.DEFAULT_HIGHWAY_WIDTH_FALLBACK)
    for k, v in P.DEFAULT_HIGHWAY_WIDTH_DICT.items():
        hw_default = F.when(_c("highway") == k, F.lit(v)).otherwise(hw_default)
    width = F.when(width.isNotNull() & (width != 0.0), width).otherwise(hw_default)

    cw, cwb = _c("cycleway"), _c("cycleway:both")
    cwl, cwr = _c("cycleway:left"), _c("cycleway:right")
    # null-safe: reference Python `highway != 'cycleway'` is True for a NULL
    # highway (:377), so the branch still spawns; a raw != would yield NULL
    not_cycleway = neq(_c("highway"), "cycleway")
    cyc_left = not_cycleway & (cw.isin(_LTS_SET) | cwb.isin(_LTS_SET) | cwl.isin(_LTS_SET))
    cyc_right = not_cycleway & (cw.isin(_LTS_SET) | cwb.isin(_LTS_SET) | cwr.isin(_LTS_SET))

    sb, sbb = _c("sidewalk:bicycle"), _c("sidewalk:both:bicycle")
    sbl, sbr = _c("sidewalk:left:bicycle"), _c("sidewalk:right:bicycle")
    sw_left = sb.isin(_YDP) | sbb.isin(_YDP) | sbl.isin(_YDP)
    sw_right = sb.isin(_YDP) | sbb.isin(_YDP) | sbr.isin(_YDP)

    return df.withColumns({
        "offset_cycleway_left": F.when(cyc_left, _offset_value(width / 2, mode)),
        "offset_cycleway_right": F.when(cyc_right, _offset_value(width / 2, mode)),
        "offset_sidewalk_left": F.when(sw_left, _offset_value(width / 2 + 2, mode)),
        "offset_sidewalk_right": F.when(sw_right, _offset_value(width / 2 + 2, mode)),
    })


def _branch(df: DataFrame, typ: str, side: str, mode=None) -> DataFrame:
    """One offset branch (reference/cycling_quality_index.py:456-496)."""
    mode = P.OFFSET_DISTANCE if mode is None else mode
    offset_col = f"offset_{typ}_{side}"
    b = df.filter(F.col(offset_col).isNotNull())
    cols = b.columns
    sign = 1.0 if side == "left" else -1.0

    # surface/smoothness transfer condition (:476-479): cycle *lanes* share the
    # road surface unless a track or an explicit tag says otherwise; the
    # reference compares `!= NULL` (not falsy!) on the explicit tags
    is_track = (
        (_c(f"cycleway:{side}") == "track")
        | (_c("cycleway:both") == "track")
        | (_c("cycleway") == "track")
    )

    def explicit(attr: str) -> Column:
        return (
            _c(f"{typ}:{side}:{attr}").isNotNull()
            | _c(f"{typ}:both:{attr}").isNotNull()
            | _c(f"{typ}:{attr}").isNotNull()
        )

    surface_ok = F.lit(typ != "cycleway") | is_track | explicit("surface")
    smooth_ok = F.lit(typ != "cycleway") | is_track | explicit("smoothness")

    updates: dict[str, Column] = {
        # the stored offset attribute is the positive distance for both sides
        # (:462); the sign only applies to the geometry offset direction
        "offset": F.col(offset_col),
        "type": F.lit(typ),
        "side": F.lit(side),
        "proc_sidepath": F.lit("yes"),
        "proc_highway": _c("highway"),
        # QGIS coerces the raw maxspeed string into the Int column (:468)
        "proc_maxspeed": _c("maxspeed").try_cast("int"),
        "width": derive_attribute(cols, "width", typ, side, "float"),
        "oneway": derive_attribute(cols, "oneway", typ, side, "str"),
        "oneway:bicycle": derive_attribute(cols, "oneway:bicycle", typ, side, "str"),
        "traffic_sign": derive_attribute(cols, "traffic_sign", typ, side, "str"),
        "surface": F.when(surface_ok, derive_attribute(cols, "surface", typ, side, "str")).otherwise(_c("surface")),
        "smoothness": F.when(smooth_ok, derive_attribute(cols, "smoothness", typ, side, "str")).otherwise(_c("smoothness")),
    }
    if typ == "cycleway":
        for attr in [
            "separation", "separation:both", "separation:left", "separation:right",
            "buffer", "buffer:both", "buffer:left", "buffer:right",
            "traffic_mode:both", "traffic_mode:left", "traffic_mode:right",
            "surface:colour",
        ]:
            updates[attr] = derive_attribute(cols, attr, typ, side, "str")

    b = b.withColumns(updates)
    # geometry offset (G4) only when a non-zero distance is configured;
    # the default static offset 0 keeps geometry identical (:442-448)
    if mode == "realistic" and "geometry" in cols:
        b = b.withColumn(
            "geometry", make_offset_udf()("geometry", F.col("offset") * F.lit(sign))
        )
    return b


def offset_stage(df: DataFrame, mode=None) -> DataFrame:
    """Flags + 4 branches + union with the centerline frame (U2)."""
    df = offset_flags(df, mode)
    branches = [
        _branch(df, typ, side, mode)
        for side in ("left", "right")
        for typ in ("cycleway", "sidewalk")
    ]
    return reduce(lambda a, b: a.unionByName(b), branches, df)
