"""Way-type classification + access filters (SURVEY.md §2 F20, P5-P7).

Re-expresses the 16-class decision tree of
reference/cycling_quality_index.py:512-686 as one ``when/otherwise`` cascade.
Branch order IS the semantics — the cascade mirrors the reference's branch
order exactly, including the crossing > link > bicycle-road override priority
(the reference assigns them in the opposite order and later assignments win,
reference/cycling_quality_index.py:533-541).

QGIS truthiness notes honoured here:
* ``x != v`` on a NULL tag is True in Python -> ``neq`` (null-safe).
* ``x not in [...]`` on NULL is True -> ``notin``.
* ``not x in ['yes','no']`` on NULL is True -> ``notin``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.colcache import ccol

from ..functions.nulls import falsy, neq, notin, truthy
from ..functions.tags import derive_separation, get_access

_YDP = ["yes", "designated", "permissive"]
_LTS = ["lane", "track", "share_busway"]  # noqa: N816 (reference value set)
_ALLOWED_BICYCLE_ACCESS = [
    "yes", "permissive", "designated", "use_sidepath", "optional_sidepath", "discouraged",
]
_FOOTWAY_LIKE = ["footway", "pedestrian", "bridleway", "steps"]


def _c(name: str) -> Column:
    # memoized: Column leaves are immutable and each F.col is a py4j
    # round-trip (functions/colcache.py)
    return ccol(f"`{name}`")


def _side_tag(base: str, value, side: Column) -> Column:
    """``cycleway == v or cycleway:both == v or (side=='right' and
    cycleway:right == v) or (side=='left' and cycleway:left == v)`` — the
    side-aware tag test used throughout the road branch
    (e.g. reference/cycling_quality_index.py:617,635,665)."""
    vals = value if isinstance(value, list) else [value]
    return (
        _c(base).isin(vals)
        | _c(f"{base}:both").isin(vals)
        | ((side == "right") & _c(f"{base}:right").isin(vals))
        | ((side == "left") & _c(f"{base}:left").isin(vals))
    )


def access_filter(df: DataFrame) -> DataFrame:
    """Row filters of reference/cycling_quality_index.py:516-521 and the
    restricted-footway deletion at :546-550 (P5-P7)."""
    def _holds(c: Column) -> Column:
        # a NULL predicate must mean "condition does not hold", not "drop
        # the row" — df.filter discards NULL results
        return F.coalesce(c, F.lit(False))

    bike = get_access(df, "bicycle")
    keep_access = falsy(bike) | bike.isin(_ALLOWED_BICYCLE_ACCESS)
    keep_informal = ~_holds(
        (_c("highway") == "path") & (_c("informal") == "yes") & _c("bicycle").isNull()
    )
    override = _override_way_type()
    # footway-like rows that would fall into the shared-footway branch with
    # restricted bicycle access are deleted inside the tree (:550)
    keep_footway = ~_holds(
        override.isNull()
        & _c("highway").isin(_FOOTWAY_LIKE)
        & notin(_c("bicycle"), _YDP)
    )
    return df.filter(_holds(keep_access) & keep_informal & keep_footway)


def _override_way_type() -> Column:
    """bicycle_road / link / crossing overrides
    (reference/cycling_quality_index.py:533-541); later assignments in the
    reference win, so priority is crossing > link > bicycle road."""
    link = (
        (_c("footway") == "link") | (_c("cycleway") == "link")
        | (_c("path") == "link") | (_c("bridleway") == "link")
    )
    crossing = (
        (_c("footway") == "crossing") | (_c("cycleway") == "crossing")
        | (_c("path") == "crossing") | (_c("bridleway") == "crossing")
    )
    bicycle_road = (_c("bicycle_road") == "yes") & falsy(_c("side"))
    return (
        F.when(crossing, F.lit("crossing"))
        .when(link, F.lit("link"))
        .when(bicycle_road, F.lit("bicycle road"))
    )


def way_type_expr(cols) -> Column:
    """The full classifier as a single expression
    (reference/cycling_quality_index.py:523-684)."""
    highway = _c("highway")
    side = _c("side")
    bicycle = _c("bicycle")
    foot = _c("foot")
    sep_foot = derive_separation(cols, "foot")
    sep_mv = derive_separation(cols, "motor_vehicle")
    #: `not separation_motor_vehicle in [NULL,'no','none']` (:580,623,657) —
    #: NULL fails, '' passes (it is not in the list), mirroring Python.
    sep_mv_present = sep_mv.isNotNull() & ~sep_mv.isin(["no", "none"])
    sep_mv_kerbish = sep_mv.contains("kerb") | sep_mv.contains("tree_row")

    # cycleway branch tail shared by highway=cycleway (:567-588) and the
    # road cycle-track branch (:652-663)
    def track_tail() -> Column:
        return F.when(
            sep_mv_present,
            F.when(sep_mv_kerbish, "cycle track").otherwise("cycle lane (protected)"),
        ).otherwise(F.lit("cycle track"))

    cycleway_branch = F.when(foot.isin(_YDP), "shared path").otherwise(
        F.when(sep_foot == "no", "segregated path").otherwise(
            F.when(
                notin(_c("is_sidepath"), ["yes", "no"]),
                F.when(_c("proc_sidepath") == "yes", "cycle track").otherwise("cycle path"),
            )
            .when(_c("is_sidepath") == "yes", track_tail())
            .otherwise(F.lit("cycle path"))
        )
    )

    lane_exclusive = (
        (_c("cycleway:lane") == "exclusive")
        | (_c("cycleway:both:lane") == "exclusive")
        | ((side == "right") & (_c("cycleway:right:lane") == "exclusive"))
        | ((side == "left") & (_c("cycleway:left:lane") == "exclusive"))
    )
    lane_branch = F.when(
        truthy(_c("cycleway:lanes")) & _c("cycleway:lanes").contains("no|lane|no"),
        F.lit("cycle lane (central)"),
    ).otherwise(
        F.when(sep_mv_present, "cycle lane (protected)").otherwise(
            F.when(lane_exclusive, "cycle lane (exclusive)").otherwise(
                F.lit("cycle lane (advisory)")
            )
        )
    )

    # segregated tests use the cycleway:segregated family (:643-650)
    seg_yes = (
        (_c("cycleway:segregated") == "yes") | (_c("cycleway:both:segregated") == "yes")
        | ((side == "right") & (_c("cycleway:right:segregated") == "yes"))
        | ((side == "left") & (_c("cycleway:left:segregated") == "yes"))
    )
    seg_no = (
        (_c("cycleway:segregated") == "no") | (_c("cycleway:both:segregated") == "no")
        | ((side == "right") & (_c("cycleway:right:segregated") == "no"))
        | ((side == "left") & (_c("cycleway:left:segregated") == "no"))
    )
    track_branch = F.when(
        _c("cycleway:foot").isin(_YDP)
        | _c("cycleway:both:foot").isin(_YDP)
        | ((side == "right") & _c("cycleway:right:foot").isin(_YDP))
        | ((side == "left") & _c("cycleway:left:foot").isin(_YDP)),
        F.lit("shared path"),
    ).otherwise(
        F.when(seg_yes, "segregated path")
        .when(seg_no, "shared path")
        .otherwise(
            F.when(sep_foot == "no", "segregated path").otherwise(track_tail())
        )
    )

    sidewalk_bike_yes = (
        (_c("sidewalk:bicycle") == "yes") | (_c("sidewalk:both:bicycle") == "yes")
        | ((side == "right") & (_c("sidewalk:right:bicycle") == "yes"))
        | ((side == "left") & (_c("sidewalk:left:bicycle") == "yes"))
    )

    def shared_road(markings_classes) -> Column:
        lm = _c("lane_markings")
        return F.when(
            (lm == "yes") | (neq(lm, "yes") & highway.isin(markings_classes)),
            F.lit("shared traffic lane"),
        ).otherwise(F.lit("shared road"))

    road_with_side = F.when(_c("type") == "sidewalk", "shared footway").otherwise(
        F.when(_side_tag("cycleway", "lane", side), lane_branch)
        .when(_side_tag("cycleway", "track", side), track_branch)
        .when(_side_tag("cycleway", "share_busway", side), F.lit("shared bus lane"))
        .otherwise(
            F.when(sidewalk_bike_yes, "shared footway").otherwise(
                shared_road(["primary", "secondary"])
            )
        )
    )

    main_tree = (
        F.when(highway.isin(_FOOTWAY_LIKE), F.when(bicycle.isin(_YDP), "shared footway"))
        .when(
            highway == "path",
            F.when((foot == "designated") & neq(bicycle, "designated"), "shared footway").otherwise(
                F.when(_c("segregated") == "yes", "segregated path").otherwise(F.lit("shared path"))
            ),
        )
        .when(highway == "cycleway", cycleway_branch)
        .when(highway.isin(["service", "track"]), F.lit("track or service"))
        .otherwise(
            F.when(
                falsy(side), shared_road(["motorway", "trunk", "primary", "secondary"])
            ).otherwise(road_with_side)
        )
    )

    return F.coalesce(_override_way_type(), main_tree)


def classify(df: DataFrame) -> DataFrame:
    """Apply access filters then assign ``way_type``."""
    out = access_filter(df)
    return out.withColumn("way_type", way_type_expr(out.columns))
