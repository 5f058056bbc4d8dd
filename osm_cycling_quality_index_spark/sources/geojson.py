"""GeoJSON source/sink (SURVEY.md §2.1 S1/S2/S3/S6).

The reference reads LineString FeatureCollections via OGR
(reference/cycling_quality_index.py:42-66) and writes GeoJSON output
(:1648).  Here the source is Spark's JSON reader + an explode of the feature
array; multiple numbered input files union (S2) and duplicate geometries drop
on a canonical geometry key (S3, ``native:deleteduplicategeometries``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson(spark: SparkSession, *paths: str) -> DataFrame:
    """FeatureCollection file(s) -> ways frame: one column per property +
    ``geometry array<struct<x,y>>``.  Only LineString features are kept
    (``|geometrytype=LineString`` in the reference)."""
    from .. import params as P

    dfs = []
    # explicit schema: inference over mixed Point/LineString features corrupts
    # the coordinates type; a StringType field captures the raw JSON text and
    # properties stay a map (OSM tags are stringly-typed anyway)
    schema = (
        "features array<struct<"
        "geometry struct<type string, coordinates string>, "
        "properties map<string,string>>>"
    )
    # newline-delimited Feature records (this module's own sink shape): one
    # JSON object per line, top-level geometry/properties
    nd_schema = (
        "geometry struct<type string, coordinates string>, "
        "properties map<string,string>"
    )

    def _features_to_ways(feats: DataFrame) -> DataFrame:
        coords = F.from_json(F.col("f.geometry.coordinates"), "array<array<double>>")
        geom = F.transform(
            coords, lambda pt: F.struct(pt[0].alias("x"), pt[1].alias("y"))
        ).alias("geometry")
        props = F.col("f.properties")
        cols = [props[k].alias(k) for k in P.ATTRIBUTES_LIST]
        return feats.select(geom, *cols)

    for path in paths:
        # FeatureCollection shape (reference input): whole-file JSON with a
        # features array.  An NDJSON input contributes 0 rows here (no
        # features field), so the two reads are disjoint and union cleanly.
        raw = spark.read.option("multiLine", "true").schema(schema).json(path)
        fc = raw.select(F.explode("features").alias("f")).where(
            F.col("f.geometry.type") == "LineString"
        )
        # NDJSON Feature shape (this sink's output): one Feature per line.
        # A pretty-printed FeatureCollection parses as corrupt/NULL rows here
        # and is filtered by the LineString predicate.
        nd = (
            spark.read.schema(nd_schema).json(path)
            .select(F.struct("geometry", "properties").alias("f"))
            .where(F.col("f.geometry.type") == "LineString")
        )
        dfs.append(_features_to_ways(fc).unionByName(_features_to_ways(nd)))
    if len(dfs) == 1:
        return dfs[0]
    # S2 multi-file merge
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def drop_duplicate_geometries(df: DataFrame) -> DataFrame:
    """S3: one row per canonical geometry (vertex list serialized as key).
    Explicit string serialization — Spark 4.1's to_json returns NULL for a
    top-level array<struct> column."""
    key = F.array_join(
        F.transform(
            "geometry",
            lambda p: F.concat_ws(":", p["x"].cast("string"), p["y"].cast("string")),
        ),
        ";",
    )
    return (
        df.withColumn("_geom_key", key)
        .dropDuplicates(["_geom_key"])
        .drop("_geom_key")
    )


def write_geojson_features(df: DataFrame, path: str) -> None:
    """S6 sink: newline-delimited GeoJSON Feature records (the distributed
    analogue of a FeatureCollection; `jq -s '{type:"FeatureCollection",
    features:.}'` rebuilds the reference's exact output shape)."""
    props = [c for c in df.columns if c != "geometry"]
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("LineString").alias("type"),
            F.transform("geometry", lambda p: F.array(p["x"], p["y"])).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(f"`{c}`").alias(c) for c in props]).alias("properties"),
    )
    df.select(F.to_json(feature).alias("value")).write.mode("overwrite").text(path)
