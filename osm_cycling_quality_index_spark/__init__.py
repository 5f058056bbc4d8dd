"""osm_cycling_quality_index_spark — a from-scratch PySpark-native
spatial-join + tiling engine with the query capabilities of
SupaplexOSM/OSM-Cycling-Quality-Index (reference at /root/reference)."""

__version__ = "0.1.0"
