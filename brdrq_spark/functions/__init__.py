from brdrq_spark.functions.geo import (
    geo_features_udf,
    geom_type_udf,
    make_valid_udf,
    wkt_to_wkb_udf,
    wkb_to_wkt_udf,
)

__all__ = [
    "geo_features_udf",
    "geom_type_udf",
    "make_valid_udf",
    "wkt_to_wkb_udf",
    "wkb_to_wkt_udf",
]
