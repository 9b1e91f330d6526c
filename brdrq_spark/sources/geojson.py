"""GeoJSON FeatureCollection source/sink (reference S1/S8: layers are
loaded from .geojson fixtures — plugin/brdrq/test/test_autocorrectborders.py:
51-54 — and written back as FeatureCollections, brdrq_utils.py:775-838).

Read: spark.read multiLine JSON → explode features[] → flatten
properties.* → geometry coordinates → WKB kernel (Multi-promoted,
normalized — the P1-P4 pipeline). Write: WKB → GeoJSON text rows.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from brdrq_spark.geom import normalize, rings_from_wkb, rings_to_wkb
from brdrq_spark.geom.core import ring_area
from brdrq_spark.geom.wkb import _group_polygons

import numpy as np


def _geojson_geom_to_rings(geom: dict) -> list[np.ndarray]:
    """GeoJSON Polygon/MultiPolygon coordinates → oriented ring set."""
    if geom is None:
        return []
    gtype = geom.get("type", "")
    coords = geom.get("coordinates", [])
    polys = coords if gtype == "MultiPolygon" else [coords] if gtype == "Polygon" else []
    rings: list[np.ndarray] = []
    for poly in polys:
        for ri, ring in enumerate(poly):
            arr = np.asarray(ring, dtype=np.float64)[:, :2]  # drop Z
            if len(arr) > 1 and (arr[0] == arr[-1]).all():
                arr = arr[:-1]
            if len(arr) < 3:
                continue
            a = ring_area(arr)
            want_ccw = ri == 0
            if (a > 0) != want_ccw and a != 0:
                arr = arr[::-1]
            rings.append(arr)
    return normalize(rings)


@F.pandas_udf(T.BinaryType())
def geojson_to_wkb_udf(geom_json: pd.Series) -> pd.Series:
    return geom_json.map(
        lambda s: rings_to_wkb(_geojson_geom_to_rings(json.loads(s))) if s else None
    )


def read_geojson(spark: SparkSession, path: str, id_field: str | None = None) -> DataFrame:
    """FeatureCollection file → DataFrame(feature_id, geom_wkb, props…)."""
    raw = spark.read.option("multiLine", "true").json(path)
    feats = raw.select(F.explode("features").alias("f"))
    out = feats.select(
        F.to_json(F.col("f.geometry")).alias("_geom_json"),
        F.col("f.properties.*"),
    ).withColumn("geom_wkb", geojson_to_wkb_udf(F.col("_geom_json"))).drop("_geom_json")
    if id_field and id_field in out.columns:
        out = out.withColumnRenamed(id_field, "feature_id")
    return out


@F.pandas_udf(T.StringType())
def wkb_to_geojson_udf(wkb: pd.Series) -> pd.Series:
    def conv(b):
        if not b:
            return None
        polys = _group_polygons(rings_from_wkb(b))
        coords = [
            [np.vstack([r, r[:1]]).tolist() for r in poly] for poly in polys
        ]
        return json.dumps({"type": "MultiPolygon", "coordinates": coords})

    return wkb.map(conv)


def write_geojson(df: DataFrame, path: str, geom_col: str = "geom_wkb") -> None:
    """Collect to a single FeatureCollection file (driver-side; for
    result layers, which are small — the distributed sink is Parquet)."""
    rows = df.withColumn("_gj", wkb_to_geojson_udf(F.col(geom_col))).collect()
    feats = []
    for r in rows:
        d = r.asDict()
        gj = d.pop("_gj")
        d.pop(geom_col, None)
        props = {k: (v if not isinstance(v, bytes) else v.hex()) for k, v in d.items()}
        feats.append(
            {"type": "Feature", "geometry": json.loads(gj) if gj else None,
             "properties": props}
        )
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
