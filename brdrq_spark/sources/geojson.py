"""GeoJSON FeatureCollection source/sink (reference S1/S8: layers are
loaded from .geojson fixtures — plugin/brdrq/test/test_autocorrectborders.py:
51-54 — and written back as FeatureCollections, brdrq_utils.py:775-838).

A FeatureCollection is ONE json object — inherently non-splittable — so
parallelism comes from *many files*: `spark.read.text(wholetext)` gives
one row per file, and a mapInPandas kernel parses features into
(feature_id, geom_wkb, props map<string,string>) rows. Geometry goes
through the normalization kernel (P1-P4: make_valid, Multi-promotion,
Z-drop). Spark's own JSON reader is unusable here: Polygon (3-deep) and
MultiPolygon (4-deep) coordinates break its schema inference.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from brdrq_spark.geom import normalize, rings_from_wkb, rings_to_wkb
from brdrq_spark.geom.core import ring_area
from brdrq_spark.geom.wkb import _group_polygons

GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.StringType()),
        T.StructField("geom_wkb", T.BinaryType()),
        T.StructField("props", T.MapType(T.StringType(), T.StringType())),
    ]
)


def geojson_geom_to_wkb(geom: dict | None) -> bytes:
    """Any supported GeoJSON geometry → WKB. Polygons go through ring
    normalization; (Multi)LineString / (Multi)Point (the reference's
    experimental non-polygon support, docs/qa.qmd:13-14) encode directly."""
    if geom is None:
        return rings_to_wkb([])
    gtype = geom.get("type", "")
    coords = geom.get("coordinates", [])
    if gtype in ("Polygon", "MultiPolygon") or not gtype:
        return rings_to_wkb(geojson_geom_to_rings(geom))
    from brdrq_spark.geom.wkb import lines_to_wkb

    if gtype == "Point":
        pts = [np.asarray([coords], dtype=np.float64)[:, :2]]
        return lines_to_wkb(pts)
    if gtype == "MultiPoint":
        pts = [np.asarray([c], dtype=np.float64)[:, :2] for c in coords]
        return lines_to_wkb(pts)
    if gtype == "LineString":
        return lines_to_wkb([np.asarray(coords, dtype=np.float64)[:, :2]])
    if gtype == "MultiLineString":
        return lines_to_wkb(
            [np.asarray(c, dtype=np.float64)[:, :2] for c in coords]
        )
    return rings_to_wkb([])


def geojson_geom_to_rings(geom: dict | None) -> list[np.ndarray]:
    """GeoJSON Polygon/MultiPolygon coordinates → normalized ring set."""
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


def read_geojson(spark: SparkSession, path: str, id_field: str | None = None) -> DataFrame:
    """FeatureCollection file(s) → DataFrame(feature_id, geom_wkb, props)."""
    files = spark.read.text(path, wholetext=True)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for txt in pdf["value"]:
                fc = json.loads(txt)
                feats = fc.get("features", [])
                for i, f in enumerate(feats):
                    props = {
                        str(k): (
                            None
                            if v is None
                            else json.dumps(v)
                            if isinstance(v, (dict, list))
                            else str(v)
                        )
                        for k, v in (f.get("properties") or {}).items()
                    }
                    fid = (
                        props.get(id_field)
                        if id_field
                        else str(f.get("id", i))
                    )
                    rows.append(
                        {
                            "feature_id": fid,
                            "geom_wkb": geojson_geom_to_wkb(f.get("geometry")),
                            "props": props,
                        }
                    )
            yield pd.DataFrame(rows, columns=["feature_id", "geom_wkb", "props"])

    return files.mapInPandas(parse, schema=GEOJSON_SCHEMA)


@F.pandas_udf(T.StringType())
def wkb_to_geojson_udf(wkb: pd.Series) -> pd.Series:
    def conv(b):
        if not b:
            return None
        polys = _group_polygons(rings_from_wkb(b))
        coords = [[np.vstack([r, r[:1]]).tolist() for r in poly] for poly in polys]
        return json.dumps({"type": "MultiPolygon", "coordinates": coords})

    return wkb.map(conv)


def write_geojson(
    df: DataFrame, path: str, geom_col: str = "geom_wkb", max_rows: int = 100_000
) -> None:
    """Collect to a single FeatureCollection file (driver-side; result
    layers are small — the distributed durable sink is Parquet).
    ``max_rows`` guards against pointing this interop sink at a big
    table: a FeatureCollection is one JSON object, inherently
    driver-side — use the Parquet sink for anything larger."""
    # Single execution: collect limit(max_rows+1) once and check the length
    # instead of a count() + collect() pair that runs the upstream plan twice.
    rows = (
        df.withColumn("_gj", wkb_to_geojson_udf(F.col(geom_col)))
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"write_geojson is a small-result interop sink: >{max_rows} rows; "
            f"write Parquet instead"
        )
    feats = []
    for r in rows:
        d = r.asDict(recursive=True)
        gj = d.pop("_gj")
        d.pop(geom_col, None)
        props = {k: (v.hex() if isinstance(v, bytes) else v) for k, v in d.items()}
        feats.append(
            {
                "type": "Feature",
                "geometry": json.loads(gj) if gj else None,
                "properties": props,
            }
        )
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
