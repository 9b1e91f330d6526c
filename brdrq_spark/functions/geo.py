"""Arrow-vectorized geometry UDFs — the only Python that touches Spark
rows (input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)
throughout"). Each UDF processes a whole Arrow batch per call; the inner
geometry kernels are NumPy.

Reference analogues: geometry normalization on every conversion
(plugin/brdrq/brdrq_utils.py:448-479, 1536-1568), buffered-extent
candidate prep (brdrq_utils.py:1569-1590).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from brdrq_spark.geom import (
    bbox,
    normalize,
    rings_area,
    rings_from_wkb,
    rings_from_wkt,
    rings_perimeter,
    rings_to_wkb,
    rings_to_wkt,
)
from brdrq_spark.grid import cell_cover_bbox

GEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("perimeter", T.DoubleType()),
        T.StructField("cells", T.ArrayType(T.LongType())),
    ]
)


def geo_features_udf(res: int, dilate: float = 0.0):
    """pandas UDF: WKB -> (bbox, area, perimeter, sorted cell cover).

    One decode pass computes everything candidate generation needs; the
    cover is the J1 buffered-extent analogue when ``dilate`` > 0
    (reference buffer factor 1.01 x rd, brdrq_utils.py:1569-1590).
    """

    @F.pandas_udf(GEO_FEATURES_SCHEMA)
    def _feat(wkb: pd.Series) -> pd.DataFrame:
        rows = []
        for b in wkb:
            rings = rings_from_wkb(b)
            if not rings:
                rows.append((None, None, None, None, 0.0, 0.0, []))
                continue
            mnx, mny, mxx, mxy = bbox(rings)
            cover = cell_cover_bbox(mnx, mny, mxx, mxy, res, dilate)
            rows.append(
                (
                    mnx,
                    mny,
                    mxx,
                    mxy,
                    rings_area(rings),
                    rings_perimeter(rings),
                    cover.tolist(),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["minx", "miny", "maxx", "maxy", "area", "perimeter", "cells"],
        )

    return _feat


def sym_diff_area_udf():
    """pandas UDF factory: symmetrical-difference area (m²) between two
    WKB polygons per row. (Factory, not module-level decorator — the
    type-string parse needs an active SparkSession, absent on workers.)

    Drives the equality_by_id evaluation (reference label enum
    docs/autocorrectborders.md:209, consumed at brdrq_utils.py:1266-1271):
    the aligned result is compared against the theme's identically-keyed
    reference parcel. One scanbeam table yields both difference
    directions; symdiff area = their sum (disjoint pieces)."""
    from brdrq_spark.geom.clip import boolean_op_multi

    def _sym(a_wkb: pd.Series, b_wkb: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(a_wkb, b_wkb):
            ra = rings_from_wkb(a) if a is not None else []
            rb = rings_from_wkb(b) if b is not None else []
            if not ra and not rb:
                out.append(0.0)
                continue
            if not ra or not rb:
                out.append(rings_area(ra) + rings_area(rb))
                continue
            dplus, dmin = boolean_op_multi(ra, rb, ("difference", "rdifference"))
            out.append(rings_area(dplus) + rings_area(dmin))
        return pd.Series(out, dtype="float64")

    return F.pandas_udf(_sym, "double")


def area_udf():
    """pandas UDF factory: polygon area (m²) from WKB. Map-only,
    Arrow-batched — the light pass behind O5 admission control
    (evaluate.adaptive_grid), where only the area is needed and the
    full geo_features_udf decode (cover cells, perimeter) would be
    wasted work."""

    def _area(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            [rings_area(rings_from_wkb(b)) if b is not None else 0.0 for b in wkb],
            dtype="float64",
        )

    return F.pandas_udf(_area, "double")


@F.pandas_udf(T.StringType())
def geom_type_udf(wkb: pd.Series) -> pd.Series:
    """Geometry-type tag for P5 type filters / mixed-collection splits
    (reference filter_geojson_by_geometry_type, brdrq_utils.py:841-859).
    Point/line WKB (experimental reference support, docs/qa.qmd:13-14)
    is tagged from the type word; polygon WKB by decoded ring structure:
    'MultiPolygon' | 'Polygon' | '(Multi)LineString' | '(Multi)Point'
    | 'Empty'."""

    def tag(b):
        if not b or len(b) < 5:
            return "Empty"
        base = int.from_bytes(b[1:5], "little" if b[0] == 1 else "big") % 1000
        if base in (1, 4):  # Point / MultiPoint
            return "Point" if base == 1 else "MultiPoint"
        if base in (2, 5):  # LineString / MultiLineString
            return "LineString" if base == 2 else "MultiLineString"
        rings = rings_from_wkb(b)
        if not rings:
            return "Empty"
        from brdrq_spark.geom.core import ring_area

        outers = sum(1 for r in rings if ring_area(r) > 0)
        return "MultiPolygon" if outers > 1 else "Polygon"

    return wkb.map(tag)


@F.pandas_udf(T.BinaryType())
def make_valid_udf(wkb: pd.Series) -> pd.Series:
    """fixgeometries + Multi-promotion + dropMZ in one normalization pass
    (reference P1-P4: brdrq_utils.py:1536-1568, 935-961)."""
    return wkb.map(lambda b: rings_to_wkb(normalize(rings_from_wkb(b))) if b else None)


@F.pandas_udf(T.BinaryType())
def wkt_to_wkb_udf(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda s: rings_to_wkb(rings_from_wkt(s)) if s else None)


@F.pandas_udf(T.StringType())
def wkb_to_wkt_udf(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: rings_to_wkt(rings_from_wkb(b)) if b else None)
