"""CRS guards and the margin-expanded bbox aggregate.

The engine computes in ONE projected meter CRS (the reference pins the
calculation CRS to the thematic layer and demands meter units —
brdrq_algorithm_autocorrectborders.py:194). These guards mirror the
reference's hard errors (brdrq_utils.py:1551-1555 undefined CRS;
:1498-1502 thematic/reference mismatch) so a mis-CRS'd job fails loudly
at plan time instead of producing silently-wrong meter math; the bbox
helper mirrors zoom_to_features' +10% margin (brdrq_utils.py:505-551).

Re-projection itself is a pluggable hook: register a transform per
(src, dst) pair. Cadastral pipelines run in one national meter grid, so
the built-in registry only carries identity transforms; arbitrary
geodetic reprojection needs a proj library and belongs to the loader
boundary, not the engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# meter-unit projected systems the reference names (error text
# brdrq_utils.py:1500-1501: "... with units in meter (f.e. For Belgium
# in EPSG:31370 or EPSG:3812)")
METER_CRS_HINT = "EPSG:31370 or EPSG:3812"


def require_defined_crs(crs: str | None, layer: str = "Thematic") -> str:
    """Reference brdrq_utils.py:1551-1555: undefined CRS is a hard error."""
    if crs is None or str(crs).strip() in ("", "NULL", "None"):
        raise ValueError(
            f"{layer} layer does not have a defined CRS attached to it. "
            f"Please define a CRS to the {layer} layer, with units in "
            f"meter (f.e. For Belgium in {METER_CRS_HINT})"
        )
    return str(crs)


def require_same_crs(thematic_crs: str | None, reference_crs: str | None) -> str:
    """Reference brdrq_utils.py:1498-1502: thematic and reference layers
    must share one meter CRS; returns the common authid."""
    t = require_defined_crs(thematic_crs, "Thematic")
    r = require_defined_crs(reference_crs, "Reference")
    if t != r:
        raise ValueError(
            "Thematic layer and ReferenceLayer are in a different CRS. "
            "Please provide them in the same CRS, with units in meter "
            f"(f.e. For Belgium in {METER_CRS_HINT})"
        )
    return t


# (src, dst) -> callable(minx, miny, maxx, maxy) -> same tuple transformed
_BBOX_TRANSFORMS: dict[tuple[str, str], Callable] = {}


def register_bbox_transform(src: str, dst: str, fn: Callable) -> None:
    """Plug a bbox transform for a (src, dst) CRS pair (loader-boundary
    hook; the engine itself stays single-CRS)."""
    _BBOX_TRANSFORMS[(src, dst)] = fn


def transform_bbox(b: tuple, src: str, dst: str) -> tuple:
    if src == dst:
        return b
    fn = _BBOX_TRANSFORMS.get((src, dst))
    if fn is None:
        raise ValueError(
            f"no bbox transform registered for {src} -> {dst}; provide "
            "inputs in one meter CRS or register_bbox_transform()"
        )
    return fn(*b)


def bbox_with_margin(
    df: DataFrame,
    geom_features=("minx", "miny", "maxx", "maxy"),
    margin: float = 0.1,
    src_crs: str | None = None,
    dst_crs: str | None = None,
) -> tuple:
    """G5 combined-bbox aggregate with the reference's +margin*extent
    expansion (zoom_to_features, brdrq_utils.py:505-551): one min/max
    aggregate over pre-computed bbox columns, margin applied to the
    combined extent, optional CRS transform of the final 4-tuple (a
    driver-side scalar op — never a per-row transform)."""
    mnx, mny, mxx, mxy = geom_features
    row = df.agg(
        F.min(mnx).alias("a"),
        F.min(mny).alias("b"),
        F.max(mxx).alias("c"),
        F.max(mxy).alias("d"),
    ).collect()[0]
    if row.a is None:
        raise ValueError(
            "bbox_with_margin: empty layer — no features to combine"
        )
    w = row.c - row.a
    h = row.d - row.b
    out = (
        row.a - w * margin,
        row.b - h * margin,
        row.c + w * margin,
        row.d + h * margin,
    )
    if src_crs is not None and dst_crs is not None:
        out = transform_bbox(out, src_crs, dst_crs)
    return out
