"""NetworkGeometryProcessor analogue (reference A2: processor selection
``get_processor_by_id``, plugin/brdrq/brdrq_utils.py:212-230, enum
:102-111; exercised on the multi-feature dossier at rd=10,
plugin/brdrq/test/test_autocorrectborders.py:420-463).

The reference delegates to brdr's NetworkGeometryProcessor, which aligns
polygon boundaries as a shared edge network so adjacent features keep
their common border after alignment (no slivers/gaps between dossier
pieces). Spark-first re-expression: instead of materializing an explicit
edge network (a global structure that would serialize the job), every
boundary vertex snaps through the SAME deterministic pure function —
nearest point on any reference boundary within ``relevant_distance``
after densification. Consistency argument (why no network object is
needed):

* a reference boundary within rd of a vertex v is within rd of every
  feature containing v, so the 2*rd-dilated cell join delivers it to
  ALL of them — the argmin is computed over the same effective
  candidate set on every side;
* densification inserts vertices at identical positions on an edge
  shared by two features (same endpoints, same spacing rule);
* therefore f(v) is identical across features and shared edges move
  rigidly together — topology preserved by construction, embarrassingly
  parallel, no cross-feature shuffle.

Execution shape mirrors align(): fused cell join carrying WKBs →
partition-streaming pandas kernel with vectorized point-segment math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from brdrq_spark.geom import boolean_op, rings_area, rings_from_wkb, rings_to_wkb
from brdrq_spark.geom.wkb import rings_from_wkb_hybrid
from brdrq_spark.geom.core import _edges
from brdrq_spark.operators.align import AlignConfig, align_candidate_rows
from brdrq_spark.operators.snaplines import SNAP_NO_PREFERENCE, _snap_vertices

# Processor ids mirror the reference enum (brdrq_utils.py:102-111;
# topology is registered at :229). Dieussaert is commented out of the
# UI's ENUM_PROCESSOR_OPTIONS (:106) but the dispatch still routes it
# (brdrq_utils.py:223), so the id is accepted here for dispatch parity;
# its math lives in the closed brdr package and is unobservable from
# the reference, so the documented stand-in is the default aligner
# kernel with a remark flagging the substitution.
PROCESSOR_ALIGNER = "2024:aligner2024a"
PROCESSOR_SNAP = "2024:snap2024a"
PROCESSOR_NETWORK = "2024:network2024a"
PROCESSOR_TOPOLOGY = "2024:topology2024a"
PROCESSOR_DIEUSSAERT = "2024:dieussaert2024a"


def align_with_processor(
    spark: SparkSession,
    theme_df: DataFrame,
    ref_df: DataFrame,
    processor_id: str = PROCESSOR_ALIGNER,
    relevant_distance: float = 2.0,
    snap_strategy: str = SNAP_NO_PREFERENCE,
    broadcast_ref: bool | None = None,
):
    """``get_processor_by_id`` analogue (brdrq_utils.py:212-230): route a
    job to the area-based aligner kernel or the vertex-snap kernels.
    Unknown ids fall back to the default AlignerGeometryProcessor, as the
    reference does (brdrq_utils.py:217-220). SnapGeometryProcessor and
    NetworkGeometryProcessor share the snap kernel — the network variant
    IS the snap applied with the shared-boundary-consistent pure
    function (module docstring); the reference exposes them as separate
    strategies of the same brdr snapping machinery."""
    if processor_id == PROCESSOR_TOPOLOGY:
        from brdrq_spark.operators.topology import align_topology

        return align_topology(
            spark,
            theme_df,
            ref_df,
            relevant_distance=relevant_distance,
            broadcast_ref=broadcast_ref,
        )
    if processor_id in (PROCESSOR_SNAP, PROCESSOR_NETWORK):
        return align_network(
            spark,
            theme_df,
            ref_df,
            relevant_distance=relevant_distance,
            snap_strategy=snap_strategy,
            broadcast_ref=broadcast_ref,
        )
    from brdrq_spark.operators.align import align as _align

    out = _align(
        spark,
        theme_df,
        ref_df,
        AlignConfig(relevant_distances=[relevant_distance]),
        broadcast_ref=broadcast_ref,
    )
    if processor_id == PROCESSOR_DIEUSSAERT:
        # routed like the reference dispatch (brdrq_utils.py:223) but the
        # DieussaertGeometryProcessor's algorithm is brdr-internal —
        # run the default kernel and flag the substitution per row
        out = out.withColumn(
            "brdr_remark",
            F.concat_ws(
                "; ",
                F.lit("dieussaert->aligner stand-in"),
                F.when(F.col("brdr_remark") != "", F.col("brdr_remark")),
            ),
        )
    return out


NETWORK_SCHEMA = T.StructType(
    [
        T.StructField("theme_id", T.StringType()),
        T.StructField("brdr_relevant_distance", T.DoubleType()),
        T.StructField("result_wkb", T.BinaryType()),
        T.StructField("brdr_area", T.DoubleType()),
        T.StructField("n_vertices", T.IntegerType()),
        T.StructField("n_snapped", T.IntegerType()),
        T.StructField("max_move", T.DoubleType()),
        T.StructField("brdr_nr_references", T.IntegerType()),
        T.StructField("brdr_remark", T.StringType()),
    ]
)


def _densify_with_mask(closed: np.ndarray, max_seg: float):
    """densify() plus a bool mask marking the ORIGINAL vertices (the
    polygon's corners/"angles") among the densified output."""
    if len(closed) < 2 or max_seg <= 0:
        return closed, np.ones(len(closed), dtype=bool)
    pts = [closed[:1]]
    orig = [np.array([True])]
    for i in range(len(closed) - 1):
        p, q = closed[i], closed[i + 1]
        d = float(np.hypot(*(q - p)))
        n_extra = int(np.ceil(d / max_seg)) if d > max_seg else 1
        ts = np.linspace(0.0, 1.0, n_extra + 1)[1:]
        seg = p[None, :] + ts[:, None] * (q - p)[None, :]
        pts.append(seg)
        m = np.zeros(len(seg), dtype=bool)
        m[-1] = True  # the segment's endpoint is an original vertex
        orig.append(m)
    return np.vstack(pts), np.concatenate(orig)


def snap_polygon_rings(
    rings: list[np.ndarray],
    ref_ring_sets: list[list[np.ndarray]],
    rd: float,
    max_seg: float = 2.0,
    strategy: str = SNAP_NO_PREFERENCE,
):
    """Densify + vertex-snap every ring; returns (snapped rings,
    n_vertices, n_snapped, max_move). The pure-function property that
    preserves shared boundaries lives here: output depends only on the
    vertex position and the reference set within rd.

    Corners (original vertices) snap PREFER_VERTICES-style — to the
    nearest reference *vertex* within rd when one exists — while
    densified in-fill points snap to the nearest boundary point
    (reference SnapStrategy PREFER_ENDS_AND_ANGLES,
    brdrq_settings.py:294-304): a plain nearest-point snap would fold
    corners onto the closest edge and zigzag the border."""
    all_ref = [r for refs in ref_ring_sets for r in refs]
    edges = _edges(all_ref) if all_ref else np.zeros((0, 4))
    ref_verts = np.vstack(all_ref) if all_ref else np.zeros((0, 2))
    out, n_v, n_s, max_move = [], 0, 0, 0.0
    for ring in rings:
        closed = np.vstack([ring, ring[:1]])
        dense, orig_mask = _densify_with_mask(closed, max_seg)
        dense, orig_mask = dense[:-1], orig_mask[:-1]
        snapped, moved = _snap_vertices(dense, edges, ref_verts, rd, strategy)
        if orig_mask.any() and len(ref_verts):
            corners, cmoved = _snap_vertices(
                dense[orig_mask], edges, ref_verts, rd, "PREFER_VERTICES"
            )
            snapped[orig_mask] = corners
            moved[orig_mask] = cmoved
        n_v += len(dense)
        n_s += int(moved.sum())
        if moved.any():
            max_move = max(
                max_move,
                float(np.hypot(*(snapped[moved] - dense[moved]).T).max()),
            )
        out.append(snapped)
    # snapping can fold edges; one union pass renormalizes (snap-rounded,
    # deterministic — identical coordinates on both sides of a shared
    # edge stay identical)
    return boolean_op(out, [], "union"), n_v, n_s, max_move


def align_network(
    spark: SparkSession,
    theme_df: DataFrame,
    ref_df: DataFrame,
    relevant_distance: float = 10.0,
    snap_max_segment_length: float = 2.0,
    snap_strategy: str = SNAP_NO_PREFERENCE,
    broadcast_ref: bool | None = None,
) -> DataFrame:
    """Network-consistent polygon alignment: one row per theme with the
    snapped geometry; adjacent input features sharing an edge still
    share it in the output."""
    rd = relevant_distance
    cfg = AlignConfig(relevant_distances=[rd])
    grouped, _res = align_candidate_rows(
        spark, theme_df, ref_df, cfg, broadcast_ref=broadcast_ref
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        theme_id = pdf["theme_id"].iloc[0]
        _tw = pdf["theme_wkb"].dropna()
        rings = rings_from_wkb(_tw.iloc[0]) if len(_tw) else []
        ref_wkbs = list(
            dict.fromkeys(bytes(b) for b in pdf["ref_wkb"] if b is not None)
        )
        ref_sets = [s for s in rings_from_wkb_hybrid(ref_wkbs) if s]
        snapped, n_v, n_s, mv = snap_polygon_rings(
            rings, ref_sets, rd, snap_max_segment_length, snap_strategy
        )
        return pd.DataFrame(
            [
                {
                    "theme_id": theme_id,
                    "brdr_relevant_distance": float(rd),
                    "result_wkb": rings_to_wkb(snapped),
                    "brdr_area": rings_area(snapped),
                    "n_vertices": n_v,
                    "n_snapped": n_s,
                    "max_move": mv,
                    "brdr_nr_references": len(ref_sets),
                    "brdr_remark": "" if ref_sets else "no_reference_candidates",
                }
            ]
        )

    def stream(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                buf = None
                continue
            last = pdf["theme_id"].iloc[-1]
            done = pdf[pdf["theme_id"] != last]
            buf = pdf[pdf["theme_id"] == last]
            for _, g in done.groupby("theme_id", sort=False):
                yield kernel(g)
        if buf is not None and len(buf):
            yield kernel(buf)

    par = spark.sparkContext.defaultParallelism
    parts = grouped.repartition(par * 4, "theme_id").sortWithinPartitions("theme_id")
    return parts.mapInPandas(stream, schema=NETWORK_SCHEMA)
