"""brdrq_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of the brdrQ QGIS plugin (reference:
OnroerendErfgoed/brdrQ, read-only snapshot at /root/reference) as
distributed DataFrame operators:

* thematic footprint polygons — derived per image from an Iceberg-style
  image+caption table — are aligned to reference border layers with
  brdr's relevant-distance logic (reference
  plugin/brdrq/brdrq_algorithm_autocorrectborders.py),
* candidate generation is a Morton (Z-order) cell cover + equi-join
  (the H3/S2 equivalent, built from scratch),
* the pairwise alignment kernel runs inside Arrow-vectorized
  pandas UDFs — no per-row Python at the Spark row level.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and classic
computational-geometry literature (Vatti/scanbeam clipping,
Sutherland–Hodgman, shoelace, Z-order curves).
"""

__version__ = "0.1.0"
