"""Temporal-update lineage on the reference's metadata fixture
(plugin/brdrq/test/themelayer_metadata.geojson — 9 MultiPolygons with
embedded SOSA brdr_metadata; the scenario of
plugin/brdrq/test/test_autoupdateborders.py:124-156)."""

from pyspark.sql import functions as F

from brdrq_spark.operators.temporal import changed_themes, lineage_from_metadata
from brdrq_spark.sources.geojson import read_geojson

FIXTURES = "/root/reference/plugin/brdrq/test"


def test_lineage_extraction_from_sosa_metadata(spark):
    themes = read_geojson(
        spark, f"{FIXTURES}/themelayer_metadata.geojson", id_field="dossiernummer"
    ).select(
        F.col("feature_id").alias("theme_id"),
        "geom_wkb",
        F.col("props")["brdr_metadata"].alias("brdr_metadata"),
    )
    assert themes.count() == 9
    lineage = lineage_from_metadata(themes)
    rows = lineage.collect()
    assert len(rows) > 9  # several derived_from parcels per dossier
    assert all(r.ref_id and "/" in r.ref_id for r in rows)  # CAPAKEY shape
    assert all(r.version_date and r.version_date.startswith("20") for r in rows)
    # deterministic
    again = {(r.theme_id, r.ref_id, r.version_date) for r in lineage.collect()}
    assert again == {(r.theme_id, r.ref_id, r.version_date) for r in rows}


def test_changed_detection_against_current_reference(spark):
    themes = read_geojson(
        spark, f"{FIXTURES}/themelayer_metadata.geojson", id_field="dossiernummer"
    ).select(
        F.col("feature_id").alias("theme_id"),
        F.col("props")["brdr_metadata"].alias("brdr_metadata"),
    )
    lineage = lineage_from_metadata(themes)
    ref = read_geojson(
        spark, f"{FIXTURES}/referencelayer_test.geojson", id_field="CAPAKEY"
    ).select(
        F.col("feature_id").alias("ref_id"),
        F.col("props")["VERSDATUM"].alias("VERSDATUM"),
    )
    changed = changed_themes(lineage, ref).collect()
    # the metadata dossiers reference parcels from another municipality
    # (24434 vs the fixture layer's 24126): every recorded parcel is
    # "disappeared from current reference" => all 9 need re-alignment
    assert {r.theme_id for r in changed} == {
        r.theme_id for r in themes.select("theme_id").collect()
    }
