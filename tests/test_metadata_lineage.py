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


def test_update_to_actual_consumes_engine_emitted_lineage(spark):
    """Full loop (VERDICT r1 #5): align with emit_metadata -> parse the
    engine's OWN brdr_metadata -> changed-detection against a bumped
    reference version -> update_to_actual re-aligns exactly the changed
    themes and passes the rest through."""
    import numpy as np
    import pandas as pd

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.operators.align import AlignConfig, align
    from brdrq_spark.operators.temporal import update_to_actual

    def sq(x0):
        return rings_to_wkb(
            [np.array([[x0, 0.0], [x0 + 10.0, 0.0], [x0 + 10.0, 10.0], [x0, 10.0]])]
        )

    n = 8
    ref_v1 = spark.createDataFrame(
        pd.DataFrame(
            [
                {"ref_id": f"r{i}", "geom_wkb": sq(20.0 * i), "VERSDATUM": "2023-06-01"}
                for i in range(n)
            ]
        )
    )
    th = spark.createDataFrame(
        pd.DataFrame(
            [{"theme_id": f"t{i}", "geom_wkb": sq(20.0 * i + 0.2)} for i in range(n)]
        )
    )
    cfg = AlignConfig(relevant_distances=[2.0], emit_metadata=True)
    first = align(spark, th, ref_v1, cfg, broadcast_ref=True)
    lineage = lineage_from_metadata(first)
    got = {(r.theme_id, r.ref_id, r.version_date) for r in lineage.collect()}
    assert got == {(f"t{i}", f"r{i}", "2023-06-01") for i in range(n)}

    # bump two parcels to a newer version
    ref_v2 = ref_v1.withColumn(
        "VERSDATUM",
        F.when(F.col("ref_id").isin("r2", "r5"), "2024-03-01").otherwise(
            F.col("VERSDATUM")
        ),
    )
    out = update_to_actual(spark, th, lineage, ref_v2, AlignConfig([2.0]))
    rows = {r.theme_id: r.brdr_remark for r in out.collect()}
    assert len(rows) == n
    assert {t for t, rem in rows.items() if rem != "unchanged_reference"} == {
        "t2",
        "t5",
    }


def test_submit_align_entrypoint(spark, tmp_path, capsys):
    """The spark-submit job script runs end-to-end (in-process local
    session), commits shards with lineage, and a re-submission with the
    same --out computes ZERO shards (manifest resume)."""
    import json
    import os
    import sys

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import submit_align
    finally:
        sys.path.remove(scripts_dir)

    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    th = tmp_path / "theme"
    rf = tmp_path / "ref"
    out = tmp_path / "aligned"
    spark.createDataFrame(thematic_polygons(8, 8, 8, seed=4)).write.parquet(str(th))
    spark.createDataFrame(reference_parcels(8, 8, seed=4)).write.parquet(str(rf))

    rc = submit_align.main(
        ["--theme", str(th), "--ref", str(rf), "--out", str(out),
         "--rd", "2.0", "--shards", "2", "--broadcast-ref"]
    )
    assert rc == 0
    from brdrq_spark.sources.manifest import CommittedTable

    tab = CommittedTable(str(out))
    assert len(tab.committed_keys()) == 2
    assert tab.read(spark).count() == 8

    # resume: second submission computes NOTHING (assert on the printed
    # summary, not just the exit code — a broken resume_filter would
    # recompute silently otherwise)
    capsys.readouterr()
    rc = submit_align.main(
        ["--theme", str(th), "--ref", str(rf), "--out", str(out),
         "--rd", "2.0", "--shards", "2", "--broadcast-ref"]
    )
    assert rc == 0
    summary = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert summary["computed"] == 0 and summary["skipped_committed"] == 2
    assert len(tab.committed_keys()) == 2


def test_checkpointed_align_concurrent_shards(spark, tmp_path):
    """max_concurrent > 1 commits the same shards with the same lineage
    as the sequential path (manifest publication serialized by lock)."""
    from brdrq_spark.operators.align import AlignConfig
    from brdrq_spark.sources.manifest import CommittedTable, checkpointed_align
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    th = spark.createDataFrame(thematic_polygons(12, 8, 8, seed=6))
    ref = spark.createDataFrame(reference_parcels(8, 8, seed=6))
    cfg = AlignConfig(relevant_distances=[2.0])

    outs = {}
    for mode, conc in (("seq", 1), ("par", 3)):
        tab = CommittedTable(str(tmp_path / mode))
        s = checkpointed_align(
            spark, tab, th, ref, cfg, n_partitions=3, broadcast_ref=True,
            max_concurrent=conc,
        )
        assert s["computed"] == 3
        outs[mode] = {
            (r["partition"], r["row_count"], r["avg_sym_perc"])
            for r in tab.lineage()
        }
        assert tab.read(spark).count() == 12
    assert outs["seq"] == outs["par"]


def _commit_proc(root: str, lo: int, hi: int) -> None:
    from brdrq_spark.sources.manifest import CommittedTable

    tbl = CommittedTable(root)
    for i in range(lo, hi):
        tbl.publish_partition(f"k{i:03d}", i)


def test_manifest_concurrent_committers(tmp_path):
    """Two committers publishing distinct partitions concurrently: every
    key lands and the snapshot stays consistent. The manifest update is
    a read-modify-write, so without the flock guard the later writer
    erases the earlier keys with its stale read (a lockless mutation of
    publish_partition loses ~half the keys under this exact schedule —
    verified, the test bites). Covers both driver THREADS sharing a
    mount and two independent driver PROCESSES resuming the same table
    (reference analogue: per-run workfolder isolation,
    plugin/brdrq/brdrq_utils.py:903-932)."""
    import multiprocessing as mp
    import threading

    from brdrq_spark.sources.manifest import CommittedTable

    # -- threads, each through its OWN table instance (no shared lock
    #    object): only the flock serializes them
    root_t = str(tmp_path / "tbl_threads")
    reader = CommittedTable(root_t)

    def commit_range(lo, hi):
        tbl = CommittedTable(root_t)
        for i in range(lo, hi):
            tbl.publish_partition(f"k{i:03d}", i)

    th = [
        threading.Thread(target=commit_range, args=(0, 50)),
        threading.Thread(target=commit_range, args=(50, 100)),
    ]
    for t in th:
        t.start()
    for t in th:
        t.join()
    assert reader.committed_keys() == {f"k{i:03d}" for i in range(100)}
    lin = reader.lineage()
    assert len(lin) == 100
    assert sorted(r["partition"] for r in lin) == sorted(reader.committed_keys())

    # -- separate processes (two drivers resuming one shared table)
    root_p = str(tmp_path / "tbl_procs")
    reader_p = CommittedTable(root_p)
    ps = [
        mp.Process(target=_commit_proc, args=(root_p, 0, 50)),
        mp.Process(target=_commit_proc, args=(root_p, 50, 100)),
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    assert all(p.exitcode == 0 for p in ps)
    assert reader_p.committed_keys() == {f"k{i:03d}" for i in range(100)}


def test_manifest_reader_isolated_from_writer(tmp_path):
    """Snapshot isolation for READERS: a reader polling the table while
    a writer commits must always see a complete old or complete new
    manifest, never a torn one (reference analogue: per-run workfolder
    isolation, plugin/brdrq/brdrq_utils.py:903-932). The writer
    publishes keys in order, so every consistent snapshot is exactly a
    prefix {k000..k(n-1)} — a torn read surfaces as a JSON decode
    error, a non-prefix key set, or a shrinking set. The writer-writer
    race above covers committers; this covers the read path the flock
    does NOT guard (committed_keys takes no lock by design — the
    os.replace snapshot swap is what keeps readers safe)."""
    import threading

    from brdrq_spark.sources.manifest import CommittedTable

    root = str(tmp_path / "tbl_reader")
    writer = CommittedTable(root)
    reader = CommittedTable(root)
    N = 300
    done = threading.Event()
    failures: list[str] = []

    def read_loop():
        prev: set[str] = set()
        reads = 0
        while not done.is_set() or reads == 0:
            try:
                keys = reader.committed_keys()
            except Exception as e:  # torn JSON would land here
                failures.append(f"unreadable snapshot: {e!r}")
                return
            if not keys >= prev:
                failures.append(f"snapshot shrank: {sorted(prev - keys)}")
                return
            if keys != {f"k{i:03d}" for i in range(len(keys))}:
                failures.append(f"non-prefix snapshot: {sorted(keys)[:5]}…")
                return
            prev = keys
            reads += 1
        if reads < 50:  # the poll loop must actually have raced the writer
            failures.append(f"only {reads} reads — test did not bite")

    t = threading.Thread(target=read_loop)
    t.start()
    for i in range(N):
        writer.publish_partition(f"k{i:03d}", i)
    done.set()
    t.join()
    assert not failures, failures
    assert reader.committed_keys() == {f"k{i:03d}" for i in range(N)}


def test_submit_align_evaluate_mode(spark, tmp_path, capsys):
    """--evaluate runs the resumable sharded prediction sweep from the
    CLI; --auto-step is accepted there (O5 admission control) and
    rejected without --evaluate."""
    import json
    import os
    import sys

    import pytest

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import submit_align
    finally:
        sys.path.remove(scripts_dir)

    from brdrq_spark.sources.manifest import CommittedTable
    from brdrq_spark.sources.synthetic import reference_parcels, thematic_polygons

    th = tmp_path / "theme"
    rf = tmp_path / "ref"
    out = tmp_path / "evaluated"
    spark.createDataFrame(thematic_polygons(6, 8, 8, seed=9)).write.parquet(str(th))
    spark.createDataFrame(reference_parcels(8, 8, seed=9)).write.parquet(str(rf))

    # arg contract: --auto-step without --evaluate is a usage error
    with pytest.raises(SystemExit):
        submit_align.main(
            ["--theme", str(th), "--ref", str(rf), "--out", str(out),
             "--auto-step"]
        )

    rc = submit_align.main(
        ["--theme", str(th), "--ref", str(rf), "--out", str(out),
         "--evaluate", "--auto-step", "--max-rd", "1.0", "--step", "0.5",
         "--shards", "2", "--broadcast-ref", "--concurrent", "1"]
    )
    assert rc == 0
    summary = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert summary["computed"] == 2
    tab = CommittedTable(str(out))
    rows = tab.read(spark)
    assert "brdr_evaluation" in rows.columns
    # STRATEGY_ALL keeps only stable-prediction rows, so not every theme
    # must appear — but the committed rows and the lineage must agree
    n = rows.count()
    assert n >= 1
    lin = tab.lineage()
    assert sum(r["row_count"] for r in lin) == n
    assert all("blocked_by_area" in r for r in lin)
