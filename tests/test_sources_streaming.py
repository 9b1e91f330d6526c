"""GeoJSON source/sink roundtrip and streaming windowed aggregation."""

import json

import numpy as np
import pytest

from brdrq_spark.geom import rings_area, rings_from_wkb, rings_to_wkb
from brdrq_spark.sources.geojson import read_geojson, write_geojson
from brdrq_spark.streaming.events import (
    run_stream_to_memory,
    stream_events_from_parquet,
    windowed_event_counts,
)


def test_geojson_roundtrip(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]],
                },
                "properties": {"theme_identifier": "t1", "status": "open"},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [[[20, 0], [30, 0], [30, 10], [20, 10], [20, 0]],
                         [[24, 4], [24, 6], [26, 6], [26, 4], [24, 4]]]
                    ],
                },
                "properties": {"theme_identifier": "t2", "status": "closed"},
            },
        ],
    }
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson(spark, str(p), id_field="theme_identifier")
    rows = {r.feature_id: r for r in df.collect()}
    assert set(rows) == {"t1", "t2"}
    assert rings_area(rings_from_wkb(rows["t1"].geom_wkb)) == pytest.approx(100.0)
    assert rings_area(rings_from_wkb(rows["t2"].geom_wkb)) == pytest.approx(96.0)
    assert rows["t2"].props["status"] == "closed"

    out = tmp_path / "out.geojson"
    write_geojson(df, str(out))
    back = json.loads(out.read_text())
    assert len(back["features"]) == 2
    geom_types = {f["geometry"]["type"] for f in back["features"]}
    assert geom_types == {"MultiPolygon"}  # Multi-promoted on write


def test_geojson_split_features_matches_single_pass(spark, tmp_path):
    """The parallel feature-split read and the per-file single-pass
    read produce identical rows — including the positional fallback
    feature_id, which must survive the repartition — and the auto mode
    picks single-pass for small/many files, split for one big file."""
    from brdrq_spark.sources.geojson import _auto_split
    feats = [
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[10.0 * i, 0], [10.0 * i + 8, 0], [10.0 * i + 8, 8],
                     [10.0 * i, 8], [10.0 * i, 0]]
                ],
            },
            # NO id/id_field for odd i: falls back to the feature index
            "properties": {"name": f"f{i}"} if i % 2 else {"name": f"f{i}", "id": i},
        }
        for i in range(37)
    ]
    p = tmp_path / "many.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": feats}))

    def canon(df):
        return sorted(
            (r.feature_id, bytes(r.geom_wkb), tuple(sorted(r.props.items())))
            for r in df.collect()
        )

    split = canon(read_geojson(spark, str(p), split_features=True))
    single = canon(read_geojson(spark, str(p), split_features=False))
    assert split == single and len(split) == 37

    # auto mode: small single file -> single-pass; one huge file ->
    # split; remote URI (unresolvable) -> split
    assert _auto_split(str(p)) is False
    big = tmp_path / "big.geojson"
    big.write_bytes(b" " * (65 << 20))
    assert _auto_split(str(big)) is True
    assert _auto_split("s3://bucket/layer.geojson") is True
    assert _auto_split(str(tmp_path / "*.geojson")) is False  # 2 files

    # scheme'd URIs probe through the Hadoop FS API when a session is
    # available: a directory of many small files keeps single-pass, one
    # big file still splits, unreachable filesystems fall back to split
    assert _auto_split(f"file://{tmp_path}", spark) is False  # 2 files
    assert _auto_split(f"file://{big}", spark) is True
    assert _auto_split(f"file://{p}", spark) is False
    assert _auto_split(f"file://{tmp_path}/nope-*.geojson", spark) is True
    assert _auto_split("s3://bucket/layer.geojson", spark) is True


def test_streaming_windowed_counts_matches_batch(spark, tmp_path):
    # static events → batch result
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = windowed_event_counts(ev, window="1 hour")
    batch_rows = {
        (r.win_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert len(batch_rows) > 0

    # same parquet driven through readStream micro-batches
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    ev.write.parquet(str(src_dir / "part1"))
    stream = stream_events_from_parquet(spark, str(src_dir / "part1"), schema=ev.schema)
    agg = windowed_event_counts(stream, window="1 hour")
    q = run_stream_to_memory(agg.select("win_start", "event_type", "n", "sum_value"),
                             "ev_counts")
    try:
        got = spark.sql("SELECT * FROM ev_counts").collect()
        # append-mode only emits windows older than the watermark; whatever
        # was emitted must agree with the batch result
        for r in got:
            assert batch_rows[(r.win_start, r.event_type)] == (r.n, r.sum_value)
    finally:
        q.stop()


def test_geom_type_filter(spark):
    """P5: split/filter by geometry type (reference brdrq_utils.py:841-859)."""
    import pandas as pd
    import numpy as np

    from brdrq_spark.functions import geom_type_udf
    from brdrq_spark.geom import rings_to_wkb
    from pyspark.sql import functions as F

    sq = lambda x, s: np.array([[x, 0.0], [x + s, 0.0], [x + s, s], [x, s]])
    rows = [
        {"fid": 1, "geom_wkb": rings_to_wkb([sq(0, 5)])},                   # Polygon
        {"fid": 2, "geom_wkb": rings_to_wkb([sq(0, 5), sq(20, 5)])},        # MultiPolygon
        {"fid": 3, "geom_wkb": rings_to_wkb([])},                           # Empty
    ]
    df = spark.createDataFrame(pd.DataFrame(rows)).withColumn(
        "geom_type", geom_type_udf(F.col("geom_wkb"))
    )
    got = {r.fid: r.geom_type for r in df.collect()}
    assert got == {1: "Polygon", 2: "MultiPolygon", 3: "Empty"}
    assert df.filter(F.col("geom_type") == "Polygon").count() == 1


def test_geojson_reads_lines_and_points(spark, tmp_path):
    """S1/P5: the reader handles the reference's experimental
    (Multi)LineString/(Multi)Point features (docs/qa.qmd:13-14), and
    geom_type_udf tags every type."""
    import json as _json

    from pyspark.sql import functions as F

    from brdrq_spark.functions import geom_type_udf
    from brdrq_spark.sources.geojson import read_geojson

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"nm": "pt"},
             "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}},
            {"type": "Feature", "properties": {"nm": "mpt"},
             "geometry": {"type": "MultiPoint",
                          "coordinates": [[1.0, 2.0], [3.0, 4.0]]}},
            {"type": "Feature", "properties": {"nm": "ln"},
             "geometry": {"type": "LineString",
                          "coordinates": [[0.0, 0.0], [5.0, 5.0]]}},
            {"type": "Feature", "properties": {"nm": "mln"},
             "geometry": {"type": "MultiLineString",
                          "coordinates": [[[0.0, 0.0], [5.0, 5.0]],
                                           [[6.0, 6.0], [9.0, 9.0]]]}},
            {"type": "Feature", "properties": {"nm": "pg"},
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0.0, 0.0], [4.0, 0.0],
                                            [4.0, 4.0], [0.0, 4.0],
                                            [0.0, 0.0]]]}},
        ],
    }
    p = tmp_path / "mixed.geojson"
    p.write_text(_json.dumps(fc))
    df = read_geojson(spark, str(p), id_field="nm").withColumn(
        "gt", geom_type_udf(F.col("geom_wkb"))
    )
    tags = {r.feature_id: r.gt for r in df.collect()}
    # the reader Multi-promotes (P2 normalization, like the polygon path)
    assert tags == {
        "pt": "MultiPoint",
        "mpt": "MultiPoint",
        "ln": "MultiLineString",
        "mln": "MultiLineString",
        "pg": "Polygon",
    }
    # the line features round-trip into the snap-align kernel's decoder
    from brdrq_spark.geom.wkb import lines_from_wkb

    wkbs = {r.feature_id: bytes(r.geom_wkb) for r in df.collect()}
    assert len(lines_from_wkb(wkbs["mln"])) == 2
    assert lines_from_wkb(wkbs["ln"])[0].shape == (2, 2)


def test_stateful_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState session windows == the batch
    gaps-and-islands sessionization, once the watermark flushes all
    state (sentinel event far in the future)."""
    import pandas as pd

    from brdrq_spark.streaming.events import run_stream_to_memory
    from brdrq_spark.streaming.sessions import sessionize_stream

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    # user 1: two sessions (gap 700s > 600s); user 2: one session
    for u, offsets in [
        (1, [0, 100, 200, 900 + 200, 900 + 300]),
        (2, [50, 650, 1250]),  # 600s gaps exactly == gap -> one session
    ]:
        for o in offsets:
            rows.append({"ts": base + pd.Timedelta(seconds=o), "user_id": u})
    pdf = pd.DataFrame(rows).sort_values("ts")
    d = tmp_path / "ev"
    d.mkdir()
    # time-ordered micro-batch files; sentinel advances the watermark far
    # enough to flush every open session via event-time timeout
    third = len(pdf) // 3 + 1
    for i in range(3):
        part = pdf.iloc[i * third : (i + 1) * third]
        if len(part):
            part.to_parquet(d / f"part{i}.parquet", index=False, coerce_timestamps="us")
    pd.DataFrame(
        [{"ts": base + pd.Timedelta(days=2), "user_id": 999}]
    ).to_parquet(d / "part9.parquet", index=False, coerce_timestamps="us")

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = sessionize_stream(stream, gap_seconds=600, watermark="0 seconds")
    q = run_stream_to_memory(out, "sessions_out")
    got = {
        (r.user_id, r.n_events)
        for r in spark.table("sessions_out").collect()
        if r.user_id != 999
    }
    q.stop()
    assert got == {(1, 3), (1, 2), (2, 3)}


def test_stateful_streaming_checkpoint_restart(spark, tmp_path):
    """North-rule resumability at the STREAMING layer: the sessionize
    query stops mid-stream and restarts from its checkpoint; a session
    whose events straddle the restart boundary still emerges as ONE
    session (open-session state recovered from the state store), and
    no closed session duplicates."""
    import pandas as pd

    from brdrq_spark.streaming.sessions import sessionize_stream

    base = pd.Timestamp("2026-01-01 00:00:00")
    src = tmp_path / "ev"
    sink = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_batch(name, rows):
        pd.DataFrame(rows).to_parquet(
            src / f"{name}.parquet", index=False, coerce_timestamps="us"
        )

    def ev(u, sec):
        return {"ts": base + pd.Timedelta(seconds=sec), "user_id": u}

    # first run: user 1 session is OPEN at shutdown (events 0..200)
    write_batch("a", [ev(1, 0), ev(1, 100), ev(1, 200), ev(2, 50)])
    schema = spark.read.parquet(str(src)).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = sessionize_stream(stream, gap_seconds=600, watermark="0 seconds")
        return (
            out.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    # second run: the straddling event (300) extends the recovered open
    # session; 1000 starts a new one; user 2's 400 extends its recovered
    # session (events behind the recovered watermark would be dropped as
    # late — by design); the sentinel flushes everything
    write_batch("b", [ev(1, 300), ev(1, 1000), ev(2, 400)])
    write_batch("z", [{"ts": base + pd.Timedelta(days=2), "user_id": 999}])
    q = start()
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.user_id, r.n_events)
        for r in spark.read.parquet(str(sink)).collect()
        if r.user_id != 999
    )
    # user 1: ONE 4-event session across the restart + a 1-event session;
    # user 2: one 2-event session — no duplicates, no split sessions
    assert got == [(1, 1), (1, 4), (2, 2)]


def test_write_geojson_guard_single_execution(spark, tmp_path):
    """The interop sink's row guard triggers without a separate count()
    pass (limit+collect once)."""
    import numpy as np
    import pandas as pd
    import pytest

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.sources.geojson import write_geojson

    sq = rings_to_wkb([np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])])
    df = spark.createDataFrame(
        pd.DataFrame([{"theme_id": f"t{i}", "geom_wkb": sq} for i in range(5)])
    )
    with pytest.raises(ValueError, match="interop sink"):
        write_geojson(df, str(tmp_path / "x.geojson"), max_rows=3)
    write_geojson(df, str(tmp_path / "ok.geojson"), max_rows=5)
    assert (tmp_path / "ok.geojson").exists()


def test_geom_type_udf_big_endian(spark):
    """P5 type tags honor the WKB byte-order flag: a big-endian Point
    tags 'Point', not 'Empty'."""
    import struct

    import pandas as pd
    from pyspark.sql import functions as F

    from brdrq_spark.functions.geo import geom_type_udf

    be_point = struct.pack(">BIdd", 0, 1, 1.5, 2.5)   # big-endian flag 0
    le_point = struct.pack("<BIdd", 1, 1, 1.5, 2.5)
    df = spark.createDataFrame(
        pd.DataFrame(
            [{"id": "be", "geom_wkb": be_point}, {"id": "le", "geom_wkb": le_point}]
        )
    )
    got = {
        r.id: r.t
        for r in df.select("id", geom_type_udf(F.col("geom_wkb")).alias("t")).collect()
    }
    assert got == {"be": "Point", "le": "Point"}


def test_bbox_transform_registry():
    import pytest

    from brdrq_spark.functions.crs import register_bbox_transform, transform_bbox

    b = (0.0, 0.0, 10.0, 20.0)
    assert transform_bbox(b, "EPSG:31370", "EPSG:31370") == b
    with pytest.raises(ValueError, match="no bbox transform"):
        transform_bbox(b, "EPSG:31370", "EPSG:3812")
    from brdrq_spark.functions import crs as _crs

    register_bbox_transform(
        "EPSG:31370", "EPSG:3812",
        lambda a, c, d, e: (a + 1.0, c + 1.0, d + 1.0, e + 1.0),
    )
    try:
        assert transform_bbox(b, "EPSG:31370", "EPSG:3812") == (
            1.0, 1.0, 11.0, 21.0,
        )
    finally:
        _crs._BBOX_TRANSFORMS.pop(("EPSG:31370", "EPSG:3812"), None)


def test_write_geojson_parts_roundtrip_large(spark, tmp_path):
    """The sharded GeoJSON sink handles a table ABOVE the single-file
    cap (>100k rows): one FeatureCollection per partition + _index.json,
    and read_geojson over the directory returns every feature."""
    import numpy as np
    from pyspark.sql import functions as F

    from brdrq_spark.geom import rings_from_wkb, rings_to_wkb
    from brdrq_spark.sources.geojson import read_geojson, write_geojson_parts

    n = 120_000
    sq = rings_to_wkb([np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])])
    df = (
        spark.range(n)
        .selectExpr(
            "cast(id as string) AS fid",
            "id % 7 AS grp",
            # exercise the JSON-safe property conversion: timestamps,
            # arrays, and NaN doubles all previously crashed json.dumps
            "timestamp'2024-03-01 12:00:00' + make_interval(0,0,0,0,0,0,id%9) AS ts",
            "array(cast(id AS double), 0.5) AS arr",
            "CASE WHEN id % 11 = 0 THEN cast('NaN' AS double) ELSE id * 1.5 END AS score",
        )
        .withColumn("geom_wkb", F.lit(sq))
        .repartition(16)
    )
    out = str(tmp_path / "layer_parts")
    index = write_geojson_parts(spark, df, out)
    assert index["total_features"] == n
    assert index["n_parts"] >= 2
    assert sum(p["n_features"] for p in index["parts"]) == n
    # deterministic part ids (partition ordinals, stable on recompute)
    ids = [p["part_id"] for p in index["parts"]]
    assert all(i.startswith("part-") and len(i) == 10 for i in ids)
    assert len(set(ids)) == len(ids)

    back = read_geojson(spark, out, id_field="fid")
    assert back.count() == n
    for r in back.limit(3).collect():
        assert rings_from_wkb(r.geom_wkb)[0].shape == (4, 2)
        assert r.props["grp"] in {str(i) for i in range(7)}
        assert r.feature_id == r.props["fid"]
        assert r.props["ts"].startswith("2024-03-01T12:00:")
        assert json.loads(r.props["arr"])[1] == 0.5
        # NaN scores came through as JSON null, not a bare NaN token
        assert r.props["score"] is None or float(r.props["score"]) >= 0.0
    # every feature id survives exactly once
    assert back.select("feature_id").distinct().count() == n


def test_geojson_part_header_format_pinned():
    """The sharded sink's part header is an on-disk format: the writer
    (_part_header) and the index derivation's prefix parser
    (_PART_HEADER_RE) must agree byte-for-byte, a full written line must
    parse from its first 256 bytes, and garbage must raise — not yield
    empty ids / null counts (ADVICE r6)."""
    from brdrq_spark.sources.geojson import (
        _HEADER_READ,
        _parse_part_header,
        _part_header,
    )

    hdr = _part_header("part-00042", 123_456)
    assert len(hdr) < _HEADER_READ  # prefix read always covers the header
    assert _parse_part_header(hdr) == ("part-00042", 123456)
    # exactly as written: header spliced ahead of the feature payload
    line = hdr[:-1] + ', "features": ' + json.dumps([{"type": "Feature"}]) + "}"
    assert _parse_part_header(line[:_HEADER_READ]) == ("part-00042", 123456)
    assert json.loads(line)["n_features"] == 123456  # still strict JSON
    with pytest.raises(ValueError, match="part header"):
        _parse_part_header('{"type": "FeatureCollection", "features": []}')


def test_write_geojson_single_file_json_safe(spark, tmp_path):
    """The single-file writer shares _json_safe with the sharded one:
    timestamp / NaN / array columns export as valid strict JSON instead
    of crashing json.dump or emitting bare NaN tokens."""
    from pyspark.sql import functions as F

    from brdrq_spark.geom import rings_to_wkb
    from brdrq_spark.sources.geojson import write_geojson

    sq = rings_to_wkb([np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])])
    df = spark.range(4).selectExpr(
        "cast(id as string) AS fid",
        "timestamp'2024-03-01 12:00:00' AS ts",
        "CASE WHEN id = 0 THEN cast('NaN' AS double) ELSE cast(id * 1.5 AS double) END AS score",
        "array(double(1.0), double(2.0)) AS arr",
        "cast(3.14 AS decimal(4,2)) AS dec",  # Decimal stringifies
    ).withColumn("geom_wkb", F.lit(sq))
    out = tmp_path / "single.geojson"
    write_geojson(df, str(out))
    back = json.loads(out.read_text())  # strict parse: no NaN tokens
    assert len(back["features"]) == 4
    props = {f["properties"]["fid"]: f["properties"] for f in back["features"]}
    assert props["0"]["score"] is None
    assert props["1"]["score"] == 1.5
    assert props["2"]["ts"].startswith("2024-03-01T12:00:00")
    assert props["3"]["arr"] == [1.0, 2.0]
    assert props["3"]["dec"] == "3.14"
