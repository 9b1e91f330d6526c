"""Tests for the PNG codec, footprint extraction and synthetic tables."""

import numpy as np
import pytest

from brdrq_spark.geom import min_distance, rings_area, rings_from_wkb
from brdrq_spark.raster.footprint import extract_footprint, mask_to_rings, place_rings
from brdrq_spark.raster.png import (
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    psnr,
)
from brdrq_spark.sources.synthetic import (
    images_table,
    reference_parcels,
    reference_parcels_v2,
    thematic_polygons,
)


def test_png_roundtrip_exact():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_lossy_quantize_psnr():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    data = encode_image(img, "png", quantize=4)
    back = decode_image(data, 48, 48, "png")
    assert not np.array_equal(back, img)
    assert psnr(img, back) >= 40.0
    # raw roundtrip exact
    assert np.array_equal(decode_image(encode_image(img, "raw"), 48, 48, "raw"), img)


def test_mask_to_rings_counts_pixels():
    mask = np.zeros((8, 8), dtype=bool)
    mask[2:6, 3:7] = True       # 4x4 block
    mask[4, 4] = False          # poke a hole... interior single pixel
    rings = mask_to_rings(mask)
    assert rings_area(rings) == pytest.approx(15.0, abs=1e-9)
    # L-shape: two overlapping blocks merge into one outline
    mask2 = np.zeros((8, 8), dtype=bool)
    mask2[1:4, 1:3] = True
    mask2[3:6, 1:6] = True
    rings2 = mask_to_rings(mask2)
    assert rings_area(rings2) == pytest.approx(6 + 15 - 2, abs=1e-9)  # 2px overlap


def test_footprint_extraction_deterministic_and_placed():
    pdf = images_table(6, seed=9)
    r = pdf.iloc[0]
    fp1 = extract_footprint(r["bytes"], int(r.w), int(r.h), r.fmt, int(r.phash))
    fp2 = extract_footprint(r["bytes"], int(r.w), int(r.h), r.fmt, int(r.phash))
    assert len(fp1) > 0
    assert rings_area(fp1) == pytest.approx(rings_area(fp2))
    # placed inside the parcel domain
    for ring in fp1:
        assert ring[:, 0].min() >= 170000.0 and ring[:, 0].max() <= 174200.0
        assert ring[:, 1].min() >= 170000.0 and ring[:, 1].max() <= 174200.0


def test_reference_parcels_tile_exactly():
    pdf = reference_parcels(6, 6, seed=5)
    assert len(pdf) == 36
    total = sum(rings_area(rings_from_wkb(w)) for w in pdf.geom_wkb)
    # tessellation covers the bbox exactly: (6*64)^2
    assert total == pytest.approx((6 * 64.0) ** 2, rel=1e-9)
    # adjacent parcels share edges: distance 0
    g0 = rings_from_wkb(pdf.geom_wkb.iloc[0])
    g1 = rings_from_wkb(pdf.geom_wkb.iloc[1])
    assert min_distance(g0, g1) == 0.0
    assert pdf.ref_id.is_unique


def test_reference_v2_changes_subset():
    a = reference_parcels(10, 10, seed=7)
    b = reference_parcels_v2(10, 10, seed=7, change_frac=0.05)
    changed = (b.VERSIE == 2).sum()
    assert 0 < changed < len(b)
    same = b[b.VERSIE == 1].reset_index(drop=True)
    orig = a[b.VERSIE.values == 1].reset_index(drop=True)
    assert (same.geom_wkb == orig.geom_wkb).all()


def test_thematic_jitter_close_to_parcel():
    ref = reference_parcels(8, 8, seed=11)
    th = thematic_polygons(5, 8, 8, seed=11, jitter=1.0)
    assert len(th) == 5
    for _, row in th.iterrows():
        pid = row.src_parcel
        src = ref[ref.ref_id.str.endswith(pid)].geom_wkb.iloc[0]
        g_t = rings_from_wkb(row.geom_wkb)
        g_r = rings_from_wkb(src)
        assert min_distance(g_t, g_r) == 0.0  # heavily overlapping


def test_images_table_schema():
    pdf = images_table(10, seed=3)
    assert list(pdf.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert pdf.image_id.is_unique
    assert set(pdf.fmt) <= {"png", "raw"}
    r = pdf.iloc[1]
    img = decode_image(r["bytes"], int(r.w), int(r.h), r.fmt)
    assert img.shape == (int(r.h), int(r.w))
    # determinism
    pdf2 = images_table(10, seed=3)
    assert (pdf.phash == pdf2.phash).all()
    assert all(a == b for a, b in zip(pdf.bytes, pdf2.bytes))
