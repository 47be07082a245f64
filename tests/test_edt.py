"""Device EDT (ops/edt.py) + cohort QA metrics (compare_masks_batch).

Parity contract: the min-plus separable EDT must match
scipy.ndimage.distance_transform_edt to float32 tolerance, and the
device surface panel must match the host KD-tree panel in
utils/metrics.py (both measure voxel-center point-set NN distances).
"""

import numpy as np
import pytest
from scipy import ndimage

from medicalimageanalysis_tpu.ops import edt as E
from medicalimageanalysis_tpu.utils import metrics as M


def _blobs(rng, shape, p=0.99, iters=3):
    m = ndimage.binary_dilation(rng.random(shape) > p, iterations=iters)
    if not m.any():
        m[tuple(s // 2 for s in shape)] = True
    return m


@pytest.mark.parametrize("shape,spacing", [
    ((24, 28, 20), (0.8, 1.2, 2.5)),
    ((16, 16, 16), (1.0, 1.0, 1.0)),
    ((9, 33, 7), (2.0, 0.5, 1.3)),
])
def test_edt_matches_scipy(rng, shape, spacing):
    m = _blobs(rng, shape)
    sx, sy, sz = spacing
    # scipy: distance from nonzero to nearest zero; ours: distance TO
    # the feature set -> complement the mask
    ref = ndimage.distance_transform_edt(~m, sampling=(sz, sy, sx))
    got = np.asarray(E.edt(m, spacing))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # scipy calling convention wrapper
    got2 = np.asarray(E.distance_transform(~m, spacing))
    np.testing.assert_allclose(got2, ref, atol=1e-4)


def test_edt_edge_cases():
    full = np.ones((6, 7, 8), bool)
    assert float(np.max(np.asarray(E.edt(full, (1, 1, 1))))) == 0.0
    empty = np.zeros((6, 7, 8), bool)
    assert np.all(np.isinf(np.asarray(E.edt(empty, (1, 1, 1)))))
    # batched leading axis
    batch = np.stack([full, empty])
    out = np.asarray(E.edt(batch, (1, 1, 1)))
    assert out.shape == batch.shape
    assert np.max(out[0]) == 0.0 and np.all(np.isinf(out[1]))


def test_boundary_matches_scipy(rng):
    for shape in [(12, 15, 11), (8, 8, 8)]:
        m = _blobs(rng, shape, p=0.97)
        ref = m & ~ndimage.binary_erosion(m)  # cross struct, 0 border
        got = np.asarray(E.boundary_mask(m))
        assert np.array_equal(ref, got)
    # solid block touching the array edge: every face voxel is boundary
    solid = np.ones((5, 6, 7), bool)
    got = np.asarray(E.boundary_mask(solid))
    ref = solid & ~ndimage.binary_erosion(solid)
    assert np.array_equal(ref, got)


def test_masked_percentile_matches_numpy(rng):
    vals = rng.random((4, 50)).astype(np.float32)
    valid = rng.random((4, 50)) > 0.6
    valid[0, :3] = True  # ensure nonempty
    sel = vals[valid]
    for q in (0.0, 37.5, 95.0, 100.0):
        got = float(E.masked_percentile(vals, valid, q))
        ref = float(np.percentile(sel.astype(np.float64), q))
        assert got == pytest.approx(ref, abs=1e-5)
    # single valid element / empty set
    one = np.zeros((5,), bool)
    one[2] = True
    assert float(E.masked_percentile(vals[0, :5], one, 95.0)) == \
        pytest.approx(float(vals[0, 2]), abs=1e-6)
    assert np.isnan(float(E.masked_percentile(vals[0, :5],
                                              np.zeros(5, bool), 95.0)))
    # near-inf bit range: (lo + hi) // 2 overflowed int32 here before
    # the midpoint fix — values with huge exponents must still resolve
    big = np.array([1e30, 2e32, 3e35, np.inf, 5.0], np.float32)
    bmask = np.ones(5, bool)
    for q, want in ((0.0, 5.0), (50.0, 2e32), (100.0, np.inf)):
        got = float(E.masked_percentile(big, bmask, q))
        assert got == float(np.float32(want)) \
            or (np.isinf(got) and np.isinf(want)), (q, got)


def test_masked_percentile_signed_and_nan(rng):
    # the radix-key search must be exact on NEGATIVE values (HU, dose
    # differences) — the first bit-search version was silently wrong
    # there (review finding: [-5,-1,2,3] q=0 returned 0.0)
    neg = np.array([-5.0, -1.0, 2.0, 3.0], np.float32)
    allv = np.ones(4, bool)
    for q in (0.0, 25.0, 50.0, 90.0, 100.0):
        got = float(E.masked_percentile(neg, allv, q))
        assert got == pytest.approx(
            float(np.percentile(neg.astype(np.float64), q)), abs=1e-6), q
    mixed = (rng.random((300,)).astype(np.float32) - 0.5) * 2000.0
    mmask = rng.random(300) > 0.4
    mmask[:2] = True
    for q in (0.0, 12.5, 50.0, 95.0, 100.0):
        got = float(E.masked_percentile(mixed, mmask, q))
        ref = float(np.percentile(mixed[mmask].astype(np.float64), q))
        assert got == pytest.approx(ref, abs=1e-3), q
    # -inf resolves exactly; duplicates across the interpolation ranks
    # must reuse the duplicate, not jump to the next distinct value
    winf = np.array([-np.inf, -2.0, 1.0], np.float32)
    assert np.isneginf(float(E.masked_percentile(winf, np.ones(3, bool),
                                                 0.0)))
    dup = np.array([1.0, 1.0, 2.0], np.float32)
    assert float(E.masked_percentile(dup, np.ones(3, bool), 25.0)) == \
        pytest.approx(1.0, abs=1e-7)
    # a valid NaN poisons the result (numpy semantics), an invalid one
    # is ignored
    nanv = np.array([1.0, np.nan, 3.0], np.float32)
    assert np.isnan(float(E.masked_percentile(nanv, np.ones(3, bool),
                                              50.0)))
    sel = np.array([True, False, True])
    assert float(E.masked_percentile(nanv, sel, 50.0)) == \
        pytest.approx(2.0, abs=1e-6)


def test_surface_metrics_match_host_panel(rng):
    a = _blobs(rng, (20, 30, 25), p=0.995, iters=4)
    b = np.roll(a, (1, 2, -1), axis=(0, 1, 2))
    sp = (0.9, 1.1, 2.0)
    d_ab, d_ba = M.surface_distances(a, b, sp)
    dev = {k: float(v) for k, v in E.surface_metrics(a, b, sp, 2.0).items()}
    assert dev["dice"] == pytest.approx(M.dice_coefficient(a, b), abs=1e-6)
    assert dev["jaccard"] == pytest.approx(M.jaccard_index(a, b), abs=1e-6)
    assert dev["volume_a_cc"] == pytest.approx(M.volume_cc(a, sp), rel=1e-5)
    assert dev["hausdorff_mm"] == pytest.approx(
        M._hd(d_ab, d_ba, 100.0), abs=1e-4)
    assert dev["hd95_mm"] == pytest.approx(M._hd(d_ab, d_ba, 95.0), abs=1e-4)
    assert dev["assd_mm"] == pytest.approx(M._assd(d_ab, d_ba), abs=1e-4)
    assert dev["surface_dice"] == pytest.approx(
        M._sdice(d_ab, d_ba, 2.0), abs=1e-6)


def test_surface_metrics_empty_and_identical(rng):
    a = _blobs(rng, (10, 12, 14), p=0.98)
    sp = (1.0, 1.0, 1.0)
    out = E.surface_metrics(a, a, sp)
    assert float(out["dice"]) == 1.0
    assert float(out["hausdorff_mm"]) == 0.0
    assert float(out["assd_mm"]) == 0.0
    empty = np.zeros_like(a)
    out = E.surface_metrics(a, empty, sp)
    assert float(out["dice"]) == 0.0
    assert np.isnan(float(out["hd95_mm"]))
    out = E.surface_metrics(empty, empty, sp)
    assert float(out["dice"]) == 1.0  # host convention: 1.0 for two empties


def test_compare_masks_batch_sharded(rng):
    import jax

    from medicalimageanalysis_tpu.parallel.batch import compare_masks_batch
    from medicalimageanalysis_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    B, shape, sp = 8, (12, 16, 14), (1.0, 1.2, 2.0)
    masks_a = np.stack([_blobs(rng, shape, p=0.97) for _ in range(B)])
    masks_b = np.stack([np.roll(m, (1, -1, 2), axis=(0, 1, 2))
                        for m in masks_a])
    mesh = make_mesh(8, space=1)
    out = compare_masks_batch(masks_a, masks_b, sp, tolerance_mm=1.5,
                              mesh=mesh)
    ref = compare_masks_batch(masks_a, masks_b, sp, tolerance_mm=1.5)
    for k in out:
        np.testing.assert_allclose(out[k], ref[k], atol=1e-5)
    # spot-check one pair against the single-pair device panel
    one = {k: float(v) for k, v in
           E.surface_metrics(masks_a[3], masks_b[3], sp, 1.5).items()}
    for k, v in one.items():
        assert out[k][3] == pytest.approx(v, abs=1e-5)
    with pytest.raises(ValueError):
        compare_masks_batch(masks_a[:3], masks_b[:3], sp, mesh=mesh)
    with pytest.raises(ValueError):
        compare_masks_batch(masks_a[:, 0], masks_b[:, 0], sp)


def test_expand_mask_device_matches_scipy(rng):
    from medicalimageanalysis_tpu.utils.roi.margin import expand_mask

    m = _blobs(rng, (14, 18, 16), p=0.985, iters=2).astype(np.uint8)
    sp = (0.9, 0.9, 2.5)
    for margin in (3.7, [4.0, 4.0, 0.0], -2.3):
        ref = expand_mask(m, sp, margin)
        got = expand_mask(m, sp, margin, backend="device")
        assert np.array_equal(ref, got), f"margin={margin}"
    with pytest.raises(ValueError):
        expand_mask(m, sp, 1.0, backend="cuda")


def test_compare_rois_device_backend(rng, tmp_path):
    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage
    from medicalimageanalysis_tpu.utils.metrics import compare_rois

    arr = (rng.random((8, 24, 24)) * 100).astype(np.int16)
    CreateDicomImage(str(tmp_path / "ct"), arr, spacing=[1.0, 1.0],
                     thickness=2.5).run()
    mia.read_dicoms(folder_path=str(tmp_path))
    image = mia.Data.image[mia.Data.image_list[0]]
    mask_a = np.zeros(arr.shape, np.uint8)
    mask_a[2:6, 5:15, 6:16] = 1
    mask_b = np.roll(mask_a, (1, 2, -1), axis=(0, 1, 2))
    image.add_roi(roi_name="A", color=[255, 0, 0], visible=True)
    image.rois["A"].convert_mask(mask_a)
    image.add_roi(roi_name="B", color=[0, 255, 0], visible=True)
    image.rois["B"].convert_mask(mask_b)
    host = compare_rois(image, "A", "B", tolerance_mm=2.0)
    dev = compare_rois(image, "A", "B", tolerance_mm=2.0,
                       backend="device")
    assert set(host) == set(dev)
    for k in host:
        assert dev[k] == pytest.approx(host[k], abs=1e-4), k
