"""Segmentation-comparison metrics + DVF Jacobian QA tests
(BEYOND-PARITY utilities: the reference has no quantitative
comparison or registration-QA tooling)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.metrics import (
    compare_rois, dice_coefficient, hausdorff_distance, jaccard_index,
    mean_surface_distance, surface_dice, volume_cc)

from helpers import write_ct_series


def _cube(shape, lo, hi):
    m = np.zeros(shape, np.uint8)
    m[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1
    return m


def test_overlap_metrics_identical_and_disjoint():
    a = _cube((10, 20, 20), (2, 4, 4), (8, 16, 16))
    assert dice_coefficient(a, a) == 1.0
    assert jaccard_index(a, a) == 1.0
    b = np.zeros_like(a)
    b[0:1, 0:2, 0:2] = 1
    assert dice_coefficient(a, b) == 0.0
    # both empty: defined as perfect agreement
    z = np.zeros_like(a)
    assert dice_coefficient(z, z) == 1.0


def test_dice_known_half_overlap():
    a = _cube((4, 10, 10), (0, 0, 0), (4, 10, 10))
    b = _cube((4, 10, 10), (0, 0, 0), (2, 10, 10))
    # |A|=400, |B|=200, |A∩B|=200 -> dice = 2*200/600
    assert dice_coefficient(a, b) == pytest.approx(2 * 200 / 600)
    assert jaccard_index(a, b) == pytest.approx(0.5)


def test_volume_cc():
    a = _cube((4, 10, 10), (0, 0, 0), (2, 5, 5))
    # 50 voxels * (2 * 1 * 0.5) mm3 = 50 mm3 = 0.05 cc
    assert volume_cc(a, [2.0, 1.0, 0.5]) == pytest.approx(0.05)


def test_surface_distances_translation():
    """A cube shifted by 3 voxels in x at 1 mm spacing: Hausdorff and
    ASSD are bounded by / proportional to the 3 mm shift."""
    shape = (12, 30, 30)
    a = _cube(shape, (3, 8, 8), (9, 20, 20))
    b = _cube(shape, (3, 8, 11), (9, 20, 23))
    spacing = [1.0, 1.0, 1.0]
    hd = hausdorff_distance(a, b, spacing)
    assert hd == pytest.approx(3.0, abs=1e-6)
    hd95 = hausdorff_distance(a, b, spacing, percentile=95)
    assert 0 < hd95 <= 3.0
    assd = mean_surface_distance(a, b, spacing)
    assert 0 < assd <= 3.0
    assert surface_dice(a, b, spacing, tolerance_mm=3.0) \
        == pytest.approx(1.0)
    assert surface_dice(a, b, spacing, tolerance_mm=0.5) < 1.0
    assert hausdorff_distance(a, a, spacing) == 0.0


def test_surface_distance_spacing_scales():
    shape = (12, 20, 20)
    a = _cube(shape, (2, 5, 5), (8, 15, 15))
    b = np.roll(a, 2, axis=0)  # 2 slices in z
    hd = hausdorff_distance(a, b, [1.0, 1.0, 2.5])
    assert hd == pytest.approx(5.0, abs=1e-6)


def test_surface_distances_empty_raises():
    a = _cube((4, 8, 8), (1, 1, 1), (3, 6, 6))
    with pytest.raises(ValueError, match="empty"):
        hausdorff_distance(a, np.zeros_like(a), [1, 1, 1])


def test_compare_rois_panel(tmp_path):
    """ROI-level panel through the public API — the SEG-vs-manual QA
    path."""
    rng = np.random.default_rng(3)
    arr = rng.integers(-200, 200, size=(8, 24, 24)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(1, 1), thickness=2.0)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]

    manual = _cube((8, 24, 24), (2, 6, 6), (6, 18, 18))
    auto = _cube((8, 24, 24), (2, 6, 8), (6, 18, 20))  # 2 mm x shift
    img.create_roi(name="Manual", color=[255, 0, 0])
    img.rois["Manual"].convert_mask(manual)
    img.create_roi(name="Auto", color=[0, 255, 0])
    img.rois["Auto"].convert_mask(auto)

    panel = compare_rois(img, "Manual", "Auto", tolerance_mm=2.0)
    assert panel["dice"] == pytest.approx(
        dice_coefficient(manual, auto))
    assert panel["hausdorff_mm"] == pytest.approx(2.0, abs=1e-6)
    assert panel["surface_dice@2.0mm"] == pytest.approx(1.0)
    assert panel["volume_a_cc"] == pytest.approx(
        4 * 12 * 12 * 2.0 / 1000.0)


def test_jacobian_affine_field(tmp_path):
    """d(p) = (A - I) p gives det(J) = det(A) everywhere (linear field:
    central and one-sided differences are both exact)."""
    rng = np.random.default_rng(4)
    arr = rng.integers(-200, 200, size=(8, 24, 24)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    ref = Data.image[ct]

    # physical coords of each voxel (x, y, z); axis-aligned grid
    sx, sy, sz = (float(v) for v in ref.spacing)
    zz, yy, xx = np.mgrid[0:8, 0:24, 0:24].astype(np.float64)
    pos = np.stack([xx * sx, yy * sy, zz * sz], axis=-1)
    A = np.diag([1.1, 0.95, 1.0])
    A[0, 1] = 0.05  # shear
    dvf = (pos @ (A - np.eye(3)).T).astype(np.float32)

    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])
    qa = deform.compute_jacobian()
    expected = float(np.linalg.det(A))
    np.testing.assert_allclose(qa["det"], expected, atol=1e-4)
    assert qa["folding_fraction"] == 0.0
    assert qa["det_mean"] == pytest.approx(expected, abs=1e-4)


def test_jacobian_detects_folding(tmp_path):
    """A displacement ramp steeper than -1 voxel/voxel folds space:
    det <= 0 flagged in the folding region."""
    rng = np.random.default_rng(5)
    arr = rng.integers(-200, 200, size=(8, 24, 24)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    ref = Data.image[ct]

    dvf = np.zeros((8, 24, 24, 3), np.float32)
    xx = np.arange(24, dtype=np.float32)
    # dd_x/dx = -2 inside a band -> J_xx = -1 < 0
    dvf[:, :, :, 0] = np.where((xx >= 8) & (xx < 16), -2.0 * xx, 0.0)

    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])
    qa = deform.compute_jacobian()
    assert qa["folding_fraction"] > 0.2
    assert qa["det_min"] < 0.0


def test_update_pois_and_tre(tmp_path):
    """Landmark propagation through a constant field: moving POIs map
    into the reference frame and the TRE against the true reference
    landmarks is ~0 (exact for a constant field)."""
    from medicalimageanalysis_tpu.utils.metrics import (
        target_registration_error)

    rng = np.random.default_rng(6)
    arr = rng.integers(-200, 200, size=(8, 24, 24)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    ref, mov = Data.image[ct], Data.image[mr]

    # landmarks: reference truth at p, moving observes p + [2, 0, 0]
    truth = np.array([[-90.0, -110.0, -45.0], [-85.0, -105.0, -41.0]])
    for i, p in enumerate(truth):
        mov.add_poi(poi_name=f"L{i}", point=list(p + [2.0, 0.0, 0.0]))

    # point-displacement field moving -> reference: -2 mm in x
    dvf = np.zeros(tuple(ref.dimensions) + (3,), np.float32)
    dvf[..., 0] = -2.0
    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])
    mapped = deform.update_pois()
    assert set(mapped) == {"L0", "L1"}
    tre = target_registration_error(
        np.stack([mapped["L0"], mapped["L1"]]), truth)
    assert tre["max_mm"] < 1e-4

    # percent scales the displacement
    half = deform.update_pois(percent=50)
    tre_half = target_registration_error(
        np.stack([half["L0"], half["L1"]]), truth)
    assert tre_half["mean_mm"] == pytest.approx(1.0, abs=1e-4)

    with pytest.raises(ValueError, match="pair up"):
        target_registration_error(truth, truth[:1])
