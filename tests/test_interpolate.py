"""Shape-based slice interpolation tests (Roi.interpolate_slices /
utils.roi.interpolate — BEYOND-PARITY sparse-contour filling)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.roi.interpolate import (
    interpolate_mask_slices)

from helpers import write_ct_series


def _disk(shape_yx, cy, cx, r):
    yy, xx = np.mgrid[0:shape_yx[0], 0:shape_yx[1]]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_identical_neighbors_copy():
    m = np.zeros((5, 20, 20), np.uint8)
    d = _disk((20, 20), 10, 10, 5)
    m[0] = m[4] = d
    out = interpolate_mask_slices(m)
    for z in range(5):
        np.testing.assert_array_equal(out[z], d)


def test_radius_morphs_between_disks():
    """Interpolating between concentric disks of radius 3 and 9: the
    middle slice's radius is ~6 (signed distance fields of concentric
    disks interpolate linearly in radius)."""
    m = np.zeros((3, 30, 30), np.uint8)
    m[0] = _disk((30, 30), 15, 15, 3)
    m[2] = _disk((30, 30), 15, 15, 9)
    out = interpolate_mask_slices(m)
    mid_area = int(out[1].sum())
    assert abs(mid_area - int(_disk((30, 30), 15, 15, 6).sum())) \
        <= 8  # discretization slack
    # endpoints untouched
    np.testing.assert_array_equal(out[0], m[0])
    np.testing.assert_array_equal(out[2], m[2])


def test_translation_morphs_position():
    m = np.zeros((3, 30, 30), np.uint8)
    m[0] = _disk((30, 30), 8, 8, 4)
    m[2] = _disk((30, 30), 20, 20, 4)
    out = interpolate_mask_slices(m)
    ys, xs = np.nonzero(out[1])
    assert abs(ys.mean() - 14) < 1.5 and abs(xs.mean() - 14) < 1.5


def test_outside_span_untouched():
    m = np.zeros((6, 10, 10), np.uint8)
    m[2] = m[4] = _disk((10, 10), 5, 5, 3)
    out = interpolate_mask_slices(m)
    assert out[0].sum() == 0 and out[1].sum() == 0 and out[5].sum() == 0
    assert out[3].sum() > 0


def test_roi_interpolate_slices_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(-200, 200, size=(6, 24, 24)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(1, 1), thickness=2.0)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]

    sparse = np.zeros((6, 24, 24), np.uint8)
    sparse[1] = _disk((24, 24), 12, 12, 6)
    sparse[3] = _disk((24, 24), 12, 12, 6)
    sparse[5] = _disk((24, 24), 12, 12, 6)
    img.create_roi(name="Sparse", color=[255, 0, 0])
    img.rois["Sparse"].convert_mask(sparse)

    img.rois["Sparse"].interpolate_slices()
    full = np.asarray(img.rois["Sparse"].compute_mask()).astype(np.uint8)
    for z in (2, 4):
        np.testing.assert_array_equal(full[z], sparse[1])
    assert full[0].sum() == 0  # outside the contoured span
