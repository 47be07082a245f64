"""Image.compute_projection tests (MIP / mean / DRR —
BEYOND-PARITY projection rendering)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data

from helpers import write_ct_series


def _ingest(tmp_path, arr, spacing=(1, 1), thickness=2.0):
    write_ct_series(tmp_path / "ct", arr, spacing=spacing,
                    thickness=thickness)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    return Data.image["CT 01"]


def test_mip_and_mean(tmp_path):
    arr = np.full((4, 8, 10), -1000, np.int16)
    arr[2, 3, 7] = 500          # hot voxel
    img = _ingest(tmp_path, arr)

    mip_y = img.compute_projection(mode="mip", axis="y")
    assert mip_y.shape == (4, 10)
    assert mip_y[2, 7] == 500 and mip_y[0, 0] == -1000

    mip_z = img.compute_projection(mode="mip", axis="z")
    assert mip_z.shape == (8, 10)
    assert mip_z[3, 7] == 500

    mean_x = img.compute_projection(mode="mean", axis="x")
    assert mean_x.shape == (4, 8)
    np.testing.assert_allclose(
        mean_x[2, 3], (-1000 * 9 + 500) / 10.0, rtol=1e-6)


def test_drr_uniform_water_analytic(tmp_path):
    """Uniform water (HU 0) slab: detector = 1 - exp(-mu0 * L) with
    L the path length in mm — every pixel matches the analytic
    value."""
    arr = np.zeros((4, 8, 10), np.int16)   # water
    img = _ingest(tmp_path, arr, spacing=(1, 1), thickness=2.5)

    drr_y = img.compute_projection(mode="drr", axis="y")
    expected = 1.0 - np.exp(-0.02 * 8 * 1.0)   # 8 voxels * sy=1mm
    np.testing.assert_allclose(drr_y, expected, rtol=1e-5)

    drr_z = img.compute_projection(mode="drr", axis="z")
    expected_z = 1.0 - np.exp(-0.02 * 4 * 2.5)  # 4 slices * 2.5mm
    np.testing.assert_allclose(drr_z, expected_z, rtol=1e-5)

    # air attenuates ~nothing
    arr2 = np.full((4, 8, 10), -1000, np.int16)
    img2 = _ingest(tmp_path, arr2)
    assert float(img2.compute_projection(mode="drr", axis="y").max()) \
        < 1e-6


def test_projection_rotation_moves_hot_voxel(tmp_path):
    """A 90-deg in-plane rotation about the lattice center moves a
    hot voxel to the predicted projected position."""
    arr = np.full((4, 16, 16), -1000, np.int16)
    arr[2, 3, 12] = 900
    img = _ingest(tmp_path, arr, spacing=(1, 1), thickness=2.0)

    # lattice-invariant rotation point: the (dims-1)/2 voxel center
    center = [float(img.origin[0]) + 7.5, float(img.origin[1]) + 7.5,
              float(img.origin[2]) + 1.5 * 2.0]
    mip_z = img.compute_projection(mode="mip", axis="z",
                                   angles=(0, 0, 90), center=center)
    hot = np.unravel_index(np.argmax(mip_z), mip_z.shape)
    # the source hot voxel (y=3, x=12) must land 90 deg away from its
    # original spot, on the ring of radius ~ sqrt(4.5^2+4.5^2) about
    # (7.5, 7.5); allow 1-voxel interpolation slack
    dy, dx = hot[0] - 7.5, hot[1] - 7.5
    sy, sx = 3 - 7.5, 12 - 7.5
    assert abs(np.hypot(dy, dx) - np.hypot(sy, sx)) <= 1.0
    # rotated position is perpendicular to the source offset
    dot = dy * sy + dx * sx
    assert abs(dot) <= np.hypot(sy, sx) * 1.5  # ~cos 90 with slack
    assert float(mip_z.max()) > 500.0
    # and it genuinely moved
    assert hot != (3, 12)


def test_projection_validation(tmp_path):
    arr = np.zeros((2, 4, 4), np.int16)
    img = _ingest(tmp_path, arr)
    with pytest.raises(ValueError, match="axis"):
        img.compute_projection(axis="q")
    with pytest.raises(ValueError, match="mode"):
        img.compute_projection(mode="sum")
