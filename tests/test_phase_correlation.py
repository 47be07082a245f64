"""FFT phase-correlation translation estimation (global initializer)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.ops.registration.phase_correlation import (
    phase_correlation)

from helpers import write_ct_series


def _smooth_volume(shape=(16, 32, 32), seed=0):
    from medicalimageanalysis_tpu.ops.filters import gaussian_filter
    rng = np.random.default_rng(seed)
    return np.asarray(gaussian_filter(
        rng.normal(0, 100, shape).astype(np.float32), 2.0))


def test_exact_cyclic_roll_recovered():
    fixed = _smooth_volume()
    shift = (5, -7, 3)
    moving = np.roll(fixed, shift, axis=(0, 1, 2))
    got, response = phase_correlation(fixed, moving)
    np.testing.assert_allclose(got, shift, atol=0.05)
    assert response > 0.5
    # unwindowed on a perfectly cyclic shift: near-delta response
    got2, response2 = phase_correlation(fixed, moving, window=False)
    np.testing.assert_allclose(got2, shift, atol=0.01)
    assert response2 > 0.9


def test_subvoxel_gaussian_blob():
    zz, yy, xx = np.mgrid[0:20, 0:32, 0:32].astype(np.float64)

    def blob(cz, cy, cx):
        return np.exp(-(((zz - cz) / 2.5) ** 2 + ((yy - cy) / 4.0) ** 2
                        + ((xx - cx) / 3.0) ** 2)).astype(np.float32)

    fixed = blob(10.0, 15.0, 16.0)
    moving = blob(10.4, 14.7, 16.25)  # content shifted by +(.4,-.3,.25)
    got, response = phase_correlation(fixed, moving)
    np.testing.assert_allclose(got, [0.4, -0.3, 0.25], atol=0.1)
    assert response > 0.3


def test_spacing_scales_to_mm():
    fixed = _smooth_volume(seed=2)
    moving = np.roll(fixed, (2, 4, -6), axis=(0, 1, 2))
    got, _ = phase_correlation(fixed, moving, spacing_xyz=[0.5, 1.0, 2.5])
    np.testing.assert_allclose(got, [2 * 2.5, 4 * 1.0, -6 * 0.5],
                               atol=0.2)


def test_shape_validation():
    with pytest.raises(ValueError, match="matching"):
        phase_correlation(np.zeros((4, 4, 4)), np.zeros((4, 4, 5)))
    with pytest.raises(ValueError, match="matching"):
        phase_correlation(np.zeros((4, 4)), np.zeros((4, 4)))


def test_auto_register_ladder(tmp_path, rng):
    """auto_register recovers a rotation + beyond-capture-range
    translation that plain intensity descent from identity cannot."""
    from scipy.spatial.transform import Rotation

    from medicalimageanalysis_tpu.ops.resample import (
        affine_resample, compose_pixel_matrix)

    base = np.zeros((16, 48, 48), np.float32)
    zz, yy, xx = np.mgrid[0:16, 0:48, 0:48]
    base += 900 * np.exp(-(((zz - 8) / 4.0) ** 2 + ((yy - 20) / 8.0) ** 2
                           + ((xx - 26) / 6.0) ** 2))
    base += 300 * np.exp(-(((zz - 5) / 2.0) ** 2 + ((yy - 32) / 4.0) ** 2
                           + ((xx - 14) / 4.0) ** 2))
    base += rng.normal(0, 5, base.shape)

    # ground-truth reference -> moving physical map: 4 deg in-plane
    # about the volume center + (12, -9, 4) mm translation
    write_ct_series(tmp_path / "a", base.astype(np.int16),
                    spacing=(1, 1), thickness=1.0)
    mia.read_dicoms(folder_path=str(tmp_path / "a"))
    ref_img = Data.image[Data.image_list[0]]
    center = np.asarray(ref_img.compute_center(), np.float64)
    R = Rotation.from_euler("z", 4, degrees=True).as_matrix()
    M_true = np.eye(4)
    M_true[:3, :3] = R
    M_true[:3, 3] = center - R @ center + [12.0, -9.0, 4.0]

    # moving(q) = ref(M_true^{-1} q) on the same grid => the perfect
    # registration matrix (reference -> moving) is M_true
    A = compose_pixel_matrix(ref_img.matrix, ref_img.spacing,
                             ref_img.origin, ref_img.matrix,
                             ref_img.spacing, ref_img.origin,
                             phys_transform=np.linalg.inv(M_true))
    moved = np.asarray(affine_resample(base, A, base.shape,
                                       background=0.0))
    write_ct_series(tmp_path / "b", moved.astype(np.int16),
                    spacing=(1, 1), thickness=1.0, modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path), clear=True)
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]

    rigid = mia.Rigid(ct, mr)
    info = rigid.auto_register(metric="mse")
    assert rigid.misc["auto_register"]["metric"] == "mse"
    assert "phase_correlation" in rigid.misc["auto_register"]
    got = np.asarray(rigid.matrix, np.float64)
    ang_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(got[:3, :3] @ M_true[:3, :3].T) - 1) / 2, -1, 1)))
    assert ang_err < 1.0
    # compare the full map at the volume center (translation +
    # rotation composed)
    c_h = np.append(center, 1.0)
    err_mm = np.linalg.norm((got @ c_h)[:3] - (M_true @ c_h)[:3])
    assert err_mm < 1.0


def test_rigid_compute_phase_correlation(tmp_path, rng):
    base = np.zeros((12, 32, 32), np.float32)
    zz, yy, xx = np.mgrid[0:12, 0:32, 0:32]
    base += 900 * np.exp(-(((zz - 6) / 3.0) ** 2 + ((yy - 12) / 5.0) ** 2
                           + ((xx - 20) / 4.0) ** 2))
    base += rng.normal(0, 5, base.shape)
    shift_vox = (2, 5, -6)  # (z, y, x)
    moved = np.roll(base, shift_vox, axis=(0, 1, 2))
    write_ct_series(tmp_path / "a", base.astype(np.int16),
                    spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", moved.astype(np.int16),
                    spacing=(1, 1), thickness=2.0, modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]

    rigid = mia.Rigid(ct, mr)
    info = rigid.compute_phase_correlation()
    # identity grids: physical shift == voxel shift * spacing (x, y, z)
    expected = [shift_vox[2] * 1.0, shift_vox[1] * 1.0,
                shift_vox[0] * 2.0]
    np.testing.assert_allclose(info["shift_mm"], expected, atol=0.3)
    np.testing.assert_allclose(rigid.matrix[:3, 3], expected, atol=0.3)
    np.testing.assert_allclose(rigid.matrix[:3, :3], np.eye(3),
                               atol=1e-6)
    assert info["response"] > 0.4
    assert rigid.misc["phase_correlation"] == info

    # resampling the moving volume onto the REFERENCE grid through the
    # fitted matrix must cancel the roll (away from the wrapped band;
    # create_image auto-crops onto its own shifted grid, so compose
    # the reference grid explicitly)
    from medicalimageanalysis_tpu.ops.resample import (affine_resample,
                                                       compose_pixel_matrix)
    ref_img, mov_img = Data.image[ct], Data.image[mr]
    A = compose_pixel_matrix(mov_img.matrix, mov_img.spacing,
                             mov_img.origin, ref_img.matrix,
                             ref_img.spacing, ref_img.origin,
                             phys_transform=rigid.matrix)
    arr = np.asarray(affine_resample(
        np.asarray(mov_img.array, np.float32), A,
        tuple(ref_img.array.shape), background=0.0))
    ref_arr = np.asarray(ref_img.array, np.float32)
    core = np.s_[4:-4, 8:-8, 8:-8]
    err = np.abs(arr[core] - ref_arr[core])
    assert np.median(err) < 10.0

    # update=False leaves the matrix alone
    rigid2 = mia.Rigid(ct, mr)
    m_before = rigid2.matrix.copy()
    info2 = rigid2.compute_phase_correlation(update=False)
    np.testing.assert_array_equal(rigid2.matrix, m_before)
    assert abs(info2["shift_mm"][0] - expected[0]) < 0.3


def test_auto_register_nonrigid_warm_start(tmp_path, rng):
    """A prior non-rigid matrix (e.g. a scaled landmark fit) must seed
    the descent via its nearest rotation + translation instead of
    silently restarting from identity — the preset translation here is
    beyond plain-descent capture range, so a discarded warm start
    fails the final accuracy check."""
    from medicalimageanalysis_tpu.ops.resample import (
        affine_resample, compose_pixel_matrix)

    base = np.zeros((16, 48, 48), np.float32)
    zz, yy, xx = np.mgrid[0:16, 0:48, 0:48]
    base += 900 * np.exp(-(((zz - 8) / 4.0) ** 2 + ((yy - 20) / 8.0) ** 2
                           + ((xx - 26) / 6.0) ** 2))
    base += 300 * np.exp(-(((zz - 5) / 2.0) ** 2 + ((yy - 32) / 4.0) ** 2
                           + ((xx - 14) / 4.0) ** 2))
    base += rng.normal(0, 5, base.shape)
    write_ct_series(tmp_path / "a", base.astype(np.int16),
                    spacing=(1, 1), thickness=1.0)
    mia.read_dicoms(folder_path=str(tmp_path / "a"))
    ref_img = Data.image[Data.image_list[0]]

    M_true = np.eye(4)
    M_true[:3, 3] = [14.0, -10.0, 4.0]
    A = compose_pixel_matrix(ref_img.matrix, ref_img.spacing,
                             ref_img.origin, ref_img.matrix,
                             ref_img.spacing, ref_img.origin,
                             phys_transform=np.linalg.inv(M_true))
    moved = np.asarray(affine_resample(base, A, base.shape,
                                       background=0.0))
    write_ct_series(tmp_path / "b", moved.astype(np.int16),
                    spacing=(1, 1), thickness=1.0, modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path), clear=True)
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]

    rigid = mia.Rigid(ct, mr)
    # a prior (hypothetical) scaled fit: correct translation, but the
    # 3x3 block is 1.04 * I -> NOT orthonormal
    M0 = np.eye(4)
    M0[:3, :3] *= 1.04
    M0[:3, 3] = M_true[:3, 3]
    rigid.matrix = M0
    with pytest.warns(UserWarning, match="not rigid"):
        rigid.auto_register(metric="mse", use_phase_correlation=False)
    got = np.asarray(rigid.matrix, np.float64)
    center = np.asarray(ref_img.compute_center(), np.float64)
    c_h = np.append(center, 1.0)
    err_mm = np.linalg.norm((got @ c_h)[:3] - (M_true @ c_h)[:3])
    assert err_mm < 1.0
