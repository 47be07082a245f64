"""Thin-plate-spline landmark registration (ops/registration/tps.py +
Deformable.compute_tps) — NEW capability; the reference has no
landmark-driven registration (its POIs are never used)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.ops.registration.tps import (
    tps_displacement, tps_displacement_grid, tps_fit)

from helpers import write_ct_series


def test_tps_exact_interpolation_at_landmarks():
    rng = np.random.default_rng(0)
    P = rng.uniform(-50, 50, size=(12, 3))
    V = rng.uniform(-5, 5, size=(12, 3))
    W, A = tps_fit(P, V)
    out = np.asarray(tps_displacement(P, W, A, P.astype(np.float32)))
    np.testing.assert_allclose(out, V, atol=5e-3)


def test_tps_reproduces_affine_fields_exactly():
    """Landmark displacements drawn from an affine map: the spline's
    affine part absorbs it (W ~ 0) and the interpolant is exact
    EVERYWHERE, not just at landmarks."""
    rng = np.random.default_rng(1)
    P = rng.uniform(-40, 40, size=(10, 3))
    B = np.array([[0.02, 0.01, 0.0],
                  [-0.01, 0.03, 0.005],
                  [0.0, 0.002, -0.02]])
    c = np.array([1.5, -2.0, 0.5])
    V = P @ B.T + c
    W, A = tps_fit(P, V)
    assert np.abs(W).max() < 1e-6
    Q = rng.uniform(-80, 80, size=(200, 3)).astype(np.float32)
    out = np.asarray(tps_displacement(P, W, A, Q))
    np.testing.assert_allclose(out, Q @ B.T + c, atol=2e-3)


def test_tps_regularization_smooths():
    """lam > 0 trades landmark fidelity for smoothness: residual at a
    noisy landmark grows with lam while staying bounded."""
    rng = np.random.default_rng(2)
    P = rng.uniform(-30, 30, size=(20, 3))
    V = 0.1 * P  # smooth affine truth
    V_noisy = V + rng.normal(0, 0.5, V.shape)
    res = []
    for lam in (0.0, 5.0, 50.0):
        W, A = tps_fit(P, V_noisy, regularization=lam)
        fit = np.asarray(tps_displacement(P, W, A,
                                          P.astype(np.float32)))
        res.append(np.linalg.norm(fit - V_noisy, axis=1).mean())
    assert res[0] < 1e-2           # exact interpolation
    assert res[0] < res[1] < res[2]


def test_tps_degenerate_landmarks_dont_crash():
    # 2 points (affine underdetermined) -> lstsq drops null directions
    P = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    V = np.array([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    W, A = tps_fit(P, V)
    out = np.asarray(tps_displacement(P, W, A, P.astype(np.float32)))
    np.testing.assert_allclose(out, V, atol=1e-4)
    with pytest.raises(ValueError):
        tps_fit(np.zeros((0, 3)), np.zeros((0, 3)))
    with pytest.raises(ValueError):
        tps_fit(P, V, regularization=-1.0)


def test_tps_grid_matches_pointwise():
    rng = np.random.default_rng(3)
    P = rng.uniform(0, 40, size=(8, 3))
    V = rng.uniform(-3, 3, size=(8, 3))
    W, A = tps_fit(P, V)
    origin = np.array([-10.0, -5.0, 0.0])
    spacing = np.array([2.0, 3.0, 4.0])
    M = np.eye(3)
    grid = tps_displacement_grid(P, W, A, origin, spacing, M,
                                 (4, 5, 6), chunk=32)
    # voxel (z, y, x) -> position origin + [x sx, y sy, z sz]
    q = origin + np.array([3 * 2.0, 2 * 3.0, 1 * 4.0])
    direct = np.asarray(tps_displacement(
        P, W, A, q[None].astype(np.float32)))[0]
    np.testing.assert_allclose(grid[1, 2, 3], direct, atol=1e-4)

    # oblique grid: matrix rows = pixel-axis directions
    c, s = np.cos(0.3), np.sin(0.3)
    M2 = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
    grid2 = tps_displacement_grid(P, W, A, origin, spacing, M2,
                                  (4, 5, 6), chunk=32)
    q2 = origin + np.array([3 * 2.0, 2 * 3.0, 1 * 4.0]) @ M2
    direct2 = np.asarray(tps_displacement(
        P, W, A, q2[None].astype(np.float32)))[0]
    np.testing.assert_allclose(grid2[1, 2, 3], direct2, atol=1e-4)


def test_compute_tps_end_to_end(tmp_path):
    """Deformable.compute_tps from matched POIs: landmarks map exactly
    (residual ~0), update_pois round-trips moving POIs onto the
    reference truth, and the DVF at landmark voxels carries t - p."""
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
    ref, mov = Data.image[ct], Data.image[mr]

    # truth landmarks in the reference frame; the moving image sees
    # them displaced by a smooth position-dependent offset
    truth = np.array([[-90.0, -110.0, -45.0], [-82.0, -104.0, -41.0],
                      [-88.0, -100.0, -39.0], [-80.0, -112.0, -43.0],
                      [-85.0, -107.0, -47.0]])
    offs = np.stack([0.02 * (truth[:, 1] + 110.0) + 1.0,
                     -0.5 + 0.01 * (truth[:, 0] + 90.0),
                     np.full(len(truth), 0.75)], axis=1)
    for i, (p, d) in enumerate(zip(truth, offs)):
        ref.add_poi(poi_name=f"L{i}", point=list(p))
        mov.add_poi(poi_name=f"L{i}", point=list(p + d))

    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[])
    residual = deform.compute_tps()
    assert set(residual) == {f"L{i}" for i in range(5)}
    assert max(residual.values()) < 5e-3
    assert deform.dvf.shape == tuple(ref.dimensions) + (3,)

    mapped = deform.update_pois()
    err = np.array([np.linalg.norm(mapped[f"L{i}"] - truth[i])
                    for i in range(5)])
    # update_pois samples the grid trilinearly: exact up to the
    # spline's curvature between grid nodes
    assert err.max() < 0.2

    # selecting a subset of POIs restricts the fit
    r2 = deform.compute_tps(poi_names=["L0", "L1", "L2", "L3"])
    assert set(r2) == {"L0", "L1", "L2", "L3"}

    # explicit point-pair form, with a rigid pre-transform folded in
    shift = np.eye(4)
    shift[0, 3] = 3.0  # rigid maps reference -> moving: +3 mm in x
    deform2 = mia.Deformable(reference_name=ct, moving_name=mr,
                             rigid_matrix=shift, roi_names=[])
    r3 = deform2.compute_tps(points_reference=truth,
                             points_moving=truth + [3.0, 0.0, 0.0])
    assert max(r3.values()) < 5e-3
    # rigid absorbs the whole offset -> near-zero residual field
    assert np.abs(deform2.dvf).max() < 0.05
    Data.clear()


def test_compute_tps_no_matches_raises(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(-200, 200, size=(4, 12, 12)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[])
    with pytest.raises(ValueError, match="no matched POIs"):
        deform.compute_tps()
    Data.clear()


def test_tps_exact_at_clinical_coordinate_magnitudes():
    """Landmarks ~1000 mm from the origin (CT couch coordinates): the
    centered evaluation keeps the float32 kernel exact at anchors —
    the naive |q|^2+|p|^2-2q.p contraction loses ~0.5 mm there."""
    rng = np.random.default_rng(7)
    P = rng.uniform(-50, 50, size=(12, 3)) + np.array([200., -300., 1200.])
    V = rng.uniform(-5, 5, size=(12, 3))
    W, A = tps_fit(P, V)
    out = np.asarray(tps_displacement(P, W, A, P))
    np.testing.assert_allclose(out, V, atol=2e-2)
    # and the grid evaluator agrees with pointwise at a far node
    origin = np.array([180.0, -320.0, 1180.0])
    grid = tps_displacement_grid(P, W, A, origin, [2.0, 2.0, 2.0],
                                 np.eye(3), (4, 5, 6), chunk=16)
    q = origin + np.array([3 * 2.0, 2 * 2.0, 1 * 2.0])
    direct = np.asarray(tps_displacement(P, W, A, q[None]))[0]
    np.testing.assert_allclose(grid[1, 2, 3], direct, atol=2e-3)


def test_tps_partial_point_args_raise(tmp_path):
    rng = np.random.default_rng(8)
    arr = rng.integers(-200, 200, size=(4, 12, 12)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[])
    with pytest.raises(ValueError, match="together"):
        deform.compute_tps(points_reference=np.zeros((3, 3)))
    Data.clear()
