"""Radiobiology conversions + outcome models (utils/radiobiology) and
the Dose-level conveniences (compute_eqd2/bed/geud/ntcp/tcp) — NEW
capability; the reference stops at physical-dose DVH statistics."""

import numpy as np
import pytest

from medicalimageanalysis_tpu.utils.radiobiology import (
    bed, eqd2, geud, ntcp_lkb, ntcp_logistic, tcp_logistic)


def test_eqd2_identity_at_2gy_fractions():
    # EQD2 is voxel-wise: a voxel at 60 Gy over 30 fx sees 2 Gy/fx ->
    # unchanged for any ab; a 30 Gy voxel sees 1 Gy/fx -> spared
    d = np.array([60.0, 30.0, 0.0])
    out = eqd2(d, 30, 3.0)
    np.testing.assert_allclose(out[0], 60.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 30.0 * (1.0 + 3.0) / 5.0,
                               rtol=1e-6)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-7)
    np.testing.assert_allclose(eqd2(d, 30, 10.0)[0], 60.0, atol=1e-5)


def test_eqd2_hypofractionation_boosts_low_ab():
    # 3 x 15 Gy SBRT, ab=3: EQD2 = 45*(15+3)/(2+3) = 162 Gy
    out = eqd2(np.float32(45.0), 3, 3.0)
    np.testing.assert_allclose(out, 45.0 * 18.0 / 5.0, rtol=1e-6)
    # higher ab tissue is less sensitive to fraction size
    assert eqd2(np.float32(45.0), 3, 10.0) < out


def test_bed_formula():
    # BED = D(1 + d/ab): 60 Gy / 30 fx, ab=10 -> 60*1.2 = 72
    np.testing.assert_allclose(bed(np.float32(60.0), 30, 10.0), 72.0,
                               rtol=1e-6)


def test_bed_eqd2_relation():
    # EQD2 = BED / (1 + 2/ab)
    rng = np.random.default_rng(0)
    D = rng.uniform(0, 70, 100).astype(np.float32)
    ab = 3.0
    np.testing.assert_allclose(eqd2(D, 25, ab),
                               bed(D, 25, ab) / (1 + 2.0 / ab),
                               rtol=1e-5)


def test_geud_limits():
    D = np.array([20.0, 40.0, 60.0])
    np.testing.assert_allclose(geud(D, 1.0), 40.0, rtol=1e-6)  # mean
    # large a -> max (within the (1/N)^(1/a) power-mean factor);
    # large negative a -> min
    assert abs(geud(D, 100.0) - 60.0) < 0.7
    assert abs(geud(D, -100.0) - 20.0) < 0.3
    # a=0 -> geometric mean
    np.testing.assert_allclose(geud(D, 0.0),
                               np.exp(np.mean(np.log(D))), rtol=1e-6)
    # monotone in a
    assert geud(D, 4.0) > geud(D, 1.0) > geud(D, -4.0)
    assert geud([], 1.0) == 0.0


def test_geud_uniform_dose_is_dose():
    for a in (-10.0, -1.0, 0.0, 1.0, 8.0):
        np.testing.assert_allclose(geud(np.full(50, 42.0), a), 42.0,
                                   rtol=1e-6)


def test_ntcp_lkb_anchor_points():
    # at gEUD = TD50 exactly -> NTCP 50%
    out = ntcp_lkb(np.full(100, 24.5), td50=24.5, m=0.18, n=0.87)
    np.testing.assert_allclose(out["ntcp"], 0.5, atol=1e-9)
    # one-sigma above: Phi(1) ~ 0.8413
    d = 24.5 * (1 + 0.18)
    out = ntcp_lkb(np.full(100, d), td50=24.5, m=0.18, n=0.87)
    np.testing.assert_allclose(out["ntcp"], 0.841345, atol=1e-5)
    # monotone in dose
    lo = ntcp_lkb(np.full(10, 10.0), 24.5, 0.18, 0.87)["ntcp"]
    hi = ntcp_lkb(np.full(10, 40.0), 24.5, 0.18, 0.87)["ntcp"]
    assert lo < 0.5 < hi
    with pytest.raises(ValueError):
        ntcp_lkb([1.0], 24.5, 0.18, 0.0)


def test_logistic_models():
    out = ntcp_logistic(np.full(10, 30.0), td50=30.0, gamma50=2.0, a=1.0)
    np.testing.assert_allclose(out["ntcp"], 0.5, atol=1e-9)
    t = tcp_logistic(np.full(10, 70.0), tcd50=50.0, gamma50=2.0)
    assert 0.9 < t["tcp"] <= 1.0
    # gamma50 is the normalized slope at D50: dTCP/d(D/D50) ~ gamma50
    eps = 1e-3
    hi = tcp_logistic(np.full(10, 50.0 * (1 + eps)), 50.0, 2.0,
                      a=1.0)["tcp"]
    lo = tcp_logistic(np.full(10, 50.0 * (1 - eps)), 50.0, 2.0,
                      a=1.0)["tcp"]
    np.testing.assert_allclose((hi - lo) / (2 * eps), 2.0, rtol=0.01)


def test_input_validation():
    with pytest.raises(ValueError):
        eqd2(np.ones(3), 0, 3.0)
    with pytest.raises(ValueError):
        bed(np.ones(3), 30, -1.0)


def _mk_dose(array, spacing_xyz=(2.0, 2.0, 2.5)):
    from medicalimageanalysis_tpu.dicom import Dataset
    from medicalimageanalysis_tpu.structure.dose import Dose

    class H:
        pass
    h = H()
    h.array = np.asarray(array, np.float32)
    h.image_set = [Dataset()]
    h.plane = "Axial"
    h.spacing = np.asarray(spacing_xyz, float)
    h.origin = np.zeros(3)
    h.dimensions = np.asarray(array.shape)
    h.orientation = [1, 0, 0, 0, 1, 0]
    h.image_matrix = np.eye(3)
    h.dose_name = "Phys 01"
    h.modality = "RTDOSE"
    h.filepaths, h.sops, h.unverified = [], [], []
    return Dose(h)


def test_dose_compute_eqd2_registers_first_class_dose():
    from medicalimageanalysis_tpu.data import Data
    Data.clear()
    d = _mk_dose(np.full((4, 8, 8), 45.0))
    out = d.compute_eqd2(3, 3.0, name="EQD2 A")
    assert "EQD2 A" in Data.dose and "EQD2 A" in Data.dose_list
    np.testing.assert_allclose(out.array, 162.0, rtol=1e-5)
    # geometry rides along; DVH analytics work on the converted grid
    np.testing.assert_allclose(out.spacing, d.spacing)
    stats = out.compute_dose_statistics()
    np.testing.assert_allclose(stats["mean"], 162.0, rtol=1e-5)
    assert out.misc["alpha_beta"] == 3.0
    # unregistered variant returns the raw array
    arr = d.compute_bed(3, 3.0, register=False)
    np.testing.assert_allclose(arr, 45.0 * (1 + 15.0 / 3.0), rtol=1e-6)
    # re-running with the same name replaces, not duplicates
    d.compute_eqd2(3, 3.0, name="EQD2 A")
    assert Data.dose_list.count("EQD2 A") == 1
    Data.clear()


def test_isodose_contours():
    """Isodose lines: a centered dose disc yields one closed contour
    per level whose radius tracks the level (physical mm positions)."""
    from medicalimageanalysis_tpu.data import Data
    Data.clear()
    zz, yy, xx = np.mgrid[0:4, 0:32, 0:32]
    r = np.sqrt((yy - 16.0) ** 2 + (xx - 16.0) ** 2)
    arr = np.maximum(60.0 * (1 - r / 14.0), 0.0).astype(np.float32)
    d = _mk_dose(arr, spacing_xyz=(2.0, 2.0, 2.5))
    iso = d.compute_isodose_contours(levels=[30.0, 50.0])
    assert set(iso) == {30.0, 50.0}
    for gy, (pix, pos) in iso.items():
        assert len(pos) == 4  # one ring per slice
        ring = np.asarray(pos[0])
        # radius in mm around the center (16 px * 2 mm)
        rad = np.linalg.norm(ring[:, :2] - [32.0, 32.0], axis=1)
        want = 14.0 * (1 - gy / 60.0) * 2.0
        assert abs(np.median(rad) - want) < 2.5
    # 50 Gy ring sits inside the 30 Gy ring
    r30 = np.linalg.norm(
        np.asarray(iso[30.0][1][0])[:, :2] - [32.0, 32.0], axis=1)
    r50 = np.linalg.norm(
        np.asarray(iso[50.0][1][0])[:, :2] - [32.0, 32.0], axis=1)
    assert np.median(r50) < np.median(r30)
    # percent_of form
    iso2 = d.compute_isodose_contours(levels=[50.0], percent_of=60.0)
    assert set(iso2) == {30.0}
    Data.clear()
