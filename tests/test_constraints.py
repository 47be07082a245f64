"""Clinical DVH goal evaluation (utils/dose.evaluate_constraints) —
plan-QA tooling; exact voxel-level metrics, QUANTEC/TPS goal grammar."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.dose import (evaluate_constraints,
                                                 register_dose_grid)

from helpers import write_ct_series


@pytest.fixture
def dose_setup(tmp_path):
    arr = np.zeros((10, 20, 20), np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(1, 1), thickness=1.0)
    mia.read_dicoms(folder_path=str(tmp_path / "ct"))
    name = Data.image_list[0]
    img = Data.image[name]

    mask = np.zeros((10, 20, 20), bool)
    mask[2:8, 4:14, 4:14] = True  # 600 voxels, 0.6 cc at 1 mm^3
    img.create_roi(name="PTV", color=[255, 0, 0])
    img.rois["PTV"].convert_mask(mask)
    img.create_roi(name="Empty", color=[0, 255, 0])

    # two-level dose: 20 Gy in ROI slices z 2-4, 60 Gy in z 5-7
    dose_arr = np.zeros((10, 20, 20), np.float32)
    dose_arr[:5] = 20.0
    dose_arr[5:] = 60.0
    dose = register_dose_grid(dose_arr, img, name="Plan")
    return name, dose


def test_metrics_exact(dose_setup):
    image_name, dose = dose_setup
    res = evaluate_constraints(dose, {"PTV": [
        "Dmax <= 60Gy",          # 60 -> pass (<=)
        "Dmin >= 30Gy",          # 20 -> fail
        "Dmean >= 40Gy",         # 40 -> pass
        "D95% >= 20Gy",          # 5th percentile = 20 -> pass
        "D25% >= 60Gy",          # 75th percentile = 60 -> pass
        "D0.3cc >= 60Gy",        # hottest 0.3 cc (300 voxels) -> 60
        "D0.5cc >= 60Gy",        # hottest 0.5 cc dips into 20 -> fail
        "V30Gy <= 50%",          # exactly 50% -> pass
        "V30Gy <= 0.2cc",        # 0.3 cc -> fail
        "V10Gy >= 100%",         # everything >= 20 -> pass
    ]}, image_name=image_name)

    by_goal = {r["goal"]: r for r in res}
    assert len(res) == 10
    assert by_goal["Dmax <= 60Gy"]["value"] == pytest.approx(60.0)
    assert by_goal["Dmax <= 60Gy"]["passed"]
    assert by_goal["Dmin >= 30Gy"]["value"] == pytest.approx(20.0)
    assert not by_goal["Dmin >= 30Gy"]["passed"]
    assert by_goal["Dmean >= 40Gy"]["value"] == pytest.approx(40.0)
    assert by_goal["Dmean >= 40Gy"]["passed"]
    assert by_goal["D95% >= 20Gy"]["value"] == pytest.approx(20.0)
    assert by_goal["D95% >= 20Gy"]["passed"]
    assert by_goal["D25% >= 60Gy"]["value"] == pytest.approx(60.0)
    assert by_goal["D0.3cc >= 60Gy"]["value"] == pytest.approx(60.0)
    assert by_goal["D0.5cc >= 60Gy"]["value"] == pytest.approx(20.0)
    assert not by_goal["D0.5cc >= 60Gy"]["passed"]
    assert by_goal["V30Gy <= 50%"]["value"] == pytest.approx(50.0)
    assert by_goal["V30Gy <= 50%"]["passed"]
    assert by_goal["V30Gy <= 0.2cc"]["value"] == pytest.approx(0.3)
    assert not by_goal["V30Gy <= 0.2cc"]["passed"]
    assert by_goal["V10Gy >= 100%"]["passed"]


def test_empty_roi_and_method(dose_setup):
    image_name, dose = dose_setup
    res = dose.evaluate_constraints({"Empty": ["Dmax <= 10Gy"]})
    assert len(res) == 1
    assert np.isnan(res[0]["value"])
    assert not res[0]["passed"]
    # single registered image: image_name optional
    res2 = evaluate_constraints("Plan", {"PTV": ["Dmean >= 40Gy"]})
    assert res2[0]["passed"]


def test_mesh_only_roi_voxelizes(dose_setup):
    """A mesh-only ROI (update_mesh / 3MF add_mesh_roi) rasterizes by
    mesh slicing instead of crashing (reference behavior) — so DVH /
    constraint evaluation works on imported meshes directly."""
    image_name, dose = dose_setup
    img = Data.image[image_name]
    zz, yy, xx = np.mgrid[0:10, 0:20, 0:20]
    sphere = ((zz - 5) ** 2 + ((yy - 10) / 2.0) ** 2
              + ((xx - 10) / 2.0) ** 2) <= 9
    img.create_roi(name="GTV", color=[0, 0, 255])
    img.rois["GTV"].convert_mask(sphere)
    base_mask = np.asarray(img.rois["GTV"].compute_mask()) > 0

    img.create_roi(name="MeshOnly", color=[0, 128, 255])
    # the exact (discrete) surface, not the shrunk display smooth
    img.rois["GTV"].create_discrete_mesh()
    img.rois["MeshOnly"].update_mesh(img.rois["GTV"].mesh)
    assert not img.rois["MeshOnly"].contour_position
    got = np.asarray(img.rois["MeshOnly"].compute_mask()) > 0
    # ray-parity voxelization of the discrete surface is BIT-EXACT
    # against the source mask
    np.testing.assert_array_equal(got, base_mask)
    res = evaluate_constraints(dose, {"MeshOnly": ["Dmean >= 10Gy"]},
                               image_name=image_name)
    assert np.isfinite(res[0]["value"])


def test_goal_parse_errors(dose_setup):
    image_name, dose = dose_setup
    for bad in ["Dfoo <= 10Gy", "D95% >= 70%", "V20Gy <= 30Gy",
                "V20% <= 30%", "Dmax ~ 50Gy", "50Gy <= Dmax",
                "D105% >= 10Gy"]:
        with pytest.raises(ValueError):
            evaluate_constraints(dose, {"PTV": [bad]},
                                 image_name=image_name)


def test_partial_dose_grid_coverage(dose_setup):
    """ROI voxels outside the dose grid count as 0 Gy in the metrics —
    the result must carry the coverage fraction and warn, so a V-goal
    cannot silently pass on a padded denominator."""
    import types
    import warnings as _warnings

    image_name, _ = dose_setup
    img = Data.image[image_name]
    # dose grid covering only image slices z >= 5 (origin shifted +5 mm
    # along z), uniform 60 Gy
    cropped_like = types.SimpleNamespace(
        plane=img.plane, spacing=np.asarray(img.spacing, float),
        orientation=np.asarray(img.orientation, float),
        origin=np.asarray(img.origin, float) + np.array([0.0, 0.0, 5.0]),
        matrix=np.asarray(img.matrix, float), frame_ref=img.frame_ref)
    cropped = register_dose_grid(np.full((5, 20, 20), 60.0, np.float32),
                                 cropped_like, name="Cropped")

    # ROI occupies z 2..7 -> z 5..7 covered = 300 of 600 voxels
    vals, cov = cropped.compute_roi_dose_array(image_name, "PTV",
                                               return_coverage=True)
    assert cov == pytest.approx(0.5)
    assert vals.size == 600

    with pytest.warns(UserWarning, match="inside the dose grid"):
        res = evaluate_constraints(cropped, {"PTV": ["V30Gy <= 60%"]},
                                   image_name=image_name)
    assert res[0]["dose_grid_coverage"] == pytest.approx(0.5)
    # the metric itself is still the raw (biased) number: 50% pass
    assert res[0]["value"] == pytest.approx(50.0)

    # fully covered dose: coverage 1.0 and NO warning
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        res_full = evaluate_constraints("Plan", {"PTV": ["Dmean >= 40Gy"]},
                                        image_name=image_name)
    assert res_full[0]["dose_grid_coverage"] == pytest.approx(1.0)
