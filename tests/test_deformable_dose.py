"""Deformable registration, DVF ops, REG/RTDOSE ingest, DVH tests."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import (Dataset, Sequence, dcmwrite,
                                            generate_uid, uids)

from helpers import write_ct_series


def make_blob(shape=(12, 32, 32), center=(6, 16, 16), sigma=(3, 6, 6)):
    zz, yy, xx = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    return 1000 * np.exp(-(((zz - center[0]) / sigma[0]) ** 2
                           + ((yy - center[1]) / sigma[1]) ** 2
                           + ((xx - center[2]) / sigma[2]) ** 2))


def test_warp_invert_roundtrip(rng):
    from medicalimageanalysis_tpu.ops.registration.dvf import (
        invert_dvf, warp_volume)
    vol = make_blob().astype(np.float32)
    dvf = np.zeros(vol.shape + (3,), np.float32)
    dvf[..., 0] = 2.0  # constant shift in x (mm = voxels here)
    warped = np.asarray(warp_volume(vol, dvf, (1, 1, 1)))
    # warp samples at x+2: warped(x) = vol(x+2) -> content moves -x
    np.testing.assert_allclose(warped[:, :, 5], vol[:, :, 7], atol=1e-3)
    inv = invert_dvf(dvf, (1, 1, 1))
    np.testing.assert_allclose(inv[..., 0][3:-3, 3:-3, 3:-3], -2.0,
                               atol=0.05)


def test_demons_recovers_translation():
    from medicalimageanalysis_tpu.ops.registration.demons import (
        demons_registration)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume
    fixed = make_blob().astype(np.float32) / 1000.0
    moving = np.roll(fixed, shift=2, axis=2)  # moved +x by 2 voxels
    dvf = demons_registration(fixed, moving, (1, 1, 1), method="fast",
                              iterations=60, std=1.0)
    warped = np.asarray(warp_volume(moving, dvf, (1, 1, 1)))
    err_before = np.abs(moving - fixed).mean()
    err_after = np.abs(warped - fixed).mean()
    assert err_after < 0.35 * err_before


def test_bspline_recovers_translation():
    from medicalimageanalysis_tpu.ops.registration.bspline import (
        bspline_registration)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume
    fixed = make_blob().astype(np.float32) / 1000.0
    moving = np.roll(fixed, shift=2, axis=1)
    dvf, losses = bspline_registration(
        fixed, moving, (1, 1, 1), control_spacing=[8, 8, 8],
        iterations=80, lr=0.5)
    warped = np.asarray(warp_volume(moving, dvf, (1, 1, 1)))
    err_before = np.abs(moving - fixed).mean()
    err_after = np.abs(warped - fixed).mean()
    assert err_after < 0.4 * err_before
    assert losses[-1] < losses[0]


@pytest.fixture
def two_images(tmp_path):
    base = make_blob().astype(np.int16)
    moved = np.roll(base, shift=2, axis=2)
    write_ct_series(tmp_path / "a", base, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", moved, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    names = sorted(Data.image_list)
    ct = [n for n in names if Data.image[n].modality == "CT"][0]
    mr = [n for n in names if Data.image[n].modality == "MR"][0]
    return ct, mr


def test_deformable_object_demons(two_images):
    ct, mr = two_images
    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[])
    assert deform.deformable_name == f"DVF_{ct}_{mr}"
    deform.compute_demons(method="demons", modality_gradient=False,
                          iterations=40, crop=0)
    assert deform.dvf.shape[-1] == 3
    out = deform.create_image()
    fixed = Data.image[ct].array.astype(np.float32)
    moving = Data.image[mr].array.astype(np.float32)
    interior = np.s_[2:-2, 4:-4, 4:-4]
    err_before = np.abs(moving - fixed)[interior].mean()
    err_after = np.abs(out["array"] - fixed)[interior].mean()
    assert err_after < 0.6 * err_before


def test_deformable_display_grid(two_images):
    ct, mr = two_images
    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[])
    deform.compute_demons(modality_gradient=False, iterations=10, crop=0)
    deform.display.compute_deformation(division=2)
    assert len(deform.display.array) == 2
    grid = deform.retrieve_grid(slice_plane="Axial", vector="x")
    assert grid.shape == deform.dvf.shape[1:3]


def write_reg_file(path, ref_info, mov_info, matrix):
    ds = Dataset()
    ds.SOPClassUID = uids.SpatialRegistrationStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "REG"
    ds.PatientID = "MRN001"

    def series_item(info):
        item = Dataset()
        item.SeriesInstanceUID = info["series_uid"]
        refs = Sequence()
        for sop in info["sops"]:
            r = Dataset()
            r.ReferencedSOPClassUID = uids.CTImageStorage
            r.ReferencedSOPInstanceUID = sop
            refs.append(r)
        item.ReferencedInstanceSequence = refs
        return item

    ds.ReferencedSeriesSequence = Sequence(
        [series_item(ref_info), series_item(mov_info)])

    def reg_item(m):
        mat_item = Dataset()
        mat_item.FrameOfReferenceTransformationMatrix = [
            float(v) for v in np.asarray(m).reshape(-1)]
        mat_item.FrameOfReferenceTransformationMatrixType = "RIGID"
        mreg = Dataset()
        mreg.MatrixSequence = Sequence([mat_item])
        item = Dataset()
        item.MatrixRegistrationSequence = Sequence([mreg])
        return item

    ds.RegistrationSequence = Sequence(
        [reg_item(np.eye(4)), reg_item(matrix)])
    dcmwrite(path, ds)


def test_read_reg_rigid(tmp_path, rng):
    arr = rng.integers(0, 100, size=(4, 16, 16)).astype(np.int16)
    info_a = write_ct_series(tmp_path / "a", arr)
    info_b = write_ct_series(tmp_path / "b", arr, modality="MR")
    m = np.eye(4)
    m[:3, 3] = [5.0, -3.0, 2.0]
    write_reg_file(tmp_path / "reg.dcm", info_a, info_b, m)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.rigid_list) == 1
    rigid = Data.rigid[Data.rigid_list[0]]
    # stored moving matrix is the inverse of the file matrix
    np.testing.assert_allclose(rigid.matrix, np.linalg.inv(m), atol=1e-5)


def write_rtdose_file(path, dose_array, ref_info, scaling=0.001):
    ds = Dataset()
    ds.SOPClassUID = uids.RTDoseStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "RTDOSE"
    ds.PatientID = "MRN001"
    ds.FrameOfReferenceUID = ref_info["frame"]
    ds.ImagePositionPatient = [float(v) for v in ref_info["origin"]]
    ds.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    ds.PixelSpacing = [float(ref_info["spacing"][1]),
                       float(ref_info["spacing"][0])]
    ds.SliceThickness = ref_info["thickness"]
    ds.GridFrameOffsetVector = [
        float(i * ref_info["thickness"])
        for i in range(dose_array.shape[0])]
    ds.DoseGridScaling = scaling
    ds.DoseUnits = "GY"
    ds.DoseType = "PHYSICAL"
    ds.DoseSummationType = "PLAN"
    ds.NumberOfFrames = dose_array.shape[0]
    ds.Rows = dose_array.shape[1]
    ds.Columns = dose_array.shape[2]
    ds.BitsAllocated = 32
    ds.BitsStored = 32
    ds.HighBit = 31
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelData = dose_array.astype("<u4").tobytes()
    dcmwrite(path, ds)


def test_read_rtdose_and_dvh(tmp_path, rng):
    from helpers import square_contour_mm, write_rtstruct
    arr = rng.integers(-500, 500, size=(8, 24, 24)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr, spacing=(1, 1),
                           thickness=2.0)
    rois = {"Target": [(square_contour_mm(info, z, 6, 14), z)
                       for z in range(2, 6)]}
    write_rtstruct(tmp_path / "ct" / "rs.dcm", info, rois)

    dose_raw = np.full((8, 24, 24), 20000, np.uint32)  # 20 Gy at 0.001
    dose_raw[2:6, 6:15, 6:15] = 60000                  # 60 Gy in target
    write_rtdose_file(tmp_path / "ct" / "rd.dcm", dose_raw, info)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert Data.dose_list == ["RTDOSE 01"]
    dose = Data.dose["RTDOSE 01"]
    assert dose.array.shape == (8, 24, 24)
    np.testing.assert_allclose(dose.array[0, 0, 0], 20.0, atol=1e-3)

    stats = dose.compute_roi_dose_statistics("CT 01", "Target")
    assert stats["ROI"] == "Target"
    # target voxels all at 60 Gy
    assert stats["Dmax"] == pytest.approx(60.0, abs=0.1)
    assert stats["Dmean"] == pytest.approx(60.0, abs=1.0)
    assert stats["D95"] <= stats["D5"]
    assert stats["VS50Gy_percent"] < 10.0
    assert stats["Volume (cc)"] == pytest.approx(
        9 * 9 * 4 * (1 * 1 * 2) / 1000.0, rel=0.1)


def test_dvh_matches_numpy(rng):
    from medicalimageanalysis_tpu.ops.dvh import dvh_statistics
    dose = rng.uniform(0, 70, size=5000).astype(np.float32)
    stats = dvh_statistics(dose, 0.001, roi_name="X")
    assert stats["Dmin"] == pytest.approx(float(dose.min()), abs=1e-3)
    assert stats["Dmax"] == pytest.approx(float(dose.max()), abs=1e-3)
    assert stats["Dmean"] == pytest.approx(float(dose.mean()), abs=1e-2)
    for d in (5, 50, 95):
        assert stats[f"D{d}"] == pytest.approx(
            float(np.percentile(dose, 100 - d)), abs=0.1)
    mask = dose < 30
    assert stats["VS30Gy_percent"] == pytest.approx(
        mask.mean() * 100, abs=0.1)


def test_deformable_object_bspline(two_images):
    ct, mr = two_images
    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[])
    deform.compute_bspline(modality_gradient=False,
                           control_spacing=[8, 8, 8], iterations=50,
                           crop=0)
    assert deform.dvf.shape[-1] == 3
    out = deform.create_image()
    fixed = Data.image[ct].array.astype(np.float32)
    moving = Data.image[mr].array.astype(np.float32)
    interior = np.s_[2:-2, 4:-4, 4:-4]
    err_before = np.abs(moving - fixed)[interior].mean()
    err_after = np.abs(out["array"] - fixed)[interior].mean()
    assert err_after < 0.8 * err_before


def test_deformable_rigid_pre_transform(two_images):
    """compute_demons with a rigid pre-matrix still stores a usable DVF
    and update_rois applies the inverse rigid first."""
    ct, mr = two_images
    pre = np.eye(4)
    pre[:3, 3] = [1.0, 0.0, 0.0]
    deform = mia.Deformable(reference_name=ct, moving_name=mr,
                            roi_names=[], rigid_matrix=pre)
    deform.compute_demons(modality_gradient=False, iterations=10, crop=0)
    assert np.asarray(deform.rigid_matrix)[0, 3] == 1.0
    out = deform.create_image()
    assert out["array"].shape == Data.image[ct].array.shape


def test_read_reg_deformable(tmp_path, rng):
    """Deformable DICOM REG: PreDeformationMatrix + VectorGridData
    unpack into a registered Deformable."""
    import struct as pystruct
    arr = rng.integers(0, 100, size=(4, 16, 16)).astype(np.int16)
    info_a = write_ct_series(tmp_path / "a", arr)
    info_b = write_ct_series(tmp_path / "b", arr, modality="MR")

    dvf = rng.normal(0, 1.0, size=(4, 8, 8, 3)).astype("<f4")

    ds = Dataset()
    ds.SOPClassUID = uids.DeformableSpatialRegistrationStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "REG"
    ds.PatientID = "MRN001"

    def series_item(info):
        item = Dataset()
        item.SeriesInstanceUID = info["series_uid"]
        refs = Sequence()
        for sop in info["sops"]:
            r = Dataset()
            r.ReferencedSOPInstanceUID = sop
            refs.append(r)
        item.ReferencedInstanceSequence = refs
        return item

    ds.ReferencedSeriesSequence = Sequence(
        [series_item(info_a), series_item(info_b)])

    pre = Dataset()
    m = np.eye(4)
    m[:3, 3] = [1.0, 2.0, 3.0]
    pre.FrameOfReferenceTransformationMatrix = [
        float(v) for v in m.reshape(-1)]
    grid = Dataset()
    grid.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    grid.ImagePositionPatient = [-10.0, -20.0, -30.0]
    grid.GridDimensions = [8, 8, 4]          # (x, y, z)
    grid.GridResolution = [2.0, 2.0, 5.0]
    grid.VectorGridData = dvf.tobytes()
    dreg = Dataset()
    dreg.PreDeformationMatrixRegistrationSequence = Sequence([pre])
    dreg.DeformableRegistrationGridSequence = Sequence([grid])
    ds.DeformableRegistrationSequence = Sequence([dreg])
    dcmwrite(tmp_path / "dreg.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.deformable_list) == 1
    deform = Data.deformable[Data.deformable_list[0]]
    assert deform.dvf.shape == (4, 8, 8, 3)
    np.testing.assert_allclose(deform.dvf, dvf, atol=1e-6)
    np.testing.assert_allclose(deform.rigid_matrix, np.linalg.inv(m),
                               atol=1e-6)
    np.testing.assert_allclose(deform.spacing, [2.0, 2.0, 5.0])


def test_compute_biomechanical(tmp_path, rng):
    """Linear-elastic demons (implemented; the reference reserved an
    empty stub): recovers a shift like fast demons while producing a
    LOWER-divergence (more tissue-like) field."""
    from medicalimageanalysis_tpu.ops.registration.demons import (
        demons_registration)

    Z, Y, X = 16, 32, 32
    zz, yy, xx = np.mgrid[0:Z, 0:Y, 0:X].astype(np.float32)
    fixed = np.exp(-(((zz - 8) / 3) ** 2 + ((yy - 16) / 6) ** 2
                     + ((xx - 16) / 6) ** 2)).astype(np.float32)
    moving = np.roll(fixed, (0, 2, -2), axis=(0, 1, 2))

    def div_energy(d):
        return float(np.mean((np.gradient(d[..., 0], axis=2)
                              + np.gradient(d[..., 1], axis=1)
                              + np.gradient(d[..., 2], axis=0)) ** 2))

    d_bio = demons_registration(fixed, moving, (1., 1., 1.),
                                method="biomechanical", iterations=25,
                                elastic_lambda=0.4)
    d_none = demons_registration(fixed, moving, (1., 1., 1.),
                                 method="biomechanical", iterations=25,
                                 elastic_lambda=0.0)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume
    w = np.asarray(warp_volume(moving, d_bio, (1., 1., 1.)))
    mse0 = float(np.mean((fixed - moving) ** 2))
    mse1 = float(np.mean((fixed - w) ** 2))
    assert mse1 < 0.6 * mse0
    # isolating the elastic step (same method, lambda 0.4 vs 0): the
    # regularizer must reduce the field's divergence energy
    assert div_energy(d_bio) < div_energy(d_none)


def test_advanced_split_watertight(rng):
    """advanced_split refines oversized faces without changing the
    surface (volume preserved; no T-junctions by construction)."""
    from medicalimageanalysis_tpu.utils.mesh.surface import Refinement
    from medicalimageanalysis_tpu.utils.mesh.trimesh import box_mesh

    mesh = box_mesh([0, 0, 0], [10, 6, 4])
    # stretch one face set by perturbing nothing — box faces are uneven
    ref = Refinement(mesh)
    out = ref.advanced_split(area_factor=1.0, max_rounds=3)
    assert out.faces.shape[0] > mesh.faces.shape[0]
    np.testing.assert_allclose(out.volume, mesh.volume, rtol=1e-6)
    areas_before = None  # silence linters


def test_retrieve_vtk_volume(tmp_path, rng):
    """Identity display -> base bundle; rotated display -> resliced
    identity-direction grid (the reference's version is broken)."""
    from helpers import write_ct_series
    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.data import Data

    arr = rng.integers(0, 500, size=(8, 16, 16)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr)
    mia.read_dicoms(folder_path=str(tmp_path / "ct"))
    img = Data.image[Data.image_list[-1]]
    bundle = img.retrieve_vtk_volume()
    assert (np.asarray(bundle["array"]) == np.asarray(img.array)).all()
    img.update_rotation(r_z=15)
    rot = img.retrieve_vtk_volume()
    assert rot["array"].shape != (0,)
    np.testing.assert_allclose(rot["direction"], np.eye(3))
    assert rot["array"].shape[1] > arr.shape[1]  # autocrop grew the grid


def test_compute_dose_statistics_whole_grid():
    """Whole-grid dose stats (implemented; reference reserved a stub)."""
    from medicalimageanalysis_tpu.structure.dose import Dose

    class H:
        pass
    h = H()
    from medicalimageanalysis_tpu.dicom import Dataset
    h.array = np.full((4, 8, 8), 2.0, np.float32)
    h.image_set = [Dataset()]
    h.plane = "Axial"
    h.spacing = np.array([1.0, 1.0, 2.5])
    h.origin = np.zeros(3)
    h.dimensions = np.array([8, 8, 4])
    h.orientation = [1, 0, 0, 0, 1, 0]
    h.image_matrix = np.eye(3)
    h.dose_name = "Dose 01"
    h.modality = "RTDOSE"
    h.unverified = []
    h.filepaths = []
    h.sops = []
    d = Dose(h)
    stats = d.compute_dose_statistics()
    assert stats["mean"] == 2.0 and stats["max"] == 2.0
    np.testing.assert_allclose(stats["grid_volume_cc"],
                               4 * 8 * 8 * 2.5 / 1000.0)
    np.testing.assert_allclose(stats["integral_gy_cc"],
                               2.0 * 4 * 8 * 8 * 2.5 / 1000.0)


def test_bspline_moving_mask_gates_loss(rng):
    """moving_mask warps with the image (ITK semantics): corrupted
    intensities outside the mask must not pollute the fit."""
    from medicalimageanalysis_tpu.ops.registration.bspline import (
        bspline_registration)

    zz, yy, xx = np.mgrid[0:16, 0:32, 0:32].astype(np.float32)
    fixed = (np.exp(-(((zz - 8) / 4) ** 2 + ((yy - 16) / 6) ** 2
                      + ((xx - 16) / 6) ** 2)) * 100).astype(np.float32)
    moving = np.roll(fixed, shift=2, axis=2)
    mmask = np.ones_like(moving)
    # corrupt a corner of the moving image and mask it out
    moving2 = moving.copy()
    moving2[:4, :8, :8] = 500.0
    mmask[:4, :8, :8] = 0.0
    dvf, losses = bspline_registration(
        fixed, moving2, control_spacing=[8, 8, 8], iterations=40,
        moving_mask=mmask)
    assert losses[-1] < losses[0]
    interior = dvf[4:-4, 8:-8, 8:-8]
    assert abs(interior[..., 0].mean() - 2.0) < 1.0


def test_mi_chunked_joint_matches_dense(rng):
    """The chunked/rematerialized MI joint histogram must equal the
    dense matmul path (values and gradients)."""
    import jax
    import jax.numpy as jnp
    from medicalimageanalysis_tpu.models import rigid_intensity as ri

    v = rng.random(5000).astype(np.float32)
    r = rng.random(5000).astype(np.float32)
    w = (rng.random(5000) > 0.2).astype(np.float32)

    dense = ri._mi_joint(jnp.asarray(v), jnp.asarray(r), jnp.asarray(w))
    old = ri._MI_CHUNK
    try:
        ri._MI_CHUNK = 512          # force the scan path + padding
        chunked = ri._mi_joint(jnp.asarray(v), jnp.asarray(r),
                               jnp.asarray(w))
        gd = jax.grad(lambda x: jnp.sum(
            ri._metric_loss("mi", x, jnp.asarray(r), jnp.asarray(w))))(
                jnp.asarray(v))
    finally:
        ri._MI_CHUNK = old
    gd2 = jax.grad(lambda x: jnp.sum(
        ri._metric_loss("mi", x, jnp.asarray(r), jnp.asarray(w))))(
            jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd2),
                               atol=1e-4)


def test_demons_pyramid_recovers_large_shift(rng):
    """Multi-resolution demons (beyond-parity) recovers a deformation
    far outside the single-level capture range."""
    from medicalimageanalysis_tpu.ops.registration.demons import (
        demons_registration)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume

    zz, yy, xx = np.mgrid[0:24, 0:48, 0:48].astype(np.float32)
    fixed = (np.exp(-(((zz - 12) / 5) ** 2 + ((yy - 24) / 9) ** 2
                      + ((xx - 24) / 9) ** 2)) * 100).astype(np.float32)
    moving = np.roll(fixed, shift=7, axis=2)

    kw = dict(method="fast", iterations=25, std=1)
    dvf_single = demons_registration(fixed, moving, **kw)
    dvf_pyr = demons_registration(fixed, moving, pyramid=(4, 2, 1), **kw)
    assert dvf_pyr.shape == fixed.shape + (3,)

    def resid(d):
        w = np.asarray(warp_volume(moving, d, (1, 1, 1)))
        return float(np.abs(w - fixed)[4:-4, 8:-8, 8:-8].mean())

    base = float(np.abs(moving - fixed)[4:-4, 8:-8, 8:-8].mean())
    r_pyr = resid(dvf_pyr)
    assert r_pyr < 0.25 * base, (r_pyr, base)
    # and it must beat the single-level run on this large shift
    assert r_pyr < resid(dvf_single)


def test_elastix_mi_recovers_deformation_cross_modality():
    """Elastix-parity multi-res Mattes-MI B-spline: a CT<->'MR' pair
    (inverted contrast, so MSE would fail) recovers a known smooth
    deformation (VERDICT r2 next #7). The phantom is TEXTURED
    (smoothed noise): MI on a radially-symmetric blob is degenerate —
    any intensity-shell-preserving warp maximizes it — exactly like
    real featureless regions, which real elastix also cannot anchor."""
    from scipy.ndimage import gaussian_filter as _gf

    from medicalimageanalysis_tpu.ops.registration.bspline import (
        elastix_registration)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume

    rng = np.random.default_rng(3)
    anat = _gf(rng.normal(size=(16, 48, 48)), (1.5, 3, 3))         .astype(np.float32)
    fixed = (anat - anat.min()) / (anat.max() - anat.min()) * 1000
    # known smooth deformation: 2-voxel y shift
    moving_ct = np.roll(fixed, shift=2, axis=1)
    # fake MR: inverted + rescaled contrast (monotone transform -> MI
    # sees the structure, MSE does not)
    m = moving_ct.max()
    moving_mr = (m - moving_ct) * 0.37 + 11.0

    dvf, losses = elastix_registration(
        fixed, moving_mr, (1, 1, 1), metric="mi", bins=32,
        resolutions=2, final_grid_spacing=12.0, iterations=150, lr=0.2)
    assert dvf.shape == fixed.shape + (3,)
    # warp the ORIGINAL (non-inverted) moving with the field: if the
    # geometry was recovered, it matches fixed
    warped = np.asarray(warp_volume(moving_ct, dvf, (1, 1, 1)))
    inner = np.s_[2:-2, 4:-4, 4:-4]
    err_before = np.abs(moving_ct - fixed)[inner].mean()
    err_after = np.abs(warped - fixed)[inner].mean()
    assert err_after < 0.05 * err_before
    assert losses[-1] < losses[0]


def test_elastix_parameter_map_keys():
    """Elastix-style parameter maps (one-element string lists) are
    honored (reference simpleitk.py:155-166 key set)."""
    from medicalimageanalysis_tpu.ops.registration.bspline import (
        elastix_registration)

    fixed = make_blob().astype(np.float32) / 1000.0
    moving = np.roll(fixed, shift=1, axis=2)
    pm = {
        "Metric": ["AdvancedMeanSquares"],
        "NumberOfHistogramBins": ["16"],
        "NumberOfResolutions": ["2"],
        "FinalGridSpacingInPhysicalUnits": ["8"],
        "MaximumNumberOfIterations": ["60"],
    }
    dvf, losses = elastix_registration(fixed, moving, (1, 1, 1),
                                       parameter_map=pm)
    # 2 resolutions x 60 iterations of recorded losses
    assert losses.shape[0] == 120
    assert dvf.shape == fixed.shape + (3,)
    assert losses[-1] < losses[0]


def test_deformable_jax_elastix_api(two_images):
    """DeformableJAX.elastix drives the real multi-res path through
    the reference API surface."""
    ct, mr = two_images
    from medicalimageanalysis_tpu.utils.deformable.jax_backend import (
        DeformableJAX)

    ref = Data.image[ct]
    mov = Data.image[mr]
    dj = DeformableJAX(
        reference_image=ref.create_volume(),
        moving_image=mov.create_volume())
    out = dj.elastix(metric="Intensity", resolution=2, spacing=12,
                     iterations=60, crop=0)
    assert out["array"].shape == tuple(ref.dimensions) + (3,)


def test_update_dose_warps_through_dvf(tmp_path):
    """Deformable.update_dose: a dose block tied to the moving image
    lands on the reference grid shifted by the field. Integer-voxel
    constant translation makes the trilinear warp exact."""
    base = make_blob(shape=(8, 24, 24)).astype(np.int16)
    moved = np.roll(base, shift=2, axis=2)  # moving(x) = base(x-2)
    ct_info = write_ct_series(tmp_path / "a", base, spacing=(1, 1),
                              thickness=2.0)
    mr_info = write_ct_series(tmp_path / "b", moved, spacing=(1, 1),
                              thickness=2.0, modality="MR")

    dose_raw = np.zeros((8, 24, 24), np.uint32)
    dose_raw[2:6, 6:15, 10:16] = 40000  # 40 Gy block on the MR grid
    write_rtdose_file(tmp_path / "b" / "rd.dcm", dose_raw,
                      {"frame": mr_info["frame"],
                       "origin": mr_info["origin"],
                       "spacing": mr_info["spacing"],
                       "thickness": 2.0})

    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]

    ref = Data.image[ct]
    # point-displacement field moving -> reference: -2 mm in x
    dvf = np.zeros(tuple(ref.dimensions) + (3,), np.float32)
    dvf[..., 0] = -2.0
    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])

    out = deform.update_dose()  # auto-matches via MR FrameOfReference
    assert out["dose_name"] == "RTDOSE 01"
    expected = np.zeros((8, 24, 24), np.float32)
    expected[2:6, 6:15, 8:14] = 40.0
    np.testing.assert_allclose(out["array"], expected, atol=1e-2)


def test_accumulate_dose_registers_summed_grid(tmp_path):
    """accumulate_dose: deformably-warped + rigidly-resampled
    contributions sum with weights, and the registered Dose drives the
    existing DVH analytics unchanged."""
    from helpers import square_contour_mm, write_rtstruct

    base = make_blob(shape=(8, 24, 24)).astype(np.int16)
    moved = np.roll(base, shift=2, axis=2)
    ct_info = write_ct_series(tmp_path / "a", base, spacing=(1, 1),
                              thickness=2.0)
    mr_info = write_ct_series(tmp_path / "b", moved, spacing=(1, 1),
                              thickness=2.0, modality="MR")
    rois = {"Target": [(square_contour_mm(ct_info, z, 8, 14), z)
                       for z in range(2, 6)]}
    write_rtstruct(tmp_path / "a" / "rs.dcm", ct_info, rois)

    # fraction dose on the MR grid (block covering the shifted target)
    frac = np.zeros((8, 24, 24), np.uint32)
    frac[2:6, 6:16, 8:18] = 30000  # 30 Gy
    write_rtdose_file(tmp_path / "b" / "rd.dcm", frac,
                      {"frame": mr_info["frame"],
                       "origin": mr_info["origin"],
                       "spacing": mr_info["spacing"],
                       "thickness": 2.0})
    # plan dose already on the CT grid
    plan = np.zeros((8, 24, 24), np.uint32)
    plan[2:6, 6:16, 6:16] = 20000  # 20 Gy
    write_rtdose_file(tmp_path / "a" / "rd.dcm", plan,
                      {"frame": ct_info["frame"],
                       "origin": ct_info["origin"],
                       "spacing": ct_info["spacing"],
                       "thickness": 2.0})

    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    mr_frame = Data.image[mr].frame_ref
    frac_name = [n for n in Data.dose_list
                 if Data.dose[n].frame_ref == mr_frame][0]
    plan_name = [n for n in Data.dose_list if n != frac_name][0]

    ref = Data.image[ct]
    dvf = np.zeros(tuple(ref.dimensions) + (3,), np.float32)
    dvf[..., 0] = -2.0
    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])

    from medicalimageanalysis_tpu.utils import accumulate_dose
    acc = accumulate_dose(ct, [plan_name,
                               (frac_name, deform.deformable_name)],
                          weights=[1.0, 0.5])
    assert acc.dose_name in Data.dose_list
    # plan 20 Gy + 0.5 * warped 30 Gy where blocks overlap
    expected = np.zeros((8, 24, 24), np.float32)
    expected[2:6, 6:16, 6:16] += 20.0
    expected[2:6, 6:16, 6:16] += 15.0
    np.testing.assert_allclose(acc.array, expected, atol=1e-2)

    stats = acc.compute_roi_dose_statistics(ct, "Target")
    assert stats["Dmax"] == pytest.approx(35.0, abs=0.5)

    # register=False returns the plain volume bundle
    vol = accumulate_dose(ct, [plan_name], register=False)
    np.testing.assert_allclose(
        vol["array"][2:6, 6:16, 6:16], 20.0, atol=1e-2)


def test_create_rtdose_round_trip(tmp_path, rng=None):
    """Dose.create_rtdose: exported RTDOSE re-ingests with identical
    geometry and dose values (scaling quantization ~max/4e9)."""
    rng = np.random.default_rng(11)
    arr = rng.integers(-500, 500, size=(8, 24, 24)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr, spacing=(1, 1),
                           thickness=2.0)
    dose_raw = np.zeros((8, 24, 24), np.uint32)
    dose_raw[2:6, 6:15, 6:15] = 61234  # 61.234 Gy
    write_rtdose_file(tmp_path / "ct" / "rd.dcm", dose_raw, info)
    mia.read_dicoms(folder_path=str(tmp_path))
    src = Data.dose["RTDOSE 01"]

    out_dir = tmp_path / "export"
    out_dir.mkdir()
    ds = src.create_rtdose(path=str(out_dir / "rd_acc.dcm"),
                           dose_summation_type="MULTI_PLAN")
    assert ds.DoseSummationType == "MULTI_PLAN"

    Data.clear()
    mia.read_dicoms(folder_path=str(out_dir))
    assert len(Data.dose_list) == 1
    back = Data.dose[Data.dose_list[0]]
    np.testing.assert_allclose(np.asarray(back.array),
                               np.asarray(src.array), atol=1e-4)
    np.testing.assert_allclose(back.origin, src.origin, atol=1e-6)
    np.testing.assert_allclose(back.spacing, src.spacing, atol=1e-6)
    np.testing.assert_allclose(back.matrix, src.matrix, atol=1e-6)
    assert back.frame_ref == src.frame_ref


def test_rtdose_descending_offsets_normalized(tmp_path):
    """A multi-frame RTDOSE whose GridFrameOffsetVector descends
    (frames stacked against the orientation normal) ingests with the
    slab at the correct physical z (review finding: the reader assumed
    ascending stacking and mirrored such grids)."""
    rng = np.random.default_rng(5)
    arr = rng.integers(-500, 500, size=(8, 24, 24)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr, spacing=(1, 1),
                           thickness=2.0)

    # ascending reference: slab in frames 2..4 -> z index 2..4
    dose_up = np.zeros((8, 24, 24), np.uint32)
    dose_up[2:5, 6:15, 6:15] = 40000
    write_rtdose_file(tmp_path / "ct" / "rd_up.dcm", dose_up, info)

    # same physical dose, descending storage: frame k at
    # IPP + gfov[k]*normal with gfov = [0,-2,...]; IPP at the TOP
    # slice. Physical slab occupies the same z range when the frame
    # order is reversed and IPP moved to the last frame + offsets.
    ds_path = tmp_path / "ct" / "rd_down.dcm"
    import copy as _copy
    dose_down = dose_up[::-1].copy()
    info_top = dict(info)
    info_top = {k: (np.array(v, copy=True) if isinstance(v, np.ndarray)
                    else v) for k, v in info.items()}
    top_origin = np.asarray(info["origin"], float).copy()
    top_origin[2] = top_origin[2] + 7 * 2.0  # IPP of the last slice
    info_top["origin"] = top_origin
    write_rtdose_file(ds_path, dose_down, info_top)
    # rewrite the offsets descending
    from medicalimageanalysis_tpu.dicom import dcmread, dcmwrite
    d = dcmread(str(ds_path))
    d.GridFrameOffsetVector = [-2.0 * i for i in range(8)]
    dcmwrite(str(ds_path), d)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.dose_list) == 2
    up = Data.dose[Data.dose_list[0]]
    down = Data.dose[Data.dose_list[1]]
    np.testing.assert_allclose(np.asarray(down.array),
                               np.asarray(up.array), atol=1e-6)
    np.testing.assert_allclose(down.origin, up.origin, atol=1e-6)


def test_create_rtdose_rejects_negative(tmp_path):
    rng = np.random.default_rng(6)
    arr = rng.integers(-500, 500, size=(6, 16, 16)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr, spacing=(1, 1),
                           thickness=2.0)
    dose_raw = np.full((6, 16, 16), 1000, np.uint32)
    write_rtdose_file(tmp_path / "ct" / "rd.dcm", dose_raw, info)
    mia.read_dicoms(folder_path=str(tmp_path))
    dose = Data.dose["RTDOSE 01"]
    dose.array = np.asarray(dose.array) - 2.0  # dose difference
    with pytest.raises(ValueError, match="negative"):
        dose.create_rtdose()


def test_update_dose_ambiguous_requires_name(tmp_path):
    """Two doses in the moving frame: auto-match must refuse, not
    silently pick the first (review finding)."""
    base = make_blob(shape=(8, 24, 24)).astype(np.int16)
    moved = np.roll(base, shift=2, axis=2)
    write_ct_series(tmp_path / "a", base, spacing=(1, 1), thickness=2.0)
    mr_info = write_ct_series(tmp_path / "b", moved, spacing=(1, 1),
                              thickness=2.0, modality="MR")
    blk = np.zeros((8, 24, 24), np.uint32)
    blk[2:6, 6:15, 10:16] = 40000
    for fname in ("rd1.dcm", "rd2.dcm"):
        write_rtdose_file(tmp_path / "b" / fname, blk,
                          {"frame": mr_info["frame"],
                           "origin": mr_info["origin"],
                           "spacing": mr_info["spacing"],
                           "thickness": 2.0})
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    ref = Data.image[ct]
    dvf = np.zeros(tuple(ref.dimensions) + (3,), np.float32)
    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])
    with pytest.raises(ValueError, match="multiple doses"):
        deform.update_dose()
    out = deform.update_dose(dose_name="RTDOSE 01")
    assert out["dose_name"] == "RTDOSE 01"


def test_accumulate_dose_name_reuse_no_duplicate(tmp_path):
    """Re-running accumulate_dose with the same explicit name replaces
    the registered dose without duplicating dose_list (review
    finding)."""
    rng = np.random.default_rng(8)
    arr = rng.integers(-500, 500, size=(6, 16, 16)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr, spacing=(1, 1),
                           thickness=2.0)
    dose_raw = np.full((6, 16, 16), 1000, np.uint32)
    write_rtdose_file(tmp_path / "ct" / "rd.dcm", dose_raw, info)
    mia.read_dicoms(folder_path=str(tmp_path))

    from medicalimageanalysis_tpu.utils import accumulate_dose
    accumulate_dose("CT 01", ["RTDOSE 01"], name="Acc")
    acc2 = accumulate_dose("CT 01", ["RTDOSE 01"], weights=[2.0],
                           name="Acc")
    assert Data.dose_list.count("Acc") == 1
    np.testing.assert_allclose(np.asarray(Data.dose["Acc"].array),
                               np.asarray(acc2.array))
    np.testing.assert_allclose(float(np.asarray(acc2.array).max()),
                               2.0, atol=1e-4)


def test_rigid_create_reg_round_trip(tmp_path, rng):
    """Rigid.create_reg: exported Spatial Registration re-ingests as a
    Rigid with the identical matrix."""
    arr = rng.integers(0, 100, size=(4, 16, 16)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr)
    write_ct_series(tmp_path / "b", arr, modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]

    m = np.eye(4)
    m[:3, :3] = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0],
                          [0.0, 0.0, 1.0]])
    m[:3, 3] = [5.0, -3.0, 2.0]
    rigid = mia.Rigid(ct, mr, matrix=m)
    rigid.create_reg(path=str(tmp_path / "reg.dcm"))

    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.rigid_list) == 1
    back = Data.rigid[Data.rigid_list[0]]
    np.testing.assert_allclose(back.matrix, m, atol=1e-6)


def test_deformable_create_reg_round_trip(tmp_path, rng):
    """Deformable.create_reg: exported Deformable Spatial Registration
    re-ingests with identical DVF, grid and pre-rigid."""
    arr = rng.integers(0, 100, size=(4, 16, 16)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    ref = Data.image[ct]

    dvf = rng.normal(0, 1.5, size=tuple(ref.dimensions) + (3,)) \
        .astype(np.float32)
    rig = np.eye(4)
    rig[:3, 3] = [1.0, 2.0, 3.0]
    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            rigid_matrix=rig,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])
    deform.create_reg(path=str(tmp_path / "dreg.dcm"))

    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.deformable_list) == 1
    back = Data.deformable[Data.deformable_list[0]]
    np.testing.assert_allclose(back.dvf, dvf, atol=1e-6)
    np.testing.assert_allclose(back.rigid_matrix, rig, atol=1e-6)
    np.testing.assert_allclose(back.spacing, ref.spacing, atol=1e-6)
    np.testing.assert_allclose(back.origin, ref.origin, atol=1e-6)


def test_update_mask_integer_shift(tmp_path):
    """Deformable.update_mask: a constant integer-voxel field maps a
    rectangular mask exactly (trilinear at integer offsets)."""
    base = make_blob(shape=(8, 24, 24)).astype(np.int16)
    moved = np.roll(base, shift=2, axis=2)
    write_ct_series(tmp_path / "a", base, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", moved, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]
    ref = Data.image[ct]

    dvf = np.zeros(tuple(ref.dimensions) + (3,), np.float32)
    dvf[..., 0] = -2.0
    deform = mia.Deformable(dvf=dvf, origin=ref.origin,
                            spacing=ref.spacing,
                            dimensions=ref.dimensions,
                            reference_name=ct, moving_name=mr,
                            roi_names=[])
    mask = np.zeros((8, 24, 24), np.uint8)
    mask[2:6, 6:15, 10:16] = 1
    out = deform.update_mask(mask)
    expected = np.zeros_like(mask)
    expected[2:6, 6:15, 8:14] = 1
    np.testing.assert_array_equal(out, expected)

    with pytest.raises(ValueError, match="mask shape"):
        deform.update_mask(np.zeros((4, 4, 4), np.uint8))


def test_create_rtdose_coronal_grid_round_trip(tmp_path):
    """create_rtdose on a coronal-acquired grid: the writer must emit
    pixel-axis geometry for the canonical (z, y, x) array (same fix
    class as export_dicom)."""
    from medicalimageanalysis_tpu.utils import accumulate_dose
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    rng = np.random.default_rng(13)
    arr = rng.integers(-500, 500, size=(6, 16, 16)).astype(np.int16)
    gen = CreateDicomImage(str(tmp_path / "ct"), arr,
                           origin=[-50, -60, -40], spacing=[1.0, 1.0],
                           thickness=2.0)
    gen.orientation = [1, 0, 0, 0, 0, -1]  # coronal acquisition
    gen.run()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    info = {"frame": img.frame_ref, "origin": img.origin,
            "spacing": [float(img.spacing[0]), float(img.spacing[1])],
            "thickness": float(img.spacing[2])}
    dose_raw = np.zeros(img.array.shape, np.uint32)
    dose_raw[3:9, 2:5, 6:15] = 45000
    write_rtdose_file(tmp_path / "ct" / "rd.dcm", dose_raw, info)
    mia.read_dicoms(folder_path=str(tmp_path))
    src = Data.dose["RTDOSE 01"]

    # accumulate onto the coronal-acquired CT (post-FFS the grid is
    # canonical; the writer's matrix-derived IOP must round-trip it)
    acc = accumulate_dose("CT 01", ["RTDOSE 01"], name="Acc")

    out = tmp_path / "export"
    out.mkdir()
    acc.create_rtdose(path=str(out / "rd.dcm"))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    back = Data.dose[Data.dose_list[0]]
    np.testing.assert_allclose(np.asarray(back.array),
                               np.asarray(src.array), atol=1e-4)
    np.testing.assert_allclose(back.origin, src.origin, atol=1e-6)
    np.testing.assert_allclose(back.matrix, src.matrix, atol=1e-6)


def test_dose_save_load_round_trip(tmp_path):
    """Dose.save_image -> Dose.load_image (NEW load side): grid,
    geometry, and DVH analytics survive; collisions suffix."""
    from medicalimageanalysis_tpu.structure.dose import Dose
    from medicalimageanalysis_tpu.dicom import Dataset

    Data.clear()

    class H:
        pass
    h = H()
    h.array = np.linspace(0, 60, 4 * 8 * 8).reshape(4, 8, 8) \
        .astype(np.float32)
    h.image_set = [Dataset()]
    h.plane = "Axial"
    h.spacing = np.array([2.0, 2.0, 2.5])
    h.origin = np.array([-10.0, -20.0, -5.0])
    h.dimensions = np.array([4, 8, 8])
    h.orientation = [1, 0, 0, 0, 1, 0]
    h.image_matrix = np.eye(3)
    h.dose_name = "RTDOSE 01"
    h.modality = "RTDOSE"
    h.filepaths, h.sops, h.unverified = [], [], []
    d = Dose(h)
    Data.dose["RTDOSE 01"] = d
    Data.dose_list += ["RTDOSE 01"]
    d.save_image(str(tmp_path))

    Data.clear()
    d2 = Dose.load_image(str(tmp_path / "RTDOSE 01"))
    assert Data.dose_list == ["RTDOSE 01"]
    np.testing.assert_allclose(d2.array, h.array)
    np.testing.assert_allclose(d2.origin, h.origin)
    np.testing.assert_allclose(d2.spacing, h.spacing)
    s1 = d2.compute_dose_statistics()
    assert s1["max"] == pytest.approx(60.0)
    # collision suffixing
    d3 = Dose.load_image(str(tmp_path / "RTDOSE 01"))
    assert d3.dose_name == "RTDOSE 01_1"
    assert Data.dose_list == ["RTDOSE 01", "RTDOSE 01_1"]
    Data.clear()


def test_deformable_save_load_round_trip(tmp_path):
    """Deformable.save_deformable -> load_deformable (NEW load side):
    DVF + geometry + rigid pre-transform survive."""
    Data.clear()
    rng = np.random.default_rng(5)
    dvf = rng.normal(0, 1.5, size=(4, 8, 8, 3)).astype(np.float32)
    rigid = np.eye(4)
    rigid[0, 3] = 2.5
    deform = mia.Deformable(
        dvf=dvf, origin=np.array([0.0, 0.0, 0.0]),
        spacing=(2.0, 2.0, 2.0), dimensions=np.array([4, 8, 8]),
        rigid_matrix=rigid, registration_name="DVF_saved",
        roi_names=[])
    deform.save_deformable(str(tmp_path / "defo"))

    Data.clear()
    d2 = mia.Deformable.load_deformable(str(tmp_path / "defo"))
    assert Data.deformable_list == ["DVF_saved"]
    np.testing.assert_allclose(d2.dvf, dvf)
    np.testing.assert_allclose(d2.rigid_matrix, rigid)
    np.testing.assert_allclose(np.asarray(d2.spacing), 2.0)
    qa = d2.compute_jacobian()
    assert np.isfinite(qa["det_mean"])
    # collision: loading again suffixes the SAVED name (provenance
    # kept — not a re-derived generic 'DVF_{ref}_{mov}' name)
    d3 = mia.Deformable.load_deformable(str(tmp_path / "defo"))
    assert d3.deformable_name == "DVF_saved_1"
    Data.clear()


def test_elastix_staged_pipeline_rotation_plus_deformation():
    """Multi-stage elastix parameter maps (VERDICT r3 #7): an
    EulerTransform stage (phase-correlation auto-initialized) warm-
    starting a BSplineTransform stage recovers a 14-voxel offset +
    6 deg rotation + smooth deformation on a CT<->'MR' pair. The
    single-stage B-spline cannot fix this from identity: the offset is
    far outside the multi-resolution FFD's capture range. Matches the
    reference's SimpleElastix vector-of-maps form
    (/root/reference/medicalimageanalysis/utils/deformable/simpleitk.py:131-176)."""
    from scipy.ndimage import gaussian_filter as _gf
    from scipy.ndimage import map_coordinates as _mc

    from medicalimageanalysis_tpu.ops.registration.bspline import (
        elastix_registration)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume

    rng = np.random.default_rng(5)
    anat = _gf(rng.normal(size=(16, 48, 48)), (1.5, 3, 3)).astype(
        np.float32)
    fixed = (anat - anat.min()) / (anat.max() - anat.min()) * 1000

    # true motion: 6 deg in-plane rotation about the center, +14 voxel
    # y / +6 voxel x offset, + a smooth sinusoidal y deformation
    th = np.deg2rad(6.0)
    cz, cy, cx = [(s - 1) / 2.0 for s in fixed.shape]
    zz, yy, xx = np.mgrid[0:16, 0:48, 0:48].astype(np.float64)
    xr = np.cos(th) * (xx - cx) - np.sin(th) * (yy - cy) + cx + 6.0
    yr = (np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy) + cy + 14.0
          + 1.5 * np.sin(2 * np.pi * xx / 48.0))
    # moving(v) = fixed(T_true v): the registration must find
    # p + d(p) ~ T_true^{-1} p
    moving_ct = _mc(fixed, [zz, yr, xr], order=1, mode="nearest"
                    ).astype(np.float32)
    m = moving_ct.max()
    moving_mr = (m - moving_ct) * 0.41 + 7.0  # inverted-contrast 'MR'

    stages = [
        {"Transform": ["EulerTransform"],
         "Metric": ["AdvancedMattesMutualInformation"],
         "NumberOfResolutions": ["3"],
         "MaximumNumberOfIterations": ["180"]},
        {"Transform": ["BSplineTransform"],
         "Metric": ["AdvancedMattesMutualInformation"],
         "NumberOfHistogramBins": ["32"],
         "NumberOfResolutions": ["2"],
         "FinalGridSpacingInPhysicalUnits": ["12"],
         "MaximumNumberOfIterations": ["100"]},
    ]
    dvf_staged, losses = elastix_registration(
        fixed, moving_mr, (1, 1, 1), parameter_map=stages, metric="mi")
    assert dvf_staged.shape == fixed.shape + (3,)
    assert losses.size > 0

    # single-stage B-spline from identity on the same pair
    dvf_single, _ = elastix_registration(
        fixed, moving_mr, (1, 1, 1), metric="mi", bins=32,
        resolutions=2, final_grid_spacing=12.0, iterations=100)

    # evaluate on the band whose true correspondence stays inside the
    # moving volume (the recovered displacement is ~(-6, -14) voxels,
    # so low-y/low-x fixed rows map outside moving) so the metric
    # scores alignment, not resample fill
    inner = np.s_[2:-2, 18:-2, 10:-2]

    def err(dvf):
        warped = np.asarray(warp_volume(moving_ct, dvf, (1, 1, 1)))
        return np.abs(warped - fixed)[inner].mean()

    err_before = np.abs(moving_ct - fixed)[inner].mean()
    e_staged = err(dvf_staged)
    e_single = err(dvf_single)
    # staged recovers; single-stage must be left far behind
    assert e_staged < 0.2 * err_before, (e_staged, err_before)
    assert e_staged < 0.5 * e_single, (e_staged, e_single)


def test_elastix_staged_map_validation():
    from medicalimageanalysis_tpu.ops.registration.bspline import (
        elastix_registration)

    fixed = make_blob().astype(np.float32)
    with pytest.raises(ValueError, match="unsupported Transform"):
        elastix_registration(fixed, fixed, (1, 1, 1),
                             parameter_map=[{"Transform": ["Warp"]}])
    two_b = [{"Transform": ["BSplineTransform"]}] * 2
    with pytest.raises(ValueError, match="at most one"):
        elastix_registration(fixed, fixed, (1, 1, 1),
                             parameter_map=two_b)
    wrong_order = [{"Transform": ["BSplineTransform"]},
                   {"Transform": ["EulerTransform"]}]
    with pytest.raises(ValueError, match="must be last"):
        elastix_registration(fixed, fixed, (1, 1, 1),
                             parameter_map=wrong_order)


def test_elastix_staged_differing_shapes_no_crash():
    """Staged maps with different fixed/moving grids: the phase-
    correlation auto-init silently skips (it needs matching shapes)
    and the descent still runs (round-4 review finding: this raised)."""
    from medicalimageanalysis_tpu.ops.registration.bspline import (
        elastix_registration)

    fixed = make_blob(shape=(8, 24, 24)).astype(np.float32)
    moving = np.pad(np.roll(fixed, 1, axis=2), ((0, 0), (0, 2), (0, 2)))
    stages = [
        {"Transform": ["EulerTransform"],
         "NumberOfResolutions": ["2"],
         "MaximumNumberOfIterations": ["30"]},
        {"Transform": ["BSplineTransform"],
         "NumberOfResolutions": ["1"],
         "FinalGridSpacingInPhysicalUnits": ["8"],
         "MaximumNumberOfIterations": ["20"]},
    ]
    dvf, losses = elastix_registration(fixed, moving, (1, 1, 1),
                                       parameter_map=stages,
                                       metric="mse")
    assert dvf.shape == fixed.shape + (3,)
    assert np.isfinite(dvf).all()
