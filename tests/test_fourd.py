"""4D-CT ingest (phase splitting) + AIP/MIP/ITV utilities.

The reference grouper (reference read/dicom.py:218-382) only splits on
AcquisitionNumber, so a gated series with every couch position repeated
K times inside one acquisition collapses into a stack of duplicate
positions. These tests pin the phase-splitting grouper
(read/dicom.py:_split_temporal_phases) and the 4D utilities built on it.
"""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import generate_uid
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage
from medicalimageanalysis_tpu.utils.fourd import (combine_phases,
                                                  compute_itv,
                                                  find_phase_groups)

K, NZ, NY, NX = 3, 10, 24, 24


def _phase_volume(k):
    """Background -1000 with a 200-HU sphere shifted +3 px in y per
    phase."""
    vol = np.full((NZ, NY, NX), -1000, np.int16)
    zz, yy, xx = np.mgrid[0:NZ, 0:NY, 0:NX]
    c = (NZ // 2, 6 + 3 * k, NX // 2)
    sphere = ((zz - c[0]) ** 2 * 4 + (yy - c[1]) ** 2
              + (xx - c[2]) ** 2) <= 16
    vol[sphere] = 200
    return vol


def _write_4d(folder, tag_mode):
    """Write K phases into ONE series / ONE AcquisitionNumber."""
    study, series, frame = generate_uid(), generate_uid(), generate_uid()
    folder.mkdir(exist_ok=True)
    vols = []
    for k in range(K):
        vol = _phase_volume(k)
        vols.append(vol)
        gen = CreateDicomImage(folder, vol, study=study, series=series,
                               frame=frame, origin=[0, 0, 0],
                               spacing=[1, 1], thickness=2.0)
        if tag_mode == "tpi":
            extra = {"TemporalPositionIdentifier": str(k + 1),
                     "NumberOfTemporalPositions": str(K)}
        elif tag_mode == "trigger":
            extra = {"TriggerTime": f"{k * 500.0:.1f}"}
        else:
            extra = {}
        gen.run(modality="CT", extra_tags=extra, instance_offset=k * NZ)
    return vols


@pytest.mark.parametrize("tag_mode", ["tpi", "trigger", "fallback"])
def test_phase_split(tmp_path, tag_mode):
    vols = _write_4d(tmp_path / "ct4d", tag_mode)
    mia.read_dicoms(folder_path=str(tmp_path / "ct4d"))

    assert len(Data.image_list) == K
    for k, name in enumerate(Data.image_list):
        img = Data.image[name]
        assert img.unverified is None
        assert not img.skipped_slice
        np.testing.assert_array_equal(img.dimensions, [NZ, NY, NX])
        np.testing.assert_allclose(img.spacing, [1, 1, 2.0])
        np.testing.assert_allclose(img.origin, [0, 0, 0])
        np.testing.assert_array_equal(img.array, vols[k])

    groups = find_phase_groups()
    assert groups == [list(Data.image_list)]


def test_ragged_duplicates_not_split(tmp_path, rng):
    """Only SOME locations repeated: no phase split is attempted (the
    irregular-spacing machinery owns that case) and ingest survives."""
    folder = tmp_path / "ctrag"
    folder.mkdir()
    study, series, frame = generate_uid(), generate_uid(), generate_uid()
    arr = rng.integers(-100, 100, size=(6, 16, 16)).astype(np.int16)
    gen = CreateDicomImage(folder, arr, study=study, series=series,
                           frame=frame, origin=[0, 0, 0],
                           spacing=[1, 1], thickness=2.0)
    gen.run(modality="CT")
    # one extra duplicate slice at z=0 only
    gen2 = CreateDicomImage(folder, arr[:1], study=study, series=series,
                            frame=frame, origin=[0, 0, 0],
                            spacing=[1, 1], thickness=2.0)
    gen2.run(modality="CT", instance_offset=6)
    report = mia.read_dicoms(folder_path=str(folder))
    assert report is not None  # tolerant ingest, no crash


def test_combine_phases_and_itv(tmp_path):
    vols = _write_4d(tmp_path / "ct4d", "tpi")
    mia.read_dicoms(folder_path=str(tmp_path / "ct4d"))
    names = find_phase_groups()[0]

    aip = combine_phases(names, method="mean")
    assert aip.image_name in Data.image_list
    assert aip.array.dtype == np.int16
    np.testing.assert_array_equal(
        aip.array, np.rint(np.mean(np.stack(vols).astype(np.float32),
                                   axis=0)).astype(np.int16))
    np.testing.assert_allclose(aip.spacing, [1, 1, 2.0])
    np.testing.assert_array_equal(aip.dimensions, [NZ, NY, NX])

    mip = combine_phases(names, method="mip")
    np.testing.assert_array_equal(mip.array, np.max(np.stack(vols), axis=0))
    # name collision suffixing
    mip2 = combine_phases(names, method="mip")
    assert mip2.image_name != mip.image_name

    # per-phase GTV = the sphere; ITV = union across phases on the AIP
    union = np.zeros((NZ, NY, NX), bool)
    for k, n in enumerate(names):
        img = Data.image[n]
        mask = np.asarray(vols[k]) == 200
        img.create_roi(name="GTV", color=[255, 0, 0])
        img.rois["GTV"].convert_mask(mask)
        union |= np.asarray(img.rois["GTV"].compute_mask()) > 0

    itv = compute_itv(names, "GTV", target=aip.image_name)
    assert "ITV_GTV" in aip.rois
    got = np.asarray(aip.rois["ITV_GTV"].compute_mask()) > 0
    inter = np.logical_and(got, union).sum()
    dice = 2.0 * inter / (got.sum() + union.sum())
    assert dice > 0.98
    # the union across phases is strictly bigger than any single phase
    assert got.sum() > (np.asarray(
        Data.image[names[0]].rois["GTV"].compute_mask()) > 0).sum()
    assert itv.name == "ITV_GTV"


def test_fourd_error_branches(tmp_path):
    vols = _write_4d(tmp_path / "ct4d", "tpi")
    mia.read_dicoms(folder_path=str(tmp_path / "ct4d"))
    names = find_phase_groups()[0]
    with pytest.raises(ValueError, match="method"):
        combine_phases(names, method="median")
    with pytest.raises(ValueError, match="at least 2"):
        combine_phases(names[:1])
    with pytest.raises(KeyError, match="no ROI"):
        compute_itv(names, "Missing")


def test_itv_resamples_to_different_grid(tmp_path):
    """A geometrically different target grid (e.g. a coarser planning
    CT) gets the union mask RESAMPLED onto it — a dims-only check used
    to transplant the voxels onto the wrong physical location whenever
    the shapes happened to agree."""
    from medicalimageanalysis_tpu.utils.creation import CreateImageFromMask

    vols = _write_4d(tmp_path / "ct4d", "tpi")
    mia.read_dicoms(folder_path=str(tmp_path / "ct4d"))
    names = find_phase_groups()[0]
    union = np.zeros((NZ, NY, NX), bool)
    for k, n in enumerate(names):
        img = Data.image[n]
        img.create_roi(name="GTV", color=[255, 0, 0])
        img.rois["GTV"].convert_mask(np.asarray(vols[k]) == 200)
        union |= np.asarray(img.rois["GTV"].compute_mask()) > 0

    # coarser target: 2 mm in-plane / same z pitch, half the rows/cols
    coarse = CreateImageFromMask(
        np.zeros((NZ, NY // 2, NX // 2), np.int16), [0.0, 0.0, 0.0],
        [2.0, 2.0, 2.0], "Planning", plane="Axial", modality="CT")
    coarse.add_image()
    itv = compute_itv(names, "GTV", target="Planning")
    got = np.asarray(Data.image["Planning"].rois["ITV_GTV"]
                     .compute_mask()) > 0
    assert got.any()
    # centroids agree in PHYSICAL mm (x, y, z)
    fine_img = Data.image[names[0]]
    c_fine = np.mean(np.argwhere(union)[:, ::-1]
                     * np.asarray(fine_img.spacing), axis=0)
    c_coarse = np.mean(np.argwhere(got)[:, ::-1] * 2.0, axis=0)
    np.testing.assert_allclose(c_coarse, c_fine, atol=1.5)
    # volumes agree to voxelization tolerance
    vol_fine = union.sum() * np.prod(np.asarray(fine_img.spacing))
    vol_coarse = got.sum() * 8.0
    assert abs(vol_coarse - vol_fine) / vol_fine < 0.35

    # a target that does not intersect the phases raises cleanly
    far = CreateImageFromMask(
        np.zeros((4, 8, 8), np.int16), [500.0, 500.0, 500.0],
        [1.0, 1.0, 1.0], "Far", plane="Axial", modality="CT")
    far.add_image()
    with pytest.raises(ValueError, match="does not intersect"):
        compute_itv(names, "GTV", target="Far")


def test_phase_split_corrupt_instance_number():
    """One unparseable InstanceNumber must not mix raw list indices
    with real InstanceNumbers in the fallback sort key (a corrupt
    slice would steal rank 0 of its couch-position block and land in
    the wrong phase): the whole stack falls back to enumeration
    order."""
    from medicalimageanalysis_tpu.dicom import Dataset
    from medicalimageanalysis_tpu.read.dicom import DicomReader

    def entry(z, instance):
        ds = Dataset()
        if instance is not None:
            ds.InstanceNumber = instance
        return (0, 1, 0, np.array([0.0, 0.0, float(z)]), ds)

    # acquisition order: phase 0 = IN 1..3, phase 1 = IN 4..6 with the
    # LAST slice's InstanceNumber corrupt
    sub = [entry(0, "1"), entry(2, "2"), entry(4, "3"),
           entry(0, "4"), entry(2, "5"), entry(4, "not-a-number")]
    groups = DicomReader._split_temporal_phases(None, sub, 2)
    assert len(groups) == 2
    # enumeration-order fallback keeps each written phase intact
    assert [id(e) for e in groups[0]] == [id(e) for e in sub[:3]]
    assert [id(e) for e in groups[1]] == [id(e) for e in sub[3:]]
