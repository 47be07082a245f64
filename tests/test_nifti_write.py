"""NIfTI writer round-trip tests (BEYOND-PARITY writer half of the
NIfTI codec — DL-pipeline interchange)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.read.nifti import (read_nifti_volume,
                                                 write_nifti_volume)

from helpers import write_ct_series


def test_nifti_write_read_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(-1000, 2000, size=(5, 12, 10)).astype(np.int16)
    spacing = [0.9, 1.1, 2.5]
    origin = [-50.0, -60.5, 12.25]
    matrix = np.eye(3)
    for ext in ("vol.nii", "vol.nii.gz"):
        p = tmp_path / ext
        write_nifti_volume(p, arr, spacing, origin, matrix)
        back, sp, org, mat = read_nifti_volume(p)
        np.testing.assert_array_equal(back, arr)
        np.testing.assert_allclose(sp, spacing, atol=1e-5)
        np.testing.assert_allclose(org, origin, atol=1e-4)
        np.testing.assert_allclose(mat, matrix, atol=1e-6)


def test_nifti_float_and_direction_round_trip(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.normal(0, 1e5, size=(4, 8, 8)).astype(np.float32)
    # non-identity right-handed direction (x/y swap + z flip... keep
    # orthonormal): rotate 90 deg about z
    matrix = np.array([[0.0, 1.0, 0.0],
                       [-1.0, 0.0, 0.0],
                       [0.0, 0.0, 1.0]])
    p = tmp_path / "f.nii.gz"
    write_nifti_volume(p, arr, [1.5, 2.0, 3.0], [1.0, 2.0, 3.0],
                       matrix)
    back, sp, org, mat = read_nifti_volume(p)
    np.testing.assert_array_equal(back, arr)  # float32 exact
    np.testing.assert_allclose(sp, [1.5, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(mat, matrix, atol=1e-6)


def test_image_create_nifti_and_reingest(tmp_path):
    """CT -> create_nifti -> read_nifti lands on the identical patient
    grid (the TotalSegmentator hand-off)."""
    rng = np.random.default_rng(3)
    arr = rng.integers(-500, 1500, size=(6, 16, 16)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(0.8, 0.8),
                    thickness=2.5)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    img.create_nifti(str(tmp_path / "ct.nii.gz"))

    mia.read_nifti(str(tmp_path / "ct.nii.gz"),
                   image_name="FromNifti")
    img2 = Data.image["FromNifti"]
    np.testing.assert_array_equal(np.asarray(img2.array),
                                  np.asarray(img.array))
    np.testing.assert_allclose(img2.origin, img.origin, atol=1e-4)
    np.testing.assert_allclose(img2.spacing, img.spacing, atol=1e-5)
    np.testing.assert_allclose(img2.matrix, img.matrix, atol=1e-6)

    # aligned value maps (e.g. a mask) export too; mismatched raise
    mask = (np.asarray(img.array) > 0).astype(np.uint8)
    img.create_nifti(str(tmp_path / "mask.nii.gz"), values=mask)
    back, _, _, _ = read_nifti_volume(tmp_path / "mask.nii.gz")
    np.testing.assert_array_equal(back, mask)
    with pytest.raises(ValueError, match="values shape"):
        img.create_nifti(str(tmp_path / "x.nii"),
                         values=np.zeros((1, 2, 3)))


def test_anisotropic_export_round_trips(tmp_path):
    """Anisotropic in-plane spacing survives BOTH exporters exactly
    (review finding: export_dicom wrote PixelSpacing [sx, sy] — the
    DICOM convention is [row=sy, col=sx] — so x/y pixel sizes swapped
    on every anisotropic export; invisible to isotropic fixtures)."""
    rng = np.random.default_rng(5)
    arr = rng.integers(-500, 1500, size=(4, 10, 12)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(0.5, 1.25),
                    thickness=2.0)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    np.testing.assert_allclose(img.spacing, [0.5, 1.25, 2.0])

    out = tmp_path / "dcm"
    img.export_dicom(str(out))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    img2 = Data.image["CT 01"]
    np.testing.assert_allclose(img2.spacing, [0.5, 1.25, 2.0])
    np.testing.assert_array_equal(np.asarray(img2.array), arr)
    np.testing.assert_allclose(img2.origin, img.origin, atol=1e-6)

    img2.create_nifti(str(tmp_path / "v.nii.gz"))
    back, sp, org, mat = read_nifti_volume(tmp_path / "v.nii.gz")
    np.testing.assert_allclose(sp, [0.5, 1.25, 2.0], atol=1e-5)
    np.testing.assert_array_equal(back, arr)


def test_nifti_bool_and_int64_maps(tmp_path):
    """bool masks (cast to uint8) and int64 label maps write (review
    finding: the documented mask-export case died on default integer
    dtypes)."""
    labels = np.zeros((3, 6, 6), np.int64)
    labels[1, 2:4, 2:4] = 7
    p = tmp_path / "labels.nii"
    write_nifti_volume(p, labels, [1, 1, 1], [0, 0, 0], np.eye(3))
    back, _, _, _ = read_nifti_volume(p)
    np.testing.assert_array_equal(back, labels)

    mask = labels > 0
    p2 = tmp_path / "mask.nii"
    write_nifti_volume(p2, mask, [1, 1, 1], [0, 0, 0], np.eye(3))
    back2, _, _, _ = read_nifti_volume(p2)
    np.testing.assert_array_equal(back2, mask.astype(np.uint8))


def test_nifti_byte_flip_fuzz(tmp_path):
    """Byte-flip fuzz of writer output through read_nifti: corrupt
    files raise clean typed errors (ValueError/OSError naming the
    problem), never segfault-adjacent garbage or unrelated exceptions
    — same contract as the DICOM/MHD/3MF fuzz programs."""
    rng = np.random.default_rng(21)
    arr = rng.integers(-500, 1500, size=(4, 10, 10)).astype(np.int16)
    src = tmp_path / "v.nii"
    write_nifti_volume(src, arr, [1, 1, 2], [0, 0, 0], np.eye(3))
    good = src.read_bytes()

    mut = tmp_path / "mut.nii"
    for trial in range(150):
        blob = bytearray(good)
        for _ in range(int(rng.integers(1, 12))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        mut.write_bytes(bytes(blob))
        Data.clear()
        try:
            mia.read_nifti(str(mut))
        except (ValueError, OSError, EOFError):
            pass  # typed rejection is the contract
    Data.clear()
