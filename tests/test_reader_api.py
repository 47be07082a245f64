"""reader.py API edge cases."""

import numpy as np

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data

from helpers import write_ct_series


def test_file_parser_buckets(tmp_path):
    for name in ("a.dcm", "b.mhd", "c.raw", "d.nii.gz", "e.stl",
                 "f.vtk", "g.3mf", "h.zip", "noext"):
        (tmp_path / name).write_bytes(b"x")
    files = mia.file_parser(folder_path=str(tmp_path))
    assert [len(files[k]) for k in
            ("Dicom", "MHD", "Raw", "Nifti", "Stl", "Vtk", "3mf",
             "Zip", "NoExtension")] == [1] * 9


def test_file_parser_exclude(tmp_path):
    (tmp_path / "a.dcm").write_bytes(b"x")
    (tmp_path / "b.dcm").write_bytes(b"x")
    files = mia.file_parser(folder_path=str(tmp_path),
                            exclude_files=[str(tmp_path / "a.dcm")])
    assert files["Dicom"] == [str(tmp_path / "b.dcm")]


def test_check_memory(tmp_path):
    (tmp_path / "a.dcm").write_bytes(b"x" * 1024)
    files = mia.file_parser(folder_path=str(tmp_path))
    remaining = mia.check_memory(files)
    assert remaining > 0  # machine has more than 1KB free


def test_clear_flag(tmp_path, rng):
    arr = rng.integers(0, 10, size=(2, 8, 8)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr)
    mia.read_dicoms(folder_path=str(tmp_path / "a"))
    assert len(Data.image_list) == 1
    # clear=False keeps the first image
    write_ct_series(tmp_path / "b", arr, modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path / "b"), clear=False)
    assert len(Data.image_list) == 2
    # clear=True wipes
    mia.read_dicoms(folder_path=str(tmp_path / "a"), clear=True)
    assert len(Data.image_list) == 1


def test_models_exports():
    from medicalimageanalysis_tpu import models
    assert callable(models.register_rigid_intensity)
    assert callable(models.bspline_registration)
    assert callable(models.demons_registration)


def test_delete_image(tmp_path, rng):
    arr = rng.integers(0, 10, size=(2, 8, 8)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr)
    mia.read_dicoms(folder_path=str(tmp_path))
    Data.delete_image("CT 01")
    assert Data.image_list == []
    assert Data.image == {}


def test_top_level_utils_reexport():
    """The reference does `from .utils import *` at top level
    (reference __init__.py:6) — those names resolve on the package."""
    import medicalimageanalysis_tpu as mia
    for name in ("ContourToDiscreteMesh", "ContourToMask", "MaskToContour",
                 "ModelToMask", "Volume", "Refinement", "DeformableITK"):
        assert getattr(mia, name) is not None
    import pytest
    with pytest.raises(AttributeError):
        mia.NotAThing


def test_match_pois_union_sync(tmp_path, rng):
    """match_pois injects stub POIs on images lacking them, propagating
    color/visibility (reference data.py:147-178)."""
    import numpy as np
    from helpers import write_ct_series
    arr = rng.integers(0, 100, size=(4, 16, 16)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr)
    write_ct_series(tmp_path / "b", arr, modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    names = sorted(Data.image_list)
    Data.image[names[0]].add_poi(poi_name="Isocenter", color=[255, 0, 0],
                                 visible=True, point=[1.0, 2.0, 3.0])
    assert "Isocenter" in Data.poi_list
    other = Data.image[names[1]]
    assert "Isocenter" in other.pois          # stub injected
    assert other.pois["Isocenter"].color == [255, 0, 0]
    assert other.pois["Isocenter"].point_position is None


def test_read_dicoms_zip_archive(tmp_path):
    """Zipped patient archives ingest directly: folder_path=*.zip and
    .zip entries in file_list both expand (BEYOND-PARITY; zip-slip
    members are skipped)."""
    import zipfile

    import numpy as np

    from helpers import write_ct_series

    rng = np.random.default_rng(9)
    arr = rng.integers(-200, 200, size=(4, 12, 12)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(1, 1), thickness=2.0)
    zpath = tmp_path / "patient.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((tmp_path / "ct").glob("*.dcm")):
            z.write(p, arcname=f"ct/{p.name}")
        # hostile member must be skipped, not extracted
        z.writestr("../evil.dcm", b"not dicom")

    Data.clear()
    mia.read_dicoms(folder_path=str(zpath))
    assert "CT 01" in Data.image
    np.testing.assert_array_equal(
        np.asarray(Data.image["CT 01"].array), arr)

    Data.clear()
    mia.read_dicoms(file_list=[str(zpath)])
    assert "CT 01" in Data.image
