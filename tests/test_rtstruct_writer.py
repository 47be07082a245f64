"""RTSTRUCT writer round trip (create_rtstruct implemented vs the
reference's empty stub)."""

import numpy as np

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data

from helpers import square_contour_mm, write_ct_series, write_rtstruct


def test_rtstruct_write_read_roundtrip(tmp_path, rng):
    arr = rng.integers(-500, 1000, size=(8, 24, 24)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr)
    rois = {"Liver": [(square_contour_mm(info, z, 4, 12), z)
                      for z in range(2, 6)]}
    pois = {"Isocenter": [-90.0, -110.0, -45.0]}
    write_rtstruct(tmp_path / "ct" / "rs.dcm", info, rois, pois)
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    original = [np.asarray(c) for c in
                img.rois["Liver"].contour_position]

    out_path = tmp_path / "rs_out.dcm"
    ds = img.create_rtstruct(path=str(out_path))
    assert ds.StructureSetROISequence[0].ROIName == "Liver"

    # re-ingest: CT series + our written RTSTRUCT in a fresh registry
    Data.clear()
    files = [str(p) for p in (tmp_path / "ct").glob("*.dcm")
             if p.name != "rs.dcm"] + [str(out_path)]
    mia.read_dicoms(file_list=files)
    img2 = Data.image["CT 01"]
    assert "Liver" in img2.rois
    assert "Isocenter" in img2.pois
    restored = img2.rois["Liver"].contour_position
    assert len(restored) == len(original)
    for a, b in zip(original, restored):
        np.testing.assert_allclose(a, b, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(img2.pois["Isocenter"].point_position).reshape(-1),
        [-90.0, -110.0, -45.0], atol=1e-3)

    # mask parity between the two ingests
    m1 = img.rois["Liver"] if False else None
    mask2 = img2.rois["Liver"].compute_mask()
    expected = np.zeros((8, 24, 24), np.uint8)
    expected[2:6, 4:13, 4:13] = 1
    np.testing.assert_array_equal(mask2, expected)
