"""Series grouping + FFS normalization edge cases."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage


def write_series(folder, arr, orientation, origin=(0, 0, 0),
                 thickness=2.0, series=None, acq="1", z_step=None,
                 start_index=0):
    """Slice writer with arbitrary IOP and per-slice IPP along the
    slice normal."""
    from medicalimageanalysis_tpu.dicom import (Dataset, FileMetaDataset,
                                                dcmwrite, generate_uid,
                                                uids)
    folder.mkdir(parents=True, exist_ok=True)
    series = series or generate_uid()
    frame = generate_uid()
    orientation = np.asarray(orientation, dtype=float)
    normal = np.cross(orientation[:3], orientation[3:])
    step = thickness if z_step is None else z_step
    for ii in range(arr.shape[0]):
        ds = Dataset()
        fm = FileMetaDataset()
        fm.add(0x00020002, "UI", uids.CTImageStorage)
        fm.add(0x00020003, "UI", f"{series}.{start_index + ii}")
        fm.add(0x00020010, "UI", uids.ExplicitVRLittleEndian)
        fm.add(0x00020012, "UI", "1.2.3.4")
        ds.file_meta = fm
        ds.SOPClassUID = uids.CTImageStorage
        ds.SOPInstanceUID = f"{series}.{start_index + ii}"
        ds.Modality = "CT"
        ds.PatientID = "G"
        ds.StudyInstanceUID = "9.9.9"
        ds.SeriesInstanceUID = series
        ds.FrameOfReferenceUID = frame
        ds.AcquisitionNumber = acq
        ds.InstanceNumber = str(start_index + ii + 1)
        ds.ImageOrientationPatient = [float(v) for v in orientation]
        pos = np.asarray(origin, dtype=float) + normal * step * ii
        ds.ImagePositionPatient = [float(v) for v in pos]
        ds.PixelSpacing = [1.0, 1.0]
        ds.SliceThickness = thickness
        ds.Rows, ds.Columns = arr.shape[1], arr.shape[2]
        ds.BitsAllocated = 16
        ds.BitsStored = 16
        ds.HighBit = 15
        ds.PixelRepresentation = 1
        ds.SamplesPerPixel = 1
        ds.PhotometricInterpretation = "MONOCHROME2"
        ds.RescaleIntercept = 0
        ds.RescaleSlope = 1
        ds.PixelData = arr[ii].astype("<i2").tobytes()
        dcmwrite(folder / f"{start_index + ii}.dcm", ds)
    return series


def test_two_orientations_split(tmp_path, rng):
    """Same SeriesInstanceUID, two orientations -> two images."""
    arr = rng.integers(0, 100, size=(3, 8, 8)).astype(np.int16)
    series = write_series(tmp_path / "a", arr, [1, 0, 0, 0, 1, 0])
    write_series(tmp_path / "b", arr, [0, 1, 0, 0, 0, -1],
                 series=series, start_index=10)
    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.image_list) == 2


def test_acquisition_merge(tmp_path, rng):
    """Two non-overlapping acquisitions with uniform gap merge into one
    volume (reference read/dicom.py:356-375)."""
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.int16)
    series = write_series(tmp_path / "a", arr, [1, 0, 0, 0, 1, 0],
                          origin=(0, 0, 0), thickness=2.0, acq="1")
    write_series(tmp_path / "b", arr, [1, 0, 0, 0, 1, 0],
                 origin=(0, 0, 8.0), thickness=2.0, acq="2",
                 series=series, start_index=10)
    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.image_list) == 1
    assert Data.image["CT 01"].array.shape == (8, 8, 8)


def test_acquisition_overlap_split(tmp_path, rng):
    """Overlapping acquisitions stay separate volumes."""
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.int16)
    series = write_series(tmp_path / "a", arr, [1, 0, 0, 0, 1, 0],
                          origin=(0, 0, 0), acq="1")
    write_series(tmp_path / "b", arr, [1, 0, 0, 0, 1, 0],
                 origin=(0, 0, 2.0), acq="2", series=series,
                 start_index=10)
    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.image_list) == 2


def test_coronal_series_ffs(tmp_path, rng):
    """Coronal acquisition (IOP [1,0,0,0,0,-1]) normalizes with the
    cor_rot1 move and coronal spacing permutation."""
    arr = rng.integers(0, 100, size=(6, 10, 12)).astype(np.int16)
    write_series(tmp_path / "c", arr, [1, 0, 0, 0, 0, -1],
                 origin=(0, 0, 0), thickness=3.0)
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    assert img.plane == "Coronal"
    # spacing: [inplane1, thickness(slice pitch), inplane0]
    np.testing.assert_allclose(img.spacing, [1.0, 3.0, 1.0])
    # FFS decision applied an array move (volume no longer (6, 10, 12))
    assert img.array is not None


def test_sagittal_series_plane(tmp_path, rng):
    arr = rng.integers(0, 100, size=(5, 10, 12)).astype(np.int16)
    write_series(tmp_path / "s", arr, [0, 1, 0, 0, 0, -1],
                 origin=(0, 0, 0), thickness=2.0)
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    assert img.plane == "Sagittal"
    np.testing.assert_allclose(img.spacing, [2.0, 1.0, 1.0])


def test_descending_slice_order_normalized(tmp_path, rng):
    """Slices written top-down (negative z step) still assemble in
    ascending z with correct origin."""
    arr = np.zeros((6, 8, 8), np.int16)
    for z in range(6):
        arr[z] = z
    write_series(tmp_path / "d", arr, [1, 0, 0, 0, 1, 0],
                 origin=(0, 0, 10.0), thickness=2.0, z_step=-2.0)
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    # slice at lowest z (0) is original index 5
    np.testing.assert_array_equal(img.array[0], 5 * np.ones((8, 8)))
    np.testing.assert_allclose(img.origin, [0, 0, 0])


def test_rasterize_coronal_sagittal_parity(rng):
    """Coronal/sagittal rasterization matches the cv2 backend."""
    from medicalimageanalysis_tpu.utils.convert.contour import (
        _rasterize_plane)
    dims = (10, 12, 14)
    for plane, axis in (("Coronal", 1), ("Sagittal", 2)):
        contours = []
        for s in (2, 5):
            # pixel contour (x, y, z) square in the plane
            if plane == "Coronal":
                poly = np.array([[2, s, 2], [9, s, 2], [9, s, 7],
                                 [2, s, 7]], float)
            else:
                poly = np.array([[s, 2, 2], [s, 9, 2], [s, 9, 7],
                                 [s, 2, 7]], float)
            contours.append(poly)
        dev = _rasterize_plane(contours, dims, plane, backend="device")
        gold = _rasterize_plane(contours, dims, plane, backend="cv2")
        np.testing.assert_array_equal(dev, gold)


def test_oblique_series_end_to_end(tmp_path, rng):
    """A 10-degree-oblique acquisition: geometry round trips, RTSTRUCT
    contours defined in oblique physical space rasterize onto the
    expected pixels."""
    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.ops import geometry as geo
    th = np.deg2rad(10.0)
    row = [np.cos(th), np.sin(th), 0.0]
    col = [-np.sin(th), np.cos(th), 0.0]
    orientation = row + col
    arr = rng.integers(0, 500, size=(6, 20, 20)).astype(np.int16)
    write_series(tmp_path / "ob", arr, orientation,
                 origin=(-10.0, -10.0, 0.0), thickness=2.0)
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    assert img.plane == "Axial"
    np.testing.assert_allclose(img.matrix[0], row, atol=1e-6)

    # pixel <-> position round trip through the oblique matrix
    p = img.compute_position([5, 7, 2])
    back = img.compute_pixel(p)
    np.testing.assert_array_equal(back, [5, 7, 2])

    # square contour at pixel coords 4..12 on slice 3, mapped to mm
    m = img.display.compute_matrix_pixel_to_position()
    corners_pix = np.array([[4, 4, 3], [12, 4, 3], [12, 12, 3],
                            [4, 12, 3]], float)
    contour_mm = geo.apply_homogeneous(corners_pix, m)
    img.add_roi(roi_name="Sq", contour=[contour_mm], color=[1, 2, 3])
    mask = img.rois["Sq"].compute_mask()
    expected = np.zeros_like(mask)
    expected[3, 4:13, 4:13] = 1
    np.testing.assert_array_equal(mask, expected)


def test_metadata_goldens_pinned(tmp_path, rng):
    """Golden metadata fixtures: exact spacing/origin/matrix values for
    canned oblique / sagittal / multi-acquisition series, pinning the
    FFS decisions against regression (round-2 audit item). Values
    captured after fixing the reference's non-unit direction-cosine
    rewrite (reference read/dicom.py:732-737; see PARITY.md)."""
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 1500, size=(6, 20, 24)).astype(np.int16)

    # oblique axial: 10 deg about x
    c, s = np.cos(np.deg2rad(10)), np.sin(np.deg2rad(10))
    write_series(tmp_path / "ob", arr, [1.0, 0.0, 0.0, 0.0, c, s],
                 origin=(12.5, -30.0, 44.0), thickness=3.0)
    mia.read_dicoms(folder_path=str(tmp_path / "ob"))
    img = Data.image[Data.image_list[-1]]
    assert img.plane == "Axial"
    np.testing.assert_allclose(img.spacing, [1.0, 1.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(img.origin, [12.5, -30.0, 44.0], atol=1e-9)
    np.testing.assert_allclose(
        img.matrix,
        [[1.0, 0.0, 0.0],
         [0.0, 0.984808, 0.173648],
         [0.0, -0.173648, 0.984808]], atol=1e-6)
    assert list(img.dimensions) == [6, 20, 24]

    # sagittal: IOP [0,1,0,0,0,-1], slices stepping -x
    write_series(tmp_path / "sag", arr, [0, 1, 0, 0, 0, -1],
                 origin=(-50.0, 10.0, 25.0), thickness=2.0)
    mia.read_dicoms(folder_path=str(tmp_path / "sag"), clear=False)
    img = Data.image[Data.image_list[-1]]
    assert img.plane == "Sagittal"
    np.testing.assert_allclose(img.spacing, [2.0, 1.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(img.origin, [-60.0, 10.0, 6.0], atol=1e-9)
    np.testing.assert_allclose(img.matrix, np.eye(3), atol=1e-9)
    assert list(img.dimensions) == [20, 24, 6]

    # coronal: IOP [1,0,0,0,0,-1], slices stepping +y; the canonical
    # rewrite flips the in-plane -z row, shifting origin z to
    # -(rows-1)*row_spacing + 18 = -1
    write_series(tmp_path / "cor", arr, [1, 0, 0, 0, 0, -1],
                 origin=(4.0, 30.0, 18.0), thickness=2.0)
    mia.read_dicoms(folder_path=str(tmp_path / "cor"), clear=False)
    img = Data.image[Data.image_list[-1]]
    assert img.plane == "Coronal"
    np.testing.assert_allclose(img.spacing, [1.0, 2.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(img.origin, [4.0, 30.0, -1.0], atol=1e-9)
    np.testing.assert_allclose(img.matrix, np.eye(3), atol=1e-9)
    assert list(img.dimensions) == [20, 6, 24]

    # every FFS-rewritten direction matrix must be orthonormal (the
    # fixed reference bug produced 23/24-scaled rows here)
    for name in Data.image_list:
        m = np.asarray(Data.image[name].matrix)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)

    # multi-acquisition uniform-gap merge keeps one canonical volume
    arr2 = rng.integers(0, 100, size=(4, 8, 8)).astype(np.int16)
    series = write_series(tmp_path / "m1", arr2, [1, 0, 0, 0, 1, 0],
                          origin=(1.0, 2.0, 3.0), thickness=2.0, acq="1")
    write_series(tmp_path / "m2", arr2, [1, 0, 0, 0, 1, 0],
                 origin=(1.0, 2.0, 11.0), thickness=2.0, acq="2",
                 series=series, start_index=10)
    before = set(Data.image_list)
    mia.read_dicoms(file_list=[str(p) for d in ("m1", "m2")
                               for p in sorted((tmp_path / d).iterdir())],
                    clear=False)
    name = [n for n in Data.image_list if n not in before][0]
    img = Data.image[name]
    assert img.array.shape == (8, 8, 8)
    np.testing.assert_allclose(img.origin, [1.0, 2.0, 3.0], atol=1e-9)
    np.testing.assert_allclose(img.spacing, [1.0, 1.0, 2.0], atol=1e-9)
    np.testing.assert_allclose(img.matrix, np.eye(3), atol=1e-9)


def test_rasterize_out_of_range_slices_match_cv2(rng):
    """Below-volume (negative) and above-volume slice indices must be
    DROPPED by the device path exactly like the cv2 backend's
    `if 0 <= s < S` (round-2 review finding: clip-to-0 XORed
    below-volume contours into slice 0)."""
    from medicalimageanalysis_tpu.utils.convert.contour import (
        _rasterize_plane)

    sq = np.array([[4.0, 4.0], [20.0, 4.0], [20.0, 18.0], [4.0, 18.0]])
    contours = []
    for z in (-3.0, -1.0, 2.0, 5.0, 9.0, 12.0):   # 2 below, 2 above
        contours.append(np.concatenate(
            [sq, np.full((4, 1), z)], axis=1))
    dims = [8, 32, 32]
    dev = _rasterize_plane(contours, dims, "Axial", backend="device")
    gold = _rasterize_plane(contours, dims, "Axial", backend="cv2")
    assert dev.shape == gold.shape
    np.testing.assert_array_equal(dev, gold)
    assert gold[0].sum() == 0          # nothing leaked into slice 0
    assert gold[2].sum() > 0 and gold[5].sum() > 0


def test_rasterize_concave_star_fuzz_matches_cv2(rng):
    """Concave random stars (many exact half-integer edge crossings
    from integer vertices) device vs cv2 — the tie-rule class the
    convex fuzz never hit (round-4 regression: the old both-ends-
    closed rule leaked one pixel per tie outside concave corners)."""
    from medicalimageanalysis_tpu.utils.convert.contour import (
        _rasterize_plane)

    dims = (6, 48, 56)
    for trial in range(20):
        r = np.random.default_rng(1000 + trial)
        n = int(r.integers(5, 28))
        th = np.sort(r.uniform(0, 2 * np.pi, n))
        rad = r.uniform(2.0, 18.0, n)
        cx, cy = r.uniform(20, 28, 2)  # whole star stays in-canvas
        z = int(r.integers(0, 6))
        poly = np.stack([cx + rad * np.cos(th), cy + rad * np.sin(th),
                         np.full(n, float(z))], axis=1)
        dev = _rasterize_plane([poly], dims, "Axial", backend="device")
        gold = _rasterize_plane([poly], dims, "Axial", backend="cv2")
        np.testing.assert_array_equal(dev, gold, err_msg=f"trial {trial}")


def test_rasterize_out_of_canvas_is_exact_crop():
    """A polygon extending past the canvas: cv2.fillPoly CLIPS the
    polygon to the canvas first, which re-quantizes the clipped edge
    and perturbs pixels far inside the image (its output depends on
    canvas size!). The device rasterizer keeps the exact unclipped
    geometry: its mask must equal the big-canvas cv2 result cropped —
    a FIXED reference artifact (PARITY.md deltas)."""
    import cv2

    from medicalimageanalysis_tpu.utils.convert.contour import (
        _rasterize_plane)

    star = np.array(
        [[42, 53], [38, 45], [36, 44], [19, 42], [24, 37], [31, 37],
         [32, 36], [37, 27], [45, 29]], float)
    poly = np.concatenate([star, np.zeros((len(star), 1))], axis=1)
    dims = (1, 48, 56)
    dev = _rasterize_plane([poly], dims, "Axial", backend="device")
    big = np.zeros((80, 80), np.uint8)
    cv2.fillPoly(big, [star.astype(np.int32)], 1)
    np.testing.assert_array_equal(dev[0], big[:48, :56])
