"""Mesh refinement utilities + remaining converter coverage."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.ops.marching_cubes import marching_cubes_mask
from medicalimageanalysis_tpu.utils.mesh.surface import (
    Refinement, clean_mesh, expansion, only_main_component,
    surface_boundary, taubin_smooth, vertex_normals)
from medicalimageanalysis_tpu.utils.mesh.trimesh import TriMesh, box_mesh


def ball_mesh(r=6, n=16):
    mask = np.zeros((n, n, n), np.uint8)
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n]
    c = n / 2 - 0.5
    mask[(zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2 <= r * r] = 1
    return marching_cubes_mask(mask)


def test_taubin_smooth_preserves_volume():
    mesh = ball_mesh()
    smoothed = taubin_smooth(mesh, iterations=20, passband=0.1)
    assert smoothed.number_of_points == mesh.number_of_points
    # low-pass smoothing should not collapse the ball
    assert smoothed.volume > 0.7 * mesh.volume
    # blocky marching-tets surface gets smoother: area decreases
    assert smoothed.area < mesh.area


def test_refinement_cluster_and_decimate():
    mesh = ball_mesh()
    ref = Refinement(mesh)
    clustered = ref.cluster(points=100)
    assert clustered.number_of_points <= 160
    ref2 = Refinement(ball_mesh())
    decimated = ref2.decimate()  # heuristic 10*sqrt(N)
    assert decimated.number_of_points < ball_mesh().number_of_points


def test_tri_split_increases_faces():
    mesh = ball_mesh()
    ref = Refinement(mesh)
    split = ref.tri_split()
    assert split.number_of_faces > mesh.number_of_faces


def test_clean_mesh_fills_hole():
    box = box_mesh([0, 0, 0], [4, 4, 4])
    holey = TriMesh(box.points, box.faces[:-1])  # drop one face
    fixed = clean_mesh(holey)
    # watertight again: every edge shared by exactly 2 faces
    f = fixed.faces
    edges = np.sort(np.concatenate(
        [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_expansion_grows_volume():
    mesh = ball_mesh()
    bigger = expansion(mesh, 1.0)
    assert bigger.volume > mesh.volume


def test_vertex_normals_outward():
    box = box_mesh([0, 0, 0], [2, 2, 2])
    n = vertex_normals(box)
    center = np.array([1, 1, 1])
    outward = np.einsum("ij,ij->i", n, box.points - center)
    assert (outward > 0).all()


def test_surface_boundary_equal_counts():
    a = ball_mesh()
    b = ball_mesh(r=5)
    (sa,), (ta,) = surface_boundary([a], [b], [80])
    assert sa.number_of_points == ta.number_of_points


def test_only_main_component_single():
    mesh = ball_mesh()
    assert only_main_component(mesh) is mesh


def test_contour_to_mask_from_positions(tmp_path, rng):
    from medicalimageanalysis_tpu.utils.convert.contour import (
        ContourToMask)
    square = np.array([[2.0, 2.0, 4.0], [10.0, 2.0, 4.0],
                       [10.0, 10.0, 4.0], [2.0, 10.0, 4.0]])
    c2m = ContourToMask(contour_position=[square],
                        spacing=[1, 1, 2], origin=[0, 0, 0],
                        dimensions=[4, 16, 16], matrix=np.eye(3))
    mask = c2m.create_mask()
    expected = np.zeros((4, 16, 16), np.uint8)
    expected[2, 2:11, 2:11] = 1
    np.testing.assert_array_equal(mask, expected)


def test_us_regions_spacing(tmp_path, rng):
    from medicalimageanalysis_tpu.dicom import (Dataset, Sequence,
                                                dcmwrite, generate_uid,
                                                uids)
    frames = rng.integers(0, 255, size=(8, 8)).astype(np.uint8)
    ds = Dataset()
    ds.SOPClassUID = uids.USImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "US"
    ds.PatientID = "U"
    ds.Rows, ds.Columns = 8, 8
    ds.BitsAllocated = 8
    ds.BitsStored = 8
    ds.HighBit = 7
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    region = Dataset()
    region.PhysicalDeltaX = 0.012
    region.PhysicalDeltaY = 0.034
    ds.SequenceOfUltrasoundRegions = Sequence([region])
    ds.PixelData = frames.tobytes()
    (tmp_path / "us").mkdir()
    dcmwrite(tmp_path / "us" / "us.dcm", ds)
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["US 01"]
    # PhysicalDelta * 10, rounded to 4 dp (reference read/dicom.py:1377)
    np.testing.assert_allclose(img.spacing, [0.12, 0.34, 1.0])


def test_roi_mesh_slice_pixels(tmp_path, rng):
    from helpers import square_contour_mm, write_ct_series, write_rtstruct
    arr = rng.integers(0, 100, size=(8, 24, 24)).astype(np.int16)
    info = write_ct_series(tmp_path / "ct", arr, spacing=(1, 1),
                           thickness=2.0)
    rois = {"Box": [(square_contour_mm(info, z, 6, 16), z)
                    for z in range(2, 6)]}
    write_rtstruct(tmp_path / "ct" / "rs.dcm", info, rois)
    mia.read_dicoms(folder_path=str(tmp_path))
    roi = Data.image["CT 01"].rois["Box"]
    roi.create_discrete_mesh()
    loc = roi.mesh.center
    loops, colors = roi.compute_mesh_slice(
        location=loc, slice_plane="Axial", return_pixel=True)
    assert len(loops) >= 1
    pts = np.concatenate(loops)
    # cross-section stays inside the box footprint (pixels 6..16 +- 1)
    assert pts[:, 0].min() >= 4 and pts[:, 0].max() <= 18
