"""Mesh IO (STL/VTK/3MF), voxelization, tet meshing, MHD reader tests
(BASELINE config #5)."""

import zipfile

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.mesh.trimesh import TriMesh, box_mesh


def test_box_mesh_volume():
    box = box_mesh([0, 0, 0], [10, 20, 30])
    assert box.volume == pytest.approx(6000.0)
    assert box.center == [5, 10, 15]
    assert box.bounds == [0, 10, 0, 20, 0, 30]


def test_stl_roundtrip(tmp_path):
    from medicalimageanalysis_tpu.read.stl import read_stl, write_stl
    box = box_mesh([0, 0, 0], [4, 5, 6])
    write_stl(tmp_path / "box.stl", box)
    back = read_stl(tmp_path / "box.stl")
    assert back.volume == pytest.approx(box.volume, rel=1e-6)
    assert back.number_of_points == 8
    # ascii too
    write_stl(tmp_path / "box_a.stl", box, binary=False)
    back2 = read_stl(tmp_path / "box_a.stl")
    assert back2.volume == pytest.approx(box.volume, rel=1e-5)


def test_vtk_roundtrip(tmp_path):
    from medicalimageanalysis_tpu.read.vtk import (read_vtk_polydata,
                                                   write_vtk_polydata)
    box = box_mesh([-2, -3, -4], [2, 3, 4])
    write_vtk_polydata(tmp_path / "box.vtk", box)
    back = read_vtk_polydata(tmp_path / "box.vtk")
    assert back.volume == pytest.approx(box.volume, rel=1e-5)


def test_mhd_roundtrip(tmp_path, rng):
    from medicalimageanalysis_tpu.read.mhd import (read_mhd_volume,
                                                   write_mhd_volume)
    arr = rng.integers(-500, 500, size=(6, 10, 14)).astype(np.int16)
    write_mhd_volume(tmp_path / "vol.mhd", arr, spacing=[0.5, 0.5, 2.0],
                     origin=[-10, -20, -30])
    back, spacing, origin, direction = read_mhd_volume(tmp_path / "vol.mhd")
    np.testing.assert_array_equal(back, arr)
    np.testing.assert_allclose(spacing, [0.5, 0.5, 2.0])
    np.testing.assert_allclose(origin, [-10, -20, -30])
    # compressed + vector field
    dvf = rng.normal(size=(4, 6, 8, 3)).astype(np.float32)
    write_mhd_volume(tmp_path / "dvf.mhd", dvf, compressed=True)
    back2, _, _, _ = read_mhd_volume(tmp_path / "dvf.mhd")
    np.testing.assert_allclose(back2, dvf, atol=1e-6)


def test_read_mhd_creates_image(tmp_path, rng):
    from medicalimageanalysis_tpu.read.mhd import write_mhd_volume
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.int16)
    write_mhd_volume(tmp_path / "scan.mhd", arr, spacing=[1, 1, 3],
                     origin=[0, 0, 0])
    mia.read_mhd(file=str(tmp_path / "scan.mhd"))
    assert "scan" in Data.image_list
    img = Data.image["scan"]
    np.testing.assert_array_equal(img.array, arr)
    np.testing.assert_allclose(img.spacing, [1, 1, 3])


def _write_3mf(path, vertices, triangles, color="#FF0000"):
    model = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<model unit="millimeter" '
             'xmlns="http://schemas.microsoft.com/3dmanufacturing/core/2015/02" '
             'xmlns:m="http://schemas.microsoft.com/3dmanufacturing/material/2015/02">',
             '<resources>',
             f'<m:basematerials id="1"><m:base name="mat" '
             f'displaycolor="{color}"/></m:basematerials>',
             '<object id="2" type="model" pid="1" pindex="0"><mesh>',
             '<vertices>']
    for v in vertices:
        model.append(f'<vertex x="{v[0]}" y="{v[1]}" z="{v[2]}"/>')
    model.append('</vertices><triangles>')
    for t in triangles:
        model.append(f'<triangle v1="{t[0]}" v2="{t[1]}" v3="{t[2]}"/>')
    model += ['</triangles></mesh></object>', '</resources>',
              '<build><item objectid="2"/></build>', '</model>']
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("3D/3dmodel.model", "\n".join(model))
        z.writestr("[Content_Types].xml", "<Types/>")


def test_read_3mf(tmp_path):
    box = box_mesh([10, 10, 10], [60, 70, 80])
    _write_3mf(tmp_path / "model.3mf", box.points, box.faces)
    mia.read_3mf(str(tmp_path / "model.3mf"), roi_name="Shell")
    assert len(Data.image_list) == 1
    name = Data.image_list[0]
    img = Data.image[name]
    assert "Shell" in img.rois
    roi = img.rois["Shell"]
    assert roi.mesh is not None
    assert roi.mesh.volume == pytest.approx(box.volume, rel=1e-6)
    # fake image voxel grid covers mesh + 5 voxel pad (ModelToMask)
    assert img.array is not None
    assert img.array.sum() == 0  # empty_array default like the reference


def test_model_to_mask_filled():
    from medicalimageanalysis_tpu.utils.convert.contour import ModelToMask
    box = box_mesh([10, 10, 10], [40, 40, 40])
    m2m = ModelToMask([box], empty_array=False)
    mask = m2m.mask
    assert mask.sum() > 0
    # filled voxel volume approximates box volume (spacing [1,1,3])
    vox_vol = np.prod(m2m.spacing)
    assert mask.sum() * vox_vol == pytest.approx(box.volume, rel=0.2)


def test_tet_volume():
    from medicalimageanalysis_tpu.utils.mesh.volume import Volume
    box = box_mesh([0, 0, 0], [20, 20, 20])
    vol = Volume(box)
    vol.create(edge_length=0.08)
    assert vol.mesh.n_cells > 0
    assert vol.mesh.volume == pytest.approx(box.volume, rel=0.35)


def test_mesh_split_and_decimate(rng):
    a = box_mesh([0, 0, 0], [5, 5, 5])
    b = box_mesh([20, 20, 20], [22, 22, 22])
    merged = TriMesh(np.vstack([a.points, b.points]),
                     np.vstack([a.faces, b.faces + 8]))
    bodies = merged.split_bodies()
    assert len(bodies) == 2
    from medicalimageanalysis_tpu.utils.mesh.surface import (
        only_main_component)
    main = only_main_component(merged)
    assert main.volume == pytest.approx(125.0, rel=1e-6)

    # decimation reduces point count
    from medicalimageanalysis_tpu.ops.marching_cubes import (
        marching_cubes_mask)
    mask = np.zeros((20, 20, 20), np.uint8)
    mask[4:16, 4:16, 4:16] = 1
    mesh = marching_cubes_mask(mask)
    dec = mesh.decimate(0.7)
    assert dec.number_of_points < mesh.number_of_points


def test_mesh_slice_plane():
    box = box_mesh([0, 0, 0], [10, 10, 10])
    loops = box.slice_plane(normal=[0, 0, 1], origin=[5, 5, 5])
    assert len(loops) >= 1
    pts = np.concatenate(loops)
    np.testing.assert_allclose(pts[:, 2], 5.0, atol=1e-9)


def test_top_level_read_stl_vtk(tmp_path):
    from medicalimageanalysis_tpu.read.stl import write_stl
    from medicalimageanalysis_tpu.read.vtk import write_vtk_polydata
    box = box_mesh([0, 0, 0], [3, 3, 3])
    write_stl(tmp_path / "a.stl", box)
    write_vtk_polydata(tmp_path / "b.vtk", box)
    meshes = mia.read_stl(str(tmp_path / "a.stl"))
    assert len(meshes) == 1
    assert meshes[0].volume == pytest.approx(27.0, rel=1e-6)
    meshes2 = mia.read_vtk([str(tmp_path / "b.vtk")])
    assert meshes2[0].volume == pytest.approx(27.0, rel=1e-5)


def test_stl_reader_class_populates_reader(tmp_path):
    from medicalimageanalysis_tpu.read.stl import StlReader, write_stl
    box = box_mesh([0, 0, 0], [2, 2, 2])
    write_stl(tmp_path / "m.stl", box)
    reader = mia.DicomReader(None, False, None, None, True)
    stl = StlReader(reader)
    stl.input_files([str(tmp_path / "m.stl")])
    stl.load()
    assert len(reader.meshes) == 1


def test_jpeg2000_dicom(tmp_path, rng):
    """JPEG2000-Lossless encapsulated DICOM decodes via cv2."""
    import cv2
    from medicalimageanalysis_tpu.dicom import dcmread, dcmwrite, uids
    import sys
    sys.path.insert(0, "tests")
    from test_dicom_core import make_ct_slice
    img = rng.integers(0, 4000, size=(32, 32)).astype(np.uint16)
    ok, enc = cv2.imencode(
        ".jp2", img, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    assert ok
    ds = make_ct_slice(np.zeros((32, 32), np.uint16))
    ds.PixelData = [enc.tobytes()]
    dcmwrite(tmp_path / "j2k.dcm", ds,
             transfer_syntax=uids.JPEG2000Lossless)
    out = dcmread(tmp_path / "j2k.dcm")
    np.testing.assert_array_equal(out.pixel_array, img)
