"""3MF writer round-trip tests (BEYOND-PARITY writer half of the 3MF
codec — 3D-printing export with lossless per-vertex colors)."""

import numpy as np
import pytest

from medicalimageanalysis_tpu.read.mf3 import ThreeMfReader, write_3mf
from medicalimageanalysis_tpu.utils.mesh.trimesh import TriMesh


def _tetra():
    points = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0],
                       [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]])
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return points, faces


def _read_mesh(path):
    from medicalimageanalysis_tpu.data import Data
    Data.clear()
    reader = ThreeMfReader(str(path))
    reader.load()
    Data.clear()
    return reader.mesh


def test_3mf_geometry_round_trip(tmp_path):
    points, faces = _tetra()
    p = tmp_path / "t.3mf"
    write_3mf(p, (points, faces))
    mesh = _read_mesh(p)
    np.testing.assert_allclose(mesh.points, points, atol=1e-6)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_3mf_vertex_colors_round_trip(tmp_path):
    points, faces = _tetra()
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                       [255, 255, 0]], np.uint8)
    mesh = TriMesh(points, faces)
    mesh["colors"] = colors
    p = tmp_path / "c.3mf"
    write_3mf(p, mesh)
    back = _read_mesh(p)
    np.testing.assert_array_equal(back["colors"], colors)
    np.testing.assert_allclose(back.points, points, atol=1e-6)


def test_3mf_validation(tmp_path):
    points, faces = _tetra()
    with pytest.raises(ValueError, match="face index"):
        write_3mf(tmp_path / "bad.3mf",
                  (points, np.array([[0, 1, 9]])))
    with pytest.raises(ValueError, match="pair with"):
        write_3mf(tmp_path / "bad2.3mf", (points, faces),
                  vertex_colors=np.zeros((2, 3), np.uint8))


def test_trimesh_save_3mf_dispatch(tmp_path):
    points, faces = _tetra()
    mesh = TriMesh(points, faces)
    mesh["colors"] = np.full((4, 3), 33, np.uint8)
    mesh.save(str(tmp_path / "m.3mf"))
    back = _read_mesh(tmp_path / "m.3mf")
    np.testing.assert_allclose(back.points, points, atol=1e-6)
    np.testing.assert_array_equal(back["colors"],
                                  np.full((4, 3), 33, np.uint8))


def test_3mf_object_level_default_material(tmp_path):
    """Spec layout (3MF core 4.1): object-level pid/pindex with NO
    per-triangle props — every vertex gets the default palette color
    (review finding: the reader only consulted mesh-level attrs, which
    never exist in valid files, so object defaults were ignored)."""
    import zipfile

    points, faces = _tetra()
    p = tmp_path / "d.3mf"
    write_3mf(p, (points, faces),
              vertex_colors=np.full((4, 3), 99, np.uint8))
    # strip per-triangle props and set object pindex -> palette[0]
    with zipfile.ZipFile(p) as z:
        xml = z.read("3D/3dmodel.model").decode()
    import re
    xml = re.sub(r' pid="1" p1="\d+" p2="\d+" p3="\d+"', "", xml)
    p2 = tmp_path / "d2.3mf"
    with zipfile.ZipFile(p, "r") as zin, \
            zipfile.ZipFile(p2, "w") as zout:
        for item in zin.namelist():
            data = xml.encode() if item == "3D/3dmodel.model" \
                else zin.read(item)
            zout.writestr(item, data)
    back = _read_mesh(p2)
    np.testing.assert_array_equal(back["colors"],
                                  np.full((4, 3), 99, np.uint8))


def test_3mf_invalid_unit_rejected(tmp_path):
    points, faces = _tetra()
    with pytest.raises(ValueError, match="invalid unit"):
        write_3mf(tmp_path / "u.3mf", (points, faces), unit="mm")
