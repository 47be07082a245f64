"""PLY + OBJ mesh IO (the reference's dormant generic pv.read path,
reference read/stl.py:21-36 / reader.py:462-473 — functional here)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.read.obj import read_obj, write_obj
from medicalimageanalysis_tpu.read.ply import read_ply, write_ply
from medicalimageanalysis_tpu.utils.mesh.trimesh import box_mesh


def _colored_box():
    box = box_mesh([0, 0, 0], [4, 5, 6])
    rng = np.random.default_rng(7)
    box["colors"] = rng.integers(0, 256, (box.points.shape[0], 3),
                                 dtype=np.uint8)
    return box


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    box = _colored_box()
    path = tmp_path / "box.ply"
    write_ply(path, box, binary=binary)
    back = read_ply(path)
    assert back.volume == pytest.approx(box.volume, rel=1e-6)
    np.testing.assert_allclose(back.points, box.points, atol=1e-6)
    np.testing.assert_array_equal(back.faces, box.faces)
    np.testing.assert_array_equal(back.point_data["colors"],
                                  box.point_data["colors"])


def test_ply_big_endian_and_extra_props(tmp_path):
    # hand-built big-endian file with an extra vertex property and
    # quad faces (fan triangulation)
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                   dtype=">f8")
    conf = np.arange(4, dtype=">u2")
    head = ("ply\nformat binary_big_endian 1.0\n"
            "element vertex 4\n"
            "property double x\nproperty double y\nproperty double z\n"
            "property ushort confidence\n"
            "element face 1\n"
            "property list uchar uint vertex_indices\n"
            "end_header\n")
    body = b""
    for i in range(4):
        body += pts[i].tobytes() + conf[i:i + 1].tobytes()
    body += bytes([4]) + np.array([0, 1, 2, 3], dtype=">u4").tobytes()
    p = tmp_path / "quad.ply"
    p.write_bytes(head.encode() + body)
    mesh = read_ply(p)
    np.testing.assert_allclose(mesh.points,
                               pts.astype(np.float64), atol=0)
    np.testing.assert_array_equal(mesh.faces,
                                  [[0, 1, 2], [0, 2, 3]])


def test_ply_ascii_quads_and_unknown_element(tmp_path):
    text = ("ply\nformat ascii 1.0\n"
            "comment made by hand\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element edge 2\n"
            "property int vertex1\nproperty int vertex2\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
            "0 1\n2 3\n"
            "4 0 1 2 3\n")
    p = tmp_path / "q.ply"
    p.write_text(text)
    mesh = read_ply(p)
    assert mesh.points.shape == (4, 3)
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])


def test_ply_float_colors(tmp_path):
    text = ("ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float red\nproperty float green\n"
            "property float blue\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0 1 0 0\n1 0 0 0 0.5 0\n0 1 0 0 0 1\n"
            "3 0 1 2\n")
    p = tmp_path / "c.ply"
    p.write_text(text)
    mesh = read_ply(p)
    np.testing.assert_array_equal(mesh.point_data["colors"],
                                  [[255, 0, 0], [0, 128, 0],
                                   [0, 0, 255]])


def test_ply_corrupt_raises_clean_valueerror(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply at all")
    with pytest.raises(ValueError, match="bad.ply"):
        read_ply(p)
    # truncated binary body
    box = box_mesh([0, 0, 0], [1, 1, 1])
    good = tmp_path / "good.ply"
    write_ply(good, box)
    data = good.read_bytes()
    trunc = tmp_path / "trunc.ply"
    trunc.write_bytes(data[: len(data) - 30])
    with pytest.raises(ValueError, match="trunc.ply"):
        read_ply(trunc)


def test_ply_byte_flip_fuzz(tmp_path):
    """Flipped bytes either parse or raise the typed ValueError —
    never segfault/hang/leak a foreign exception (repo-wide reader
    fuzz contract)."""
    box = _colored_box()
    good = tmp_path / "f.ply"
    write_ply(good, box)
    data = bytearray(good.read_bytes())
    rng = np.random.default_rng(3)
    for _ in range(150):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        p = tmp_path / "mut.ply"
        p.write_bytes(bytes(data))
        try:
            m = read_ply(p)
            assert m.points.ndim == 2
        except (ValueError, FileNotFoundError):
            pass
        data[i] = old


def test_obj_roundtrip(tmp_path):
    box = _colored_box()
    path = tmp_path / "box.obj"
    write_obj(path, box)
    back = read_obj(path)
    assert back.volume == pytest.approx(box.volume, rel=1e-9)
    np.testing.assert_allclose(back.points, box.points, atol=0)
    np.testing.assert_array_equal(back.faces, box.faces)
    np.testing.assert_array_equal(back.point_data["colors"],
                                  box.point_data["colors"])


def test_obj_forms(tmp_path):
    text = ("# comment\n"
            "mtllib none.mtl\n"
            "o thing\n"
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
            "vt 0 0\nvn 0 0 1\n"
            "usemtl m\ns off\n"
            "f 1/1/1 2/1/1 3/1/1\n"      # v/vt/vn
            "f 1//1 3//1 4//1\n"          # v//vn
            "f -4 -3 -2 -1\n")            # negative indices, quad fan
    p = tmp_path / "forms.obj"
    p.write_text(text)
    mesh = read_obj(p)
    assert mesh.points.shape == (4, 3)
    np.testing.assert_array_equal(
        mesh.faces,
        [[0, 1, 2], [0, 2, 3], [0, 1, 2], [0, 2, 3]])


def test_obj_corrupt_raises_clean_valueerror(tmp_path):
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nf 1 2 9\n")  # out-of-range index
    with pytest.raises(ValueError, match="bad.obj"):
        read_obj(p)
    p2 = tmp_path / "empty.obj"
    p2.write_text("# nothing\n")
    with pytest.raises(ValueError, match="empty.obj"):
        read_obj(p2)


def test_obj_byte_flip_fuzz(tmp_path):
    box = _colored_box()
    good = tmp_path / "f.obj"
    write_obj(good, box)
    data = bytearray(good.read_bytes())
    rng = np.random.default_rng(5)
    for _ in range(150):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        p = tmp_path / "mut.obj"
        p.write_bytes(bytes(data))
        try:
            m = read_obj(p)
            assert m.points.ndim == 2
        except (ValueError, FileNotFoundError):
            pass
        data[i] = old


def test_top_level_read_ply_obj_and_save(tmp_path):
    box = box_mesh([0, 0, 0], [2, 3, 4])
    box.save(tmp_path / "m.ply")
    box.save(tmp_path / "m.obj")
    ply = mia.read_ply(str(tmp_path / "m.ply"))
    obj = mia.read_obj([str(tmp_path / "m.obj")])
    assert ply[0].volume == pytest.approx(box.volume, rel=1e-6)
    assert obj[0].volume == pytest.approx(box.volume, rel=1e-9)


def test_ply_obj_reader_classes(tmp_path):
    from medicalimageanalysis_tpu.read import ObjReader, PlyReader
    box = box_mesh([0, 0, 0], [1, 2, 3])
    write_ply(tmp_path / "a.ply", box)
    write_obj(tmp_path / "b.obj", box)

    class Parent:
        files = None

    parent = Parent()
    r1 = PlyReader(parent)
    r1.input_files([str(tmp_path / "a.ply")])
    r1.load()
    r2 = ObjReader(parent)
    r2.input_files([str(tmp_path / "b.obj")])
    r2.load()
    assert len(parent.meshes) == 2
    for m in parent.meshes:
        assert m.volume == pytest.approx(box.volume, rel=1e-6)


def test_file_parser_ply_obj(tmp_path):
    (tmp_path / "a.ply").write_bytes(b"x")
    (tmp_path / "b.obj").write_bytes(b"x")
    files = mia.file_parser(folder_path=str(tmp_path))
    assert len(files["Ply"]) == 1 and len(files["Obj"]) == 1
