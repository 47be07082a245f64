"""Geometry core tests: transforms, plane logic, FFS decision."""

import numpy as np
import pytest

from medicalimageanalysis_tpu.ops import geometry as geo


def test_pixel_position_roundtrip(rng):
    matrix = np.eye(3)
    spacing = [0.5, 0.75, 3.0]
    origin = [-100.0, -120.0, 40.0]
    p2p = geo.pixel_to_position_matrix(matrix, spacing, origin)
    inv = geo.position_to_pixel_matrix(matrix, spacing, origin)

    pix = rng.uniform(0, 100, size=(20, 3))
    pos = geo.apply_homogeneous(pix, p2p)
    back = geo.apply_homogeneous(pos, inv)
    np.testing.assert_allclose(back, pix, atol=1e-3)

    # pixel (0,0,0) lands on origin
    np.testing.assert_allclose(
        geo.apply_homogeneous([0, 0, 0], p2p), origin, atol=1e-5)
    # unit step in x moves by sx along matrix row 0
    np.testing.assert_allclose(
        geo.apply_homogeneous([1, 0, 0], p2p),
        np.asarray(origin) + np.asarray([0.5, 0, 0]), atol=1e-5)


def test_pixel_position_oblique(rng):
    theta = np.deg2rad(20.0)
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1]])
    matrix = rot  # rows remain orthonormal
    spacing = [1.2, 0.8, 2.5]
    origin = [5.0, -3.0, 10.0]
    p2p = geo.pixel_to_position_matrix(matrix, spacing, origin)
    inv = geo.position_to_pixel_matrix(matrix, spacing, origin)
    combo = inv.astype(np.float64) @ p2p.astype(np.float64)
    np.testing.assert_allclose(combo, np.eye(4), atol=1e-4)


@pytest.mark.parametrize("orientation,expected", [
    ([1, 0, 0, 0, 1, 0], "Axial"),
    ([1, 0, 0, 0, 0, -1], "Coronal"),
    ([0, 1, 0, 0, 0, -1], "Sagittal"),
])
def test_plane_from_orientation(orientation, expected):
    assert geo.plane_from_orientation(orientation) == expected


def test_orientation_to_matrix():
    m = geo.orientation_to_matrix([1, 0, 0, 0, 1, 0])
    np.testing.assert_allclose(m, np.eye(3))
    m = geo.orientation_to_matrix([0, 1, 0, 0, 0, -1])
    np.testing.assert_allclose(m[2], np.cross([0, 1, 0], [0, 0, -1]))


def test_ffs_identity_noop():
    # canonical axial: origin already at min-sum corner -> no-op
    dec = geo.ffs_decision(
        shape_zyx=(10, 20, 30), plane="Axial", spacing_xyz=[1, 1, 3],
        orientation=[1, 0, 0, 0, 1, 0], origin=[-100, -100, -50],
        dimensions=[10, 20, 30])
    assert dec["op"] == "none"
    np.testing.assert_allclose(dec["origin"], [-100, -100, -50])


def test_ffs_flipped_axial_rot2():
    """A volume acquired with row/col directions negated (HFP-style) needs a
    180-degree in-plane rotation; origin moves to the opposite in-plane
    corner and orientation is rewritten to canonical +x/+y."""
    shape = (5, 16, 16)
    spacing = [1.0, 1.0, 3.0]
    orientation = [-1, 0, 0, 0, -1, 0]
    origin = [100.0, 80.0, -50.0]
    dims = [shape[0], shape[1], shape[2]]
    dec = geo.ffs_decision(shape, "Axial", spacing, orientation, origin, dims)
    assert dec["op"] == "ax_rot2"
    arr = np.arange(np.prod(shape)).reshape(shape).astype(np.float32)
    fixed = geo.apply_ffs_numpy(arr, dec["op"])
    np.testing.assert_array_equal(fixed, np.rot90(arr, 2, (1, 2)))
    # rewritten orientation must be right-handed unit rows
    o = dec["orientation"]
    np.testing.assert_allclose(np.linalg.norm(o[:3]), 1.0, atol=0.2)


def test_corners_shape_and_origin():
    corners = geo.compute_volume_corners(
        (4, 8, 8), "Axial", [1, 1, 2], [1, 0, 0, 0, 1, 0], [0, 0, 0])
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners[0], [0, 0, 0])
    np.testing.assert_allclose(corners[7], [7, 7, 6])
