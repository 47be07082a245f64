"""ROI margin + boolean tests (BEYOND-PARITY planning structures)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.roi.margin import (combine_masks,
                                                       expand_mask)

from helpers import write_ct_series


def test_expand_isotropic_exact_mm():
    """Single voxel at 1 mm spacing expanded by 3 mm: the result is
    the voxels within 3 mm Euclidean distance (a discrete ball)."""
    m = np.zeros((9, 9, 9), np.uint8)
    m[4, 4, 4] = 1
    out = expand_mask(m, [1.0, 1.0, 1.0], 3.0)
    zz, yy, xx = np.mgrid[0:9, 0:9, 0:9]
    d = np.sqrt((zz - 4.0) ** 2 + (yy - 4.0) ** 2 + (xx - 4.0) ** 2)
    np.testing.assert_array_equal(out, (d <= 3.0).astype(np.uint8))


def test_expand_anisotropic_spacing_and_margin():
    """2.5 mm slices: a 3 mm isotropic margin reaches 1 slice up/down
    (2.5 <= 3) but not 2 (5 > 3); a per-axis [3, 3, 0.1] margin stays
    in-plane."""
    m = np.zeros((9, 9, 9), np.uint8)
    m[4, 4, 4] = 1
    out = expand_mask(m, [1.0, 1.0, 2.5], 3.0)
    assert out[5, 4, 4] == 1 and out[6, 4, 4] == 0
    out2 = expand_mask(m, [1.0, 1.0, 2.5], [3.0, 3.0, 0.1])
    assert out2[5, 4, 4] == 0 and out2[4, 4, 7] == 1


def test_contract_inverts_expand_on_interior():
    m = np.zeros((12, 20, 20), np.uint8)
    m[3:9, 5:15, 5:15] = 1
    grown = expand_mask(m, [1, 1, 1], 2.0)
    back = expand_mask(grown, [1, 1, 1], -2.0)
    # morphological close/open of a box is the box
    np.testing.assert_array_equal(back, m)


def test_combine_ops():
    a = np.zeros((2, 4, 4), np.uint8)
    b = np.zeros((2, 4, 4), np.uint8)
    a[0, :2] = 1
    b[0, 1:3] = 1
    assert combine_masks("union", a, b).sum() == 2 * 4 + 4
    assert combine_masks("intersect", a, b).sum() == 4
    assert combine_masks("subtract", a, b).sum() == 4
    assert combine_masks("xor", a, b).sum() == 8
    with pytest.raises(ValueError, match="unknown op"):
        combine_masks("nand", a, b)
    with pytest.raises(ValueError, match="mixed-sign"):
        expand_mask(a, [1, 1, 1], [1.0, -1.0, 0.0])


def test_image_planning_structures(tmp_path):
    """CTV -> PTV (margin) -> ring (PTV expansion minus PTV) through
    the public Image API."""
    rng = np.random.default_rng(6)
    arr = rng.integers(-200, 200, size=(8, 24, 24)).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr, spacing=(1, 1), thickness=2.0)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]

    ctv = np.zeros((8, 24, 24), np.uint8)
    ctv[3:6, 8:16, 8:16] = 1
    img.create_roi(name="CTV", color=[255, 0, 0])
    img.rois["CTV"].convert_mask(ctv)

    img.create_roi_from_margin("PTV", "CTV", 2.0)
    ptv = np.asarray(img.rois["PTV"].compute_mask()).astype(np.uint8)
    assert ptv.sum() > ctv.sum()
    assert np.all(ptv[ctv > 0] == 1)   # superset

    img.create_roi_from_margin("Ring_outer", "PTV", 3.0)
    img.create_roi_from_boolean("Ring", "subtract", "Ring_outer",
                                "PTV")
    ring = np.asarray(img.rois["Ring"].compute_mask()).astype(np.uint8)
    assert ring.sum() > 0
    # the boolean MASK is exact; the contour representation regains
    # one boundary layer on curved shapes (cv2 rasterization includes
    # the boundary — the reference's contour model). No overlap may
    # survive past that single layer:
    from scipy import ndimage
    ptv_interior = ndimage.binary_erosion(ptv > 0)
    assert int((ring & ptv_interior).sum()) == 0
    assert "Ring" in Data.roi_list


def test_expand_zero_axis_component():
    """A zero per-axis margin component means NO growth along that
    axis (review finding: spacing/inf sampling inverted into free
    movement, smearing a [3,3,0] margin across every slice)."""
    m = np.zeros((9, 9, 9), np.uint8)
    m[4, 4, 4] = 1
    out = expand_mask(m, [1.0, 1.0, 1.0], [3.0, 3.0, 0.0])
    assert out[3].sum() == 0 and out[5].sum() == 0   # stayed in-plane
    yy, xx = np.mgrid[0:9, 0:9]
    d = np.sqrt((yy - 4.0) ** 2 + (xx - 4.0) ** 2)
    np.testing.assert_array_equal(out[4], (d <= 3.0).astype(np.uint8))

    slab = np.zeros((5, 12, 12), np.uint8)
    slab[:, 2:10, 2:10] = 1
    shrunk = expand_mask(slab, [1, 1, 1], [-2.0, -2.0, 0.0])
    # every slice keeps the in-plane eroded box
    for z in range(5):
        np.testing.assert_array_equal(
            shrunk[z], expand_mask(slab, [1, 1, 1],
                                   [-2.0, -2.0, 0.0])[z])
    assert shrunk.sum() > 0


def test_annulus_contour_round_trip_stable():
    """Ring masks survive mask->contour->mask round trips with a
    FIXED point (review finding: cv2's hole tracing on foreground
    pixels + XOR erased ~1 px of ring per pass, unbounded)."""
    from medicalimageanalysis_tpu.utils.convert.contour import (
        ContourToMask, MaskToContour)

    yy, xx = np.mgrid[0:40, 0:40]
    d = np.sqrt((yy - 20.0) ** 2 + (xx - 20.0) ** 2)
    ann = np.zeros((2, 40, 40), np.uint8)
    ann[:] = ((d <= 14) & (d >= 7)).astype(np.uint8)

    cur = ann.copy()
    first = None
    for _ in range(4):
        m2c = MaskToContour(cur, spacing=[1, 1, 2], origin=[0, 0, 0],
                            matrix=np.eye(3))
        _, cpos = m2c.create_contours()
        c2m = ContourToMask(contour_position=cpos, spacing=[1, 1, 2],
                            origin=[0, 0, 0], matrix=np.eye(3),
                            dimensions=[2, 40, 40])
        cur = np.asarray(c2m.create_mask())
        if first is None:
            first = cur.copy()
    np.testing.assert_array_equal(cur, first)  # fixed point
    # the hole survives
    assert cur[0, 20, 20] == 0 and cur[0, 20, 8] == 1
