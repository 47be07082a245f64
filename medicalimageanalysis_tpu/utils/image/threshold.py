"""External-contour thresholding (reference utils/image/threshold.py:17-49).

Threshold (> or <) -> largest connected component -> per-slice hole fill,
slice centroids, component counts, bbox-framed mask.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

__all__ = ["external"]


def external(array, threshold=-250, min_volume=100, only_mask=True,
             less_than=False):
    """Largest thresholded component with per-slice fill/centroids.

    Returns mask only (default) or (mask, centroid_external,
    external_components, bounds) like the reference.
    """
    array = np.asarray(array)
    binary = (array < threshold) if less_than else (array > threshold)

    # full-connectivity labeling (skimage.measure.label default)
    structure = np.ones((3, 3, 3))
    labels, n = ndimage.label(binary, structure=structure)
    if n == 0:
        mask = np.zeros(array.shape)
        if only_mask:
            return mask
        return mask, np.zeros((0, 2)), np.zeros((0, 1)), (0, 0, 0, 0, 0, 0)

    counts = np.bincount(labels.ravel())
    counts[0] = 0
    biggest = int(np.argmax(counts))
    comp = labels == biggest
    objs = ndimage.find_objects((labels == biggest).astype(np.int8))[0]
    # bbox as (z0, y0, x0, z1, y1, x1) like skimage regionprops
    bounds = (objs[0].start, objs[1].start, objs[2].start,
              objs[0].stop, objs[1].stop, objs[2].stop)
    box_image = comp[objs]

    mask = np.zeros(array.shape)
    centroid_external = np.zeros((box_image.shape[0], 2))
    external_components = np.zeros((box_image.shape[0], 1))
    structure2d = np.ones((3, 3))
    for ii in range(box_image.shape[0]):
        filled_image = ndimage.binary_fill_holes(box_image[ii, :, :])
        fill_labels, n2 = ndimage.label(filled_image, structure=structure2d)
        areas = np.bincount(fill_labels.ravel())[1:] if n2 else []
        external_components[ii] = len(
            [a for a in areas if a > min_volume])
        if filled_image.any():
            centroid_external[ii, :] = np.round(
                np.mean(np.argwhere(filled_image), axis=0))
        mask[ii + bounds[0], bounds[1]:bounds[4],
             bounds[2]:bounds[5]] = 1 * filled_image

    if only_mask:
        return mask
    return mask, centroid_external, external_components, bounds
