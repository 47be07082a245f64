"""Per-plane mask -> pixel contour extraction
(reference utils/roi/contour.py:15-39)."""

from __future__ import annotations

import numpy as np

__all__ = ["contours_from_mask"]


def contours_from_mask(mask, plane="Axial"):
    """Per-plane cv2.findContours -> list of (N, 3) pixel contours."""
    import cv2

    mask = mask.astype(np.uint8)
    if plane == "Axial":
        slices = mask.shape[0]
    elif plane == "Coronal":
        slices = mask.shape[1]
    else:
        slices = mask.shape[2]

    contours = []
    for ii in range(slices):
        if plane == "Axial":
            found, _ = cv2.findContours(mask[ii, :, :], cv2.RETR_EXTERNAL,
                                        cv2.CHAIN_APPROX_SIMPLE)
            contours += [np.concatenate(
                (np.vstack(t), ii * np.ones((len(t), 1))), axis=1)
                for t in found]
        elif plane == "Coronal":
            found, _ = cv2.findContours(mask[:, ii, :], cv2.RETR_EXTERNAL,
                                        cv2.CHAIN_APPROX_SIMPLE)
            for t in found:
                stack = np.vstack(t)
                contours += [np.vstack((stack[:, 0], ii * np.ones(len(t)),
                                        stack[:, 1])).T]
        else:
            found, _ = cv2.findContours(mask[:, :, ii], cv2.RETR_EXTERNAL,
                                        cv2.CHAIN_APPROX_SIMPLE)
            contours += [np.concatenate(
                (ii * np.ones((len(t), 1)), np.vstack(t)), axis=1)
                for t in found]

    return contours
