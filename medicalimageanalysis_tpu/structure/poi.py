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
        self.point_pixel = None
