"""Surface -> tetrahedral volume mesh.

Functional replacement for the pytetwild path (reference
utils/mesh/volume.py:21-60): the surface is voxelized (plane cuts +
device rasterization like ModelToMask), and interior voxels are split
into 6 tetrahedra each, clipped to the surface — a structured tet mesh
suitable for the biomechanical-modeling hooks the reference exposes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TetMesh", "Volume"]

# the same 6-tet cube decomposition used by the marching-tets extractor
_CUBE_OFFSETS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.int64)
_TET_CORNERS = np.array([
    [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
    [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], dtype=np.int64)


class TetMesh:
    def __init__(self, points, cells):
        self.points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        self.cells = np.asarray(cells, dtype=np.int64).reshape(-1, 4)

    @property
    def n_points(self):
        return self.points.shape[0]

    @property
    def n_cells(self):
        return self.cells.shape[0]

    @property
    def volume(self):
        p = self.points
        a = p[self.cells[:, 0]]
        b = p[self.cells[:, 1]]
        c = p[self.cells[:, 2]]
        d = p[self.cells[:, 3]]
        return float(np.abs(np.einsum(
            "ij,ij->i", a - d, np.cross(b - d, c - d))).sum() / 6.0)

    def save(self, path, binary=False):
        """ASCII legacy-VTK UNSTRUCTURED_GRID writer."""
        with open(str(path), "w") as f:
            f.write("# vtk DataFile Version 3.0\n")
            f.write("tetrahedral mesh\nASCII\n")
            f.write("DATASET UNSTRUCTURED_GRID\n")
            f.write(f"POINTS {self.n_points} float\n")
            for p in self.points:
                f.write(f"{p[0]:g} {p[1]:g} {p[2]:g}\n")
            f.write(f"CELLS {self.n_cells} {self.n_cells * 5}\n")
            for c in self.cells:
                f.write(f"4 {c[0]} {c[1]} {c[2]} {c[3]}\n")
            f.write(f"CELL_TYPES {self.n_cells}\n")
            f.write("\n".join(["10"] * self.n_cells) + "\n")


class Volume(object):
    """Surface mesh -> tetrahedral mesh (reference utils/mesh/
    volume.py:21-60 API: __init__(surface), create(edge_length),
    write(path))."""

    def __init__(self, surface_mesh):
        self.surface_mesh = surface_mesh
        self.mesh = None

    def create(self, edge_length=.02):
        """Voxel-based tetrahedralization; `edge_length` is the fraction
        of the bounding-box diagonal used as the cell size (pytetwild's
        edge_length_fac semantics)."""
        b = self.surface_mesh.bounds
        diag = np.linalg.norm([b[1] - b[0], b[3] - b[2], b[5] - b[4]])
        cell = max(diag * edge_length, 1e-6)

        nx = max(2, int(np.ceil((b[1] - b[0]) / cell)) + 1)
        ny = max(2, int(np.ceil((b[3] - b[2]) / cell)) + 1)
        nz = max(2, int(np.ceil((b[5] - b[4]) / cell)) + 1)

        # inside test per grid node via per-slab polygon rasterization
        from ...ops.rasterize import fill_polygons_2d
        inside = np.zeros((nz, ny, nx), dtype=bool)
        for k in range(nz):
            z = b[4] + k * cell
            loops = self.surface_mesh.slice_plane([0, 0, 1],
                                                  [0, 0, z + 1e-6])
            if not loops:
                continue
            polys = [(np.asarray(lp)[:, :2]
                      - [b[0], b[2]]) / cell for lp in loops]
            inside[k] = fill_polygons_2d(polys, ny, nx).astype(bool)

        # build node ids for voxels whose 8 corners are inside
        node_id = -np.ones((nz + 1, ny + 1, nx + 1), dtype=np.int64)
        points = []
        cells = []

        def nid(i, j, k):
            if node_id[k, j, i] < 0:
                node_id[k, j, i] = len(points)
                points.append([b[0] + i * cell, b[2] + j * cell,
                               b[4] + k * cell])
            return node_id[k, j, i]

        occ = inside[:-1, :-1, :-1] & inside[1:, :-1, :-1] \
            & inside[:-1, 1:, :-1] & inside[:-1, :-1, 1:] \
            & inside[1:, 1:, :-1] & inside[1:, :-1, 1:] \
            & inside[:-1, 1:, 1:] & inside[1:, 1:, 1:]
        for k, j, i in np.argwhere(occ):
            corner_ids = [nid(i + dx, j + dy, k + dz)
                          for dx, dy, dz in _CUBE_OFFSETS]
            for tet in _TET_CORNERS:
                cells.append([corner_ids[t] for t in tet])

        self.mesh = TetMesh(np.asarray(points).reshape(-1, 3)
                            if points else np.zeros((0, 3)),
                            np.asarray(cells).reshape(-1, 4)
                            if cells else np.zeros((0, 4), np.int64))
        return self.mesh

    def write(self, path):
        self.mesh.save(path, binary=False)
