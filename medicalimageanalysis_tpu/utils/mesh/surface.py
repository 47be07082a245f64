"""Surface-mesh refinement: smoothing, clustering, decimation, repair.

Behavior-parity rebuild of reference utils/mesh/surface.py:25-381, built
on our TriMesh instead of VTK/pyacvd/pymeshfix:

- ``Refinement.smooth`` — Taubin lambda/mu smoothing, the standard
  approximation of vtkWindowedSincPolyDataFilter's transfer function.
- ``Refinement.cluster`` — uniform-grid vertex clustering (pyacvd
  equivalent for the decimation use-case here).
- ``clean_mesh`` — duplicate/degenerate removal + boundary-loop hole
  filling (pymeshfix equivalent for the repair use-case here).
- ``expansion`` — vertex-normal offset then repair.
- ``surface_boundary`` — co-cluster source/target until point counts
  match.
- ``only_main_component`` — largest connected component.

Reference ``Refinement.decimate`` discards its result (surface.py:96-115
calls mesh.decimate without assignment — a no-op bug); here it applies.
``advanced_split`` is a broken WIP in the reference (undefined names,
surface.py:169-251) and is kept as an explicit stub.
"""

from __future__ import annotations

import numpy as np

from .trimesh import TriMesh, box_mesh, unique_inverse  # noqa: F401

__all__ = ["Refinement", "constrained_smooth", "taubin_smooth",
           "clean_mesh", "expansion", "surface_boundary",
           "only_main_component", "vertex_normals", "box_mesh"]


def _edge_keys(edges_sorted):
    """Pack sorted (E, 2) int edges into int64 keys (hash-free, exact:
    vertex ids are < 2^31)."""
    return (edges_sorted[:, 0].astype(np.int64) << 32) \
        | edges_sorted[:, 1].astype(np.int64)


def _unpack_edges(keys):
    return np.stack([keys >> 32, keys & 0xFFFFFFFF],
                    axis=1).astype(np.int64)


def _adjacency(mesh):
    """Unique undirected edges (E, 2) from faces. Packed-key unique:
    np.unique(axis=0)'s row sort measured seconds at organ scale
    (3M+ edges)."""
    f = mesh.faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    uniq, _ = unique_inverse(_edge_keys(edges))
    return _unpack_edges(uniq)


def _laplacian_step(points, edges, factor):
    """One umbrella-operator step: p += factor * (mean(neighbors) - p)."""
    n = points.shape[0]
    acc = np.zeros_like(points)
    deg = np.zeros(n)
    np.add.at(acc, edges[:, 0], points[edges[:, 1]])
    np.add.at(acc, edges[:, 1], points[edges[:, 0]])
    np.add.at(deg, edges[:, 0], 1)
    np.add.at(deg, edges[:, 1], 1)
    deg = np.maximum(deg, 1)
    return points + factor * (acc / deg[:, None] - points)


def taubin_smooth(mesh, iterations=20, passband=0.001, lam=0.5):
    """Taubin low-pass smoothing (vtkWindowedSinc equivalent).

    mu is chosen so the transfer function passes `passband`:
    1/lam + 1/mu = k_pb  (Taubin 1995).
    """
    if mesh.number_of_points == 0 or mesh.faces.size == 0:
        return mesh.copy()
    k_pb = passband
    mu = lam / (lam * k_pb - 1.0)  # negative for k_pb < 1/lam
    edges = _adjacency(mesh)
    pts = mesh.points.copy()
    for _ in range(iterations):
        pts = _laplacian_step(pts, edges, lam)
        pts = _laplacian_step(pts, edges, mu)
    return TriMesh(pts, mesh.faces.copy())


def constrained_smooth(mesh, iterations=20, relaxation=0.5, max_distance=1):
    """Laplacian smoothing with per-vertex displacement clamped to
    `max_distance` from the original position — matches the smoothing
    knobs of the reference's surface-nets path
    (utils/convert/contour.py:155-161)."""
    if mesh.number_of_points == 0 or mesh.faces.size == 0:
        return mesh.copy()
    edges = _adjacency(mesh)
    orig = mesh.points.copy()
    pts = mesh.points.copy()
    for _ in range(iterations):
        pts = _laplacian_step(pts, edges, relaxation)
        delta = pts - orig
        norm = np.linalg.norm(delta, axis=1, keepdims=True)
        scale = np.minimum(1.0, max_distance / np.maximum(norm, 1e-12))
        pts = orig + delta * scale
    return TriMesh(pts, mesh.faces.copy())


def vertex_normals(mesh):
    """Area-weighted vertex normals."""
    p = mesh.points
    f = mesh.faces
    fn = np.cross(p[f[:, 1]] - p[f[:, 0]], p[f[:, 2]] - p[f[:, 0]])
    vn = np.zeros_like(p)
    np.add.at(vn, f[:, 0], fn)
    np.add.at(vn, f[:, 1], fn)
    np.add.at(vn, f[:, 2], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


class Refinement(object):
    """Mesh refinement toolkit (reference utils/mesh/surface.py:25-251)."""

    def __init__(self, mesh):
        self.mesh = mesh
        self.correct_faces = None
        self.points = np.asarray(mesh.points)
        self.face = np.asarray(mesh.faces)
        self.face_centers = self.points[self.face].mean(axis=1) \
            if self.face.size else np.zeros((0, 3))
        if self.face.size:
            lines = np.vstack([self.face[:, [0, 1]], self.face[:, [0, 2]],
                               self.face[:, [1, 2]]])
            self.face_lines_sort = np.sort(lines, axis=1)
            self.face_lines = _unpack_edges(
                unique_inverse(_edge_keys(self.face_lines_sort))[0])
        else:
            self.face_lines_sort = np.zeros((0, 2), np.int64)
            self.face_lines = self.face_lines_sort

    def smooth(self, iterations=20, angle=60, passband=0.001):
        self.mesh = taubin_smooth(self.mesh, iterations=iterations,
                                  passband=passband)
        return self.mesh

    def cluster(self, points=None):
        if points is None:
            points = self.compute_points()
        self.mesh = self.mesh.cluster_decimate(int(points))
        return self.mesh

    def decimate(self, percent=None):
        if percent is None:
            percent = self.compute_point_percentage()
        self.mesh = self.mesh.decimate(percent)
        return self.mesh

    def compute_points(self):
        """Target point heuristic 10*sqrt(N)
        (reference utils/mesh/surface.py:117-127)."""
        return np.round(10 * np.sqrt(self.mesh.number_of_points))

    def compute_point_percentage(self):
        points = self.compute_points()
        return 1 - (points / self.mesh.number_of_points)

    def tri_split(self):
        """Centroid subdivision of the most crowded faces
        (reference utils/mesh/surface.py:141-167)."""
        self.find_face_correction()
        correct = set(int(i) for i in self.correct_faces)
        base_faces = [f for ii, f in enumerate(self.face)
                      if ii not in correct]
        base_length = len(self.points)
        new_points = [self.face_centers[ii] for ii in self.correct_faces]
        total_points = np.concatenate((self.points, new_points)) \
            if new_points else self.points

        new_faces = []
        for ii, fidx in enumerate(self.correct_faces):
            hf = self.face[fidx]
            c = base_length + ii
            new_faces += [[hf[0], hf[1], c], [hf[1], hf[2], c],
                          [hf[0], hf[2], c]]
        total_faces = np.concatenate(
            (np.asarray(base_faces).reshape(-1, 3),
             np.asarray(new_faces).reshape(-1, 3)))
        return TriMesh(total_points, total_faces)

    def advanced_split(self, area_factor=2.0, max_rounds=5):
        """Adaptive refinement: repeatedly centroid-split every face
        whose area exceeds ``area_factor`` times the mean face area,
        until none do (or ``max_rounds``). Centroid (1->3) splits never
        touch shared edges, so the mesh stays watertight with no
        T-junctions. The reference left this as broken WIP
        (surface.py:169-251, undefined names); this implements the
        capability it sketched."""
        mesh = TriMesh(np.asarray(self.mesh.points, float).copy(),
                       np.asarray(self.mesh.faces, np.int64).copy())
        for _ in range(max_rounds):
            pts = mesh.points
            f = mesh.faces
            a = pts[f[:, 0]]
            b = pts[f[:, 1]]
            c = pts[f[:, 2]]
            areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
            big = areas > area_factor * areas.mean()
            if not big.any():
                break
            centers = (a[big] + b[big] + c[big]) / 3.0
            base_n = pts.shape[0]
            cidx = base_n + np.arange(centers.shape[0])
            fb = f[big]
            new_faces = np.concatenate([
                np.stack([fb[:, 0], fb[:, 1], cidx], axis=1),
                np.stack([fb[:, 1], fb[:, 2], cidx], axis=1),
                np.stack([fb[:, 2], fb[:, 0], cidx], axis=1)])
            mesh = TriMesh(np.concatenate([pts, centers]),
                           np.concatenate([f[~big], new_faces]))
        return mesh

    def find_face_correction(self):
        """Most-crowded faces by summed 6-NN center distance
        (reference utils/mesh/surface.py:197-205)."""
        from scipy.spatial import cKDTree
        tree = cKDTree(self.face_centers)
        k = min(6, len(self.face_centers))
        dist, _ = tree.query(self.face_centers, k=k)
        dist_sum = dist.sum(axis=1)
        order = np.argsort(dist_sum)
        self.correct_faces = order[:int(len(self.points) / 4)]

    def compute_midpoints(self):
        """Midpoints of the edges selected for advanced splitting.

        For each crowded face (``find_face_correction``), selects the
        edge whose midpoint lies closest to the face's opposite vertex
        and returns ``(midpoint_unique, midline_unique)``: the
        deduplicated midpoint coordinates and their sorted
        vertex-index edge pairs. The reference's version is broken WIP
        referencing undefined names (surface.py:207-251); this
        implements its documented contract, vectorized.
        """
        if self.correct_faces is None:
            self.find_face_correction()
        if self.face.size == 0 or len(self.correct_faces) == 0:
            return (np.zeros((0, 3), float), np.zeros((0, 2), np.int64))
        pts = self.points
        f = self.face[np.asarray(self.correct_faces, np.int64)]
        # edge k = (v_k, v_{k+1}); its midpoint vs opposite vertex
        mids = np.stack([(pts[f[:, 0]] + pts[f[:, 1]]) / 2,
                         (pts[f[:, 1]] + pts[f[:, 2]]) / 2,
                         (pts[f[:, 2]] + pts[f[:, 0]]) / 2], axis=1)
        opp = np.stack([pts[f[:, 2]], pts[f[:, 0]], pts[f[:, 1]]],
                       axis=1)
        pick = np.argmin(np.linalg.norm(mids - opp, axis=2), axis=1)
        edges = np.stack([np.stack([f[:, 0], f[:, 1]], axis=1),
                          np.stack([f[:, 1], f[:, 2]], axis=1),
                          np.stack([f[:, 2], f[:, 0]], axis=1)], axis=1)
        rows = np.arange(len(f))
        chosen_mid = mids[rows, pick]
        chosen_edge = np.sort(edges[rows, pick], axis=1)
        # two faces sharing a shortest edge produce ONE midpoint
        _, idx = np.unique(chosen_edge, axis=0, return_index=True)
        return chosen_mid[idx], chosen_edge[idx].astype(np.int64)


def _boundary_loops(mesh):
    """Open boundary loops (edges referenced by exactly one face)."""
    f = mesh.faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges_sorted = np.sort(edges, axis=1)
    ukeys, inverse = unique_inverse(_edge_keys(edges_sorted))
    counts = np.bincount(inverse, minlength=ukeys.size)
    boundary = _unpack_edges(ukeys[counts == 1])
    if boundary.size == 0:
        return []
    from collections import defaultdict
    adj = defaultdict(list)
    for a, b in boundary:
        adj[a].append(b)
        adj[b].append(a)
    visited = set()
    loops = []
    for start in adj:
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        current = start
        while True:
            nxt = [v for v in adj[current] if v not in visited]
            if not nxt:
                break
            current = nxt[0]
            visited.add(current)
            loop.append(current)
        if len(loop) >= 3:
            loops.append(loop)
    return loops


def clean_mesh(mesh):
    """Repair: weld duplicates, drop degenerates, fan-fill boundary holes
    (pymeshfix-equivalent for this pipeline, reference surface.py:254-278)."""
    out = mesh.clean()
    loops = _boundary_loops(out)
    if loops:
        pts = out.points
        new_points = list(pts)
        new_faces = list(out.faces)
        for loop in loops:
            center = pts[loop].mean(axis=0)
            ci = len(new_points)
            new_points.append(center)
            for i in range(len(loop)):
                new_faces.append([loop[i], loop[(i + 1) % len(loop)], ci])
        out = TriMesh(np.asarray(new_points), np.asarray(new_faces))
    return out


def expansion(mesh, dist):
    """Offset along vertex normals then repair
    (reference utils/mesh/surface.py:281-308)."""
    out = mesh.copy()
    out.points = out.points + vertex_normals(out) * dist
    return clean_mesh(out)


def surface_boundary(source_meshes, target_meshes, points, matrix=None):
    """Co-cluster source/target meshes until point counts match
    (reference utils/mesh/surface.py:311-354)."""
    if matrix is None:
        matrix = np.identity(4)

    new_sources = []
    new_targets = []
    for ii, s in enumerate(source_meshes):
        for n in range(200):
            hold_s = s.cluster_decimate(int(points[ii] + n))
            hold_t = target_meshes[ii].cluster_decimate(int(points[ii] + n))
            if hold_s.number_of_points == hold_t.number_of_points:
                new_sources.append(hold_s)
                new_targets.append(hold_t.transform(matrix, inplace=True))
                break
    return new_sources, new_targets


def only_main_component(mesh):
    """Largest connected component (reference surface.py:357-381)."""
    bodies = mesh.split_bodies()
    if len(bodies) <= 1:
        return mesh
    total_points = [m.number_of_points for m in bodies]
    return bodies[int(np.argmax(total_points))]
