"""Round-5 voxelize_batch measurement on the chip (new batched design).

Replicates the bench's voxelize workload (liver-scale ROI -> MC mesh
-> decimate to 50k pts -> voxelize 8x onto 120x512x512) and times:

  A. host prep (numpy, per mesh)
  B. full voxelize_batch(8) end-to-end + upload accounting
  C. single-mesh voxelize_mesh_device
  D. on-chip marginal: re-dispatch with resident key inputs
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu import runtime

runtime.setup_jax_cache()

from medicalimageanalysis_tpu.ops.marching_cubes import mask_to_mesh
from medicalimageanalysis_tpu.ops import voxelize as V
from medicalimageanalysis_tpu.utils.convert.contour import (
    ContourToDiscreteMesh)

# --- bench workload reconstruction -----------------------------------
theta = np.linspace(0, 2 * np.pi, 120, endpoint=False)
contours = []
for z in range(10, 110):
    r = 60 + 25 * np.sin(z / 9.0)
    cx_, cy_ = 256 + 30 * np.cos(z / 13.0), 256 + 20 * np.sin(z / 7.0)
    contours.append(np.stack(
        [cx_ + r * np.cos(theta), cy_ + r * np.sin(theta),
         np.full_like(theta, float(z))], axis=1))
for z in range(30, 80):
    r = 14 + 4 * np.sin(z / 5.0)
    contours.append(np.stack(
        [420.0 + r * np.cos(theta), 130.0 + r * np.sin(theta),
         np.full_like(theta, float(z))], axis=1))
c2m = ContourToDiscreteMesh(contour_pixel=[c.copy() for c in contours],
                            dimensions=[120, 512, 512], backend="cv2")
roi_mask = np.asarray(c2m.mask)
mesh = mask_to_mesh(roi_mask, [0.97, 0.97, 2.5], [0.0, 0.0, 0.0],
                    np.eye(3))
frac = min(1.0, 50000.0 / max(mesh.points.shape[0], 1))
mesh_d = mesh.decimate_pro(1.0 - frac) if frac < 1.0 else mesh
pts_pixel = np.asarray(mesh_d.points, np.float64) \
    / np.array([0.97, 0.97, 2.5])
faces = np.asarray(mesh_d.faces)
print(f"mesh: {pts_pixel.shape[0]} pts, {faces.shape[0]} faces",
      flush=True)

S, H, W = 120, 512, 512

# --- A: host prep ------------------------------------------------------
V._prep_mesh(pts_pixel, faces, "Axial", S, H, W)
t0 = time.perf_counter()
prep = V._prep_mesh(pts_pixel, faces, "Axial", S, H, W)
tA = time.perf_counter() - t0
crop = prep["crop"]
print(f"A. host prep: {tA*1000:.1f} ms/mesh; crop u=[{crop[0]},{crop[1]}]"
      f" v=[{crop[2]},{crop[3]}] k_hi={crop[4]}", flush=True)
for P, sel in prep["classes"].items():
    print(f"   class P={P}: {sel.size} tris", flush=True)

# --- B: full batch -----------------------------------------------------
vmeshes = [(pts_pixel, faces)] * 8
best = float("inf")
for timed in (False, True, True, True):
    stats = {}
    t0 = time.perf_counter()
    dvb = V.voxelize_batch(vmeshes, (120, 512, 512), as_numpy=False,
                           stats=stats)
    float(dvb.ravel()[0])
    dt = time.perf_counter() - t0
    if timed:
        best = min(best, dt)
        print(f"B. voxelize_batch(8): {dt*1000:.1f} ms -> "
              f"{dt*1000/8:.1f} ms/mesh  upload={stats['upload_bytes']/1e6:.2f} MB"
              f" programs={stats['n_programs']}", flush=True)
print(f"B-best: {best*1000/8:.1f} ms/mesh", flush=True)

# --- C: single mesh ----------------------------------------------------
for timed in (False, True, True):
    t0 = time.perf_counter()
    dvm = V.voxelize_mesh_device(pts_pixel, faces, (120, 512, 512),
                                 as_numpy=False)
    float(dvm.ravel()[0])
    if timed:
        print(f"C. voxelize_mesh_device(1): "
              f"{(time.perf_counter()-t0)*1000:.1f} ms", flush=True)

# --- D: on-chip marginal (inputs resident, re-run device programs) ----
# rebuild the chunk's device arrays once, then time the key+parity
# programs alone with resident inputs
preps = [V._prep_mesh(p, f, "Axial", S, H, W) for p, f in vmeshes]
stats = {}
out = V._voxelize_chunk(preps, S, H, W, stats=stats)
float(out.ravel()[0])
t0 = time.perf_counter()
out = V._voxelize_chunk(preps, S, H, W)
float(out.ravel()[0])
tD = time.perf_counter() - t0
print(f"D. chunk redo (host prep amortized out): {tD*1000:.1f} ms "
      f"-> {tD*1000/8:.1f} ms/mesh", flush=True)

# --- E: resident-input compute marginal --------------------------------
m = V.voxelize_compute_marginal_ms(vmeshes, (120, 512, 512), iters=3)
print(f"E. resident compute marginal: {m:.1f} ms/batch-pass "
      f"-> {m/8:.2f} ms/mesh", flush=True)
