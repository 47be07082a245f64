"""On-chip component profile of voxelize_mesh_device (bench shapes).

Where do the ~155 ms/mesh go? Candidate terms: host prep
(_mesh_key_chunks numpy classing), per-class _window_keys dispatches,
_parity_from_keys (scatter+cumsum), and the relay RPC floor per
dispatch. Marginal timings (K vs 4K reps inside one program,
perturbed inputs) separate compute from dispatch.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu import runtime

runtime.setup_jax_cache()

from medicalimageanalysis_tpu.ops import voxelize as V
from medicalimageanalysis_tpu.ops.marching_cubes import mask_to_mesh

S, H, W = 120, 512, 512
zz, yy, xx = np.mgrid[0:S, 0:H, 0:W]
mask = ((((zz - 60) * 2.5) ** 2 + ((yy - 256) * 0.97) ** 2
         + ((xx - 256) * 0.97) ** 2) < 150.0 ** 2).astype(np.uint8)
mesh = mask_to_mesh(mask, [0.97, 0.97, 2.5], [0.0, 0.0, 0.0], np.eye(3))
frac = min(1.0, 50000.0 / max(mesh.points.shape[0], 1))
mesh_d = mesh.decimate_pro(1.0 - frac) if frac < 1.0 else mesh
pts = np.asarray(mesh_d.points, np.float64) / np.array([0.97, 0.97, 2.5])
faces = np.asarray(mesh_d.faces, np.int64)
print("faces:", faces.shape[0], "points:", pts.shape[0], flush=True)

tri_xyz = pts[faces]
tri = np.stack([tri_xyz[..., 2], tri_xyz[..., 1], tri_xyz[..., 0]], -1)

# --- end-to-end (matches bench) --------------------------------------
for timed in (False, True, True):
    t0 = time.perf_counter()
    out = V.voxelize_mesh_device(pts, faces, (S, H, W), as_numpy=False)
    float(out.ravel()[0])
    if timed:
        print(f"end_to_end_ms {(time.perf_counter()-t0)*1e3:.1f}",
              flush=True)

# --- host prep + dispatch enqueue ------------------------------------
for _ in range(3):
    t0 = time.perf_counter()
    chunks, host_term = V._mesh_key_chunks(tri, S, H, W)
    t1 = time.perf_counter()
    for c in chunks:
        c.block_until_ready()
    print(f"prep_enqueue_ms {(t1-t0)*1e3:.1f} "
          f"chunks_ready_ms {(time.perf_counter()-t0)*1e3:.1f} "
          f"n_chunks {len(chunks)} sizes {[int(c.size) for c in chunks]} "
          f"host_term {host_term is not None}", flush=True)

keys = jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]
keys.block_until_ready()
N = int(keys.size)
print("total keys:", N, flush=True)

# --- marginal _parity_from_keys: K vs 4K reps in ONE program ----------
from functools import partial


@partial(jax.jit, static_argnames=("reps",))
def parity_scan(k0, reps):
    def body(acc, i):
        # perturb: shift the miss sentinel trick — add i to VALID keys
        # mod nothing (keys already < hw*(S+1)); adding 0/1 alternates
        kk = jnp.where(k0 >= 0, k0 ^ (i & 1), k0)
        m = V._parity_from_keys(kk, S, H, W)
        return acc + jnp.sum(m, dtype=jnp.int32), 0

    acc, _ = jax.lax.scan(body, jnp.int32(0),
                          jnp.arange(reps, dtype=jnp.int32))
    return acc


for reps in (2, 8):
    float(parity_scan(keys, reps))
t = {}
for reps in (2, 8):
    t0 = time.perf_counter()
    float(parity_scan(keys, reps))
    t[reps] = time.perf_counter() - t0
par_ms = (t[8] - t[2]) / 6 * 1e3
print(f"parity_marginal_ms {par_ms:.2f} (2reps {t[2]*1e3:.1f} "
      f"8reps {t[8]*1e3:.1f})", flush=True)

