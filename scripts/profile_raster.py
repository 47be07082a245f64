"""On-chip timing of the device XOR rasterizer (bench config #2
workload: ~150 liver-scale contours, 512x512 grid) vs cv2 host path.

Times the device program with inputs resident and a 1-element pull
(the 31 MB mask download is tunnel-bound and excluded — local hardware
has PCIe)."""

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


def main():
    from medicalimageanalysis_tpu.ops.rasterize import (
        _polygon_bitmaps, _bucket)

    theta = np.linspace(0, 2 * np.pi, 120, endpoint=False)
    polygons = []
    for z in range(10, 110):
        r = 60 + 25 * np.sin(z / 9.0)
        cx_, cy_ = 256 + 30 * np.cos(z / 13.0), 256 + 20 * np.sin(z / 7.0)
        polygons.append(np.stack(
            [cx_ + r * np.cos(theta), cy_ + r * np.sin(theta)], axis=1))
    for z in range(30, 80):
        r = 14 + 4 * np.sin(z / 5.0)
        polygons.append(np.stack(
            [420.0 + r * np.cos(theta), 130.0 + r * np.sin(theta)],
            axis=1))
    H = W = 512
    K = len(polygons)
    E = _bucket(max(p.shape[0] for p in polygons))
    Kb = _bucket(K, minimum=1)
    verts = np.zeros((Kb, E + 1, 2), dtype=np.int32)
    edge_valid = np.zeros((Kb, E), dtype=bool)
    for k, poly in enumerate(polygons):
        p = np.trunc(poly + 1e-6).astype(np.int32)
        n = p.shape[0]
        verts[k, :n] = p
        verts[k, n:] = p[0]
        edge_valid[k, :n] = True
    vd = jax.device_put(jnp.asarray(verts))
    ed = jax.device_put(jnp.asarray(edge_valid))
    jax.block_until_ready((vd, ed))

    out = _polygon_bitmaps(vd, ed, H, W)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    out = _polygon_bitmaps(vd, ed, H, W)
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) * 1e3
    print(f"device bitmaps K={K}(pad {Kb}) E={E} {H}x{W}: {dt:.1f} ms "
          f"on-chip")

    # cv2 comparison (host)
    import cv2
    t0 = time.perf_counter()
    masks = np.zeros((K, H, W), np.uint8)
    for k, poly in enumerate(polygons):
        cv2.fillPoly(masks[k], [poly.astype(np.int32)], 1)
    dt_cv = (time.perf_counter() - t0) * 1e3
    print(f"cv2 fillPoly host: {dt_cv:.1f} ms")


if __name__ == "__main__":
    main()
