"""Chip re-certification: run after ANY kernel edit (VERDICT r4 #4).

    python -m pytest tests_tpu -q        # or: -m tpu

Covers the three hardware-only failure classes round 2 taught us plus
the recorded kernel pins:

1. Mosaic-lowered Pallas kernels vs XLA twins (the 12 bench pins);
2. an end-to-end mini-ingest through the public API with device
   compute on the real chip;
3. shard_map + Pallas composition (round-2 bug: vma validation only
   fails on hardware);
4. lax.map-batched pallas_call (round-2 bug: vmap around an ANY-space
   operand only fails on hardware — batching must stay map/scan).
"""

import numpy as np
import pytest


def test_kernel_pins(tpu_backend):
    from medicalimageanalysis_tpu.validate import validate_kernels

    res = validate_kernels(fast=True)
    assert res["backend"] == tpu_backend
    bad = {k: res["detail"].get(k, "") for k, ok in res["checks"].items()
           if not ok}
    assert res["ok"], f"kernel pins failed on hardware: {bad}"


def test_mini_ingest_end_to_end(tpu_backend, tmp_path, rng):
    """Synthetic DICOM -> read_dicoms -> device preprocess, with the
    chunked/flat bit-equality pin executed on the REAL chip (the CPU
    suite already pins it, but XLA:TPU fuses differently)."""
    import jax

    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.data import Data
    from medicalimageanalysis_tpu.parallel.batch import make_preprocess_fn
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    Data.clear()
    arr = rng.integers(-1000, 2000, size=(8, 32, 32)).astype(np.int16)
    CreateDicomImage(str(tmp_path), arr, spacing=[1.0, 1.0],
                     thickness=2.0).run()
    mia.read_dicoms(folder_path=str(tmp_path))
    assert len(Data.image_list) == 1
    img = Data.image[Data.image_list[0]]
    np.testing.assert_array_equal(np.asarray(img.array, np.int16), arr)

    raw = np.stack([arr] * 8)
    slopes = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    icepts = rng.uniform(-100, 100, 8).astype(np.float32)
    flat = make_preprocess_fn((8, 32, 32), (8, 16, 16),
                              ffs_op="ax_rot2", chunk=None)
    auto = make_preprocess_fn((8, 32, 32), (8, 16, 16),
                              ffs_op="ax_rot2", chunk="auto")
    vf, mf = jax.jit(flat)(raw, slopes, icepts)
    va, ma = jax.jit(auto)(raw, slopes, icepts)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(va))
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(ma))
    Data.clear()


def test_shardmap_pallas_composition(tpu_backend, rng):
    """demons_z_sharded (shard_map wrapping the Pallas tile-slab warp,
    halo ppermute ring) must run and match the dense single-device
    loop ON HARDWARE — shard_map's vma validation over a Pallas body
    is invisible to the CPU suite (round-2 lesson, CLAUDE.md)."""
    import jax

    from medicalimageanalysis_tpu.ops.registration.demons import (
        demons_registration)
    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume
    from medicalimageanalysis_tpu.parallel.halo import (demons_z_sharded,
                                                        warp_z_sharded)
    from medicalimageanalysis_tpu.parallel.mesh import make_mesh

    zz, yy, xx = np.mgrid[0:32, 0:24, 0:40].astype(np.float32)
    fixed = np.exp(-(((zz - 16) / 6) ** 2 + ((yy - 12) / 5) ** 2
                     + ((xx - 20) / 8) ** 2)).astype(np.float32) * 100
    moving = np.roll(fixed, shift=2, axis=2) + \
        rng.normal(0, 0.1, fixed.shape).astype(np.float32)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, space=2 if n_dev % 2 == 0 else 1)

    # sharp check: the NON-iterative sharded warp must match the dense
    # kernel (same contract as the CPU parity test: field bounded
    # within halo reach, coordinate-arithmetic reassociation allows
    # atol 2e-3 on ~100-amplitude volumes)
    dvf = rng.uniform(-3.5, 3.5, size=fixed.shape + (3,)).astype(
        np.float32)
    dense = np.asarray(warp_volume(moving, dvf, (1.0, 1.0, 1.0),
                                   background=-3001))
    shard = np.asarray(warp_z_sharded(moving, dvf, mesh,
                                      (1.0, 1.0, 1.0),
                                      background=-3001, halo=8))
    np.testing.assert_allclose(shard, dense, atol=2e-3,
                               err_msg="sharded warp diverges on chip")

    # composition + sanity check: ITERATIVE demons amplifies
    # per-program rounding (peak normalization re-scales every step,
    # so dense-vs-sharded XLA fusion differences compound ~1e-3/iter —
    # CLAUDE.md round-3 LNCC notes); exactness is the CPU suite's job,
    # hardware certifies the shard_map+Pallas composition runs and
    # tracks the dense trajectory
    ref = demons_registration(fixed, moving, (1.0, 1.0, 1.0),
                              method="fast", iterations=8, std=1)
    got = demons_z_sharded(fixed, moving, mesh, (1.0, 1.0, 1.0),
                           method="fast", iterations=8, std=1)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.15, f"sharded demons diverges on hardware ({err})"
    assert np.isfinite(np.asarray(got)).all()


def test_lax_map_batched_pallas_warp(tpu_backend, rng):
    """Batching the Pallas warp must go through lax.map (NEVER vmap —
    an ANY-space operand under vmap is a hardware-only crash). Pin
    the map-batched path against per-item calls on the chip."""
    import jax
    import jax.numpy as jnp

    from medicalimageanalysis_tpu.ops.registration.dvf import warp_volume

    vols = rng.normal(size=(3, 16, 24, 32)).astype(np.float32)
    dvfs = rng.normal(scale=1.5, size=(3, 16, 24, 32, 3)).astype(
        np.float32)

    def one(v, d):
        return warp_volume(v, d, (1.0, 1.0, 1.0), background=-5.0)

    batched = jax.jit(lambda vs, ds: jax.lax.map(
        lambda t: one(*t), (vs, ds)))
    out_b = np.asarray(batched(jnp.asarray(vols), jnp.asarray(dvfs)))
    for i in range(3):
        out_i = np.asarray(jax.jit(one)(vols[i], dvfs[i]))
        np.testing.assert_array_equal(out_b[i], out_i)


def test_pooled_roi_mask_path_on_chip(tpu_backend, tmp_path, rng):
    """The round-5 serving path for Roi.compute_mask — one pooled
    rasterize_batch pass + bbox-packed cache — forced onto the DEVICE
    backend (the link-rate gate picks cv2 through the tunnel) and
    pinned bit-equal to the cv2 host twin on the real chip. Also pins
    cache-hit serving and token-keyed invalidation on replacement."""
    import medicalimageanalysis_tpu as mia
    import medicalimageanalysis_tpu.utils.convert.contour as contour_mod
    from medicalimageanalysis_tpu.data import Data
    from medicalimageanalysis_tpu.structure.roi import Roi
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    Data.clear()
    arr = rng.integers(-1000, 2000, size=(8, 32, 32)).astype(np.int16)
    CreateDicomImage(str(tmp_path), arr, spacing=[1.0, 1.0],
                     thickness=2.0).run()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image[Data.image_list[0]]

    theta = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    for k, name in enumerate(("A", "B", "C")):
        roi = Roi(img, name=name)
        roi.contour_pixel = [
            np.stack([16 + (5 + k) * np.cos(theta) + k,
                      16 + (4 + k) * np.sin(theta) - k,
                      np.full_like(theta, float(z))], axis=1)
            for z in range(1, 7)]
        img.rois[name] = roi

    orig = contour_mod._pick_raster_backend
    contour_mod._pick_raster_backend = lambda *a, **k: "device"
    try:
        pooled = img.compute_roi_masks()
    finally:
        contour_mod._pick_raster_backend = orig

    for name in ("A", "B", "C"):
        host = np.asarray(img.rois[name]._compute_mask_impl(), np.uint8)
        np.testing.assert_array_equal(
            pooled[name], host,
            err_msg=f"device pooled mask != cv2 twin for {name}")
        assert pooled[name].sum() > 0
        # cache-hit serving: no recompute, fresh array
        hit = img.rois[name].compute_mask()
        np.testing.assert_array_equal(hit, host)

    # replacement Roi (token-keyed, not id-keyed) invalidates
    old_a = pooled["A"]
    del img.rois["A"]
    repl = Roi(img, name="A")
    repl.contour_pixel = [
        np.stack([16 + 3 * np.cos(theta), 16 + 3 * np.sin(theta),
                  np.full_like(theta, float(z))], axis=1)
        for z in range(2, 5)]
    img.rois["A"] = repl
    new_a = repl.compute_mask()
    assert not np.array_equal(new_a, old_a), \
        "stale cached mask served after Roi replacement on chip"
    Data.clear()
