"""LNCC (ANTs-CC) demons forces — BEYOND-PARITY cross-modality
deformable registration (ops/registration/demons.py forces='lncc';
the reference's ITK demons filters are all intensity-difference)."""

import numpy as np
import pytest

from medicalimageanalysis_tpu.ops.registration.demons import (
    demons_registration)


def _pair(shape=(24, 48, 48), seed=0, max_shift=2.5):
    """A blob phantom, a known smooth x-deformation of it, and the
    evaluation core. Returns (fixed, moving_same, -dx truth, core)."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, n) for n in shape],
                             indexing="ij")
    blobs = (np.exp(-((xx - 0.3) ** 2 + yy ** 2 + zz ** 2) / 0.08) * 600
             + np.exp(-((xx + 0.4) ** 2 + (yy - 0.2) ** 2 + zz ** 2)
                      / 0.12) * 400
             + np.exp(-((yy + 0.5) ** 2 + xx ** 2 + (zz - 0.3) ** 2)
                      / 0.1) * 500)
    fixed = (blobs + rng.normal(0, 5, shape)).astype(np.float32)
    dx = max_shift * np.exp(-(xx ** 2 + yy ** 2) / 0.5)
    coords = np.meshgrid(*[np.arange(n, dtype=np.float64)
                           for n in shape], indexing="ij")
    moving = ndimage.map_coordinates(
        fixed, [coords[0], coords[1], coords[2] + dx], order=1,
        mode="nearest").astype(np.float32)
    core = ((np.abs(xx) < 0.7) & (np.abs(yy) < 0.7) & (np.abs(zz) < 0.7)
            & (blobs > 100))
    return fixed, moving, -dx, core


def test_lncc_recovers_inverted_contrast():
    """The canonical contrast-reversal pair: SSD demons fails outright
    (its update sign flips), LNCC recovers the field."""
    fixed, moving, truth, core = _pair()
    inverted = (700.0 - moving).astype(np.float32)
    dvf = demons_registration(fixed, inverted, (1.0, 1.0, 1.0),
                              method="fast", iterations=150, step=1.0,
                              forces="lncc")
    err = np.abs(dvf[..., 0] - truth)[core]
    assert err.mean() < 0.5  # truth magnitude averages 1.7 in core
    dvf_ssd = demons_registration(fixed, inverted, (1.0, 1.0, 1.0),
                                  method="fast", iterations=150,
                                  step=1.0)
    err_ssd = np.abs(dvf_ssd[..., 0] - truth)[core]
    assert err_ssd.mean() > 3.0 * err.mean()


def test_lncc_beats_ssd_on_gamma_remap():
    """Nonlinear monotone intensity remap (cross-scanner MR stand-in):
    LNCC converges materially closer than SSD."""
    fixed, moving, truth, core = _pair(seed=1)
    gam = ((np.clip(moving, 0, None) / 700.0) ** 0.5
           * 300.0).astype(np.float32)
    kw = dict(method="fast", iterations=150, step=1.0)
    err_l = np.abs(demons_registration(
        fixed, gam, (1.0, 1.0, 1.0), forces="lncc", **kw)[..., 0]
        - truth)[core].mean()
    err_s = np.abs(demons_registration(
        fixed, gam, (1.0, 1.0, 1.0), **kw)[..., 0]
        - truth)[core].mean()
    assert err_l < 0.9
    assert err_l < 0.75 * err_s


def test_lncc_same_contrast_parity_with_ssd():
    """On a same-contrast pair LNCC lands in the same quality class as
    the tuned SSD path (it must not be a cross-modality-only mode)."""
    fixed, moving, truth, core = _pair(seed=2)
    dvf = demons_registration(fixed, moving, (1.0, 1.0, 1.0),
                              method="fast", iterations=150, step=1.0,
                              forces="lncc")
    assert np.abs(dvf[..., 0] - truth)[core].mean() < 0.45


def test_lncc_composes_with_diffeomorphic():
    fixed, moving, truth, core = _pair(seed=3)
    inverted = (700.0 - moving).astype(np.float32)
    dvf = demons_registration(fixed, inverted, (1.0, 1.0, 1.0),
                              method="diffeomorphic", iterations=150,
                              step=1.0, forces="lncc")
    assert np.abs(dvf[..., 0] - truth)[core].mean() < 0.6


def test_syn_recovers_and_is_inverse_consistent():
    """Greedy SyN: same-quality recovery as fast demons on the SSD
    pair, and the defining property — swapping fixed/moving yields the
    inverse field (their composition is ~0)."""
    from medicalimageanalysis_tpu.ops.registration.dvf import (
        compose_dvf)

    fixed, moving, truth, core = _pair(seed=5)
    kw = dict(method="syn", iterations=100, step=2.0)
    fwd = demons_registration(fixed, moving, (1.0, 1.0, 1.0), **kw)
    assert np.abs(fwd[..., 0] - truth)[core].mean() < 0.3
    bwd = demons_registration(moving, fixed, (1.0, 1.0, 1.0), **kw)
    comp = compose_dvf(bwd, fwd, (1.0, 1.0, 1.0))
    assert np.abs(comp[core]).mean() < 0.05


def test_syn_lncc_inverted_contrast():
    """The ANTs CC+SyN combination on the contrast-reversal pair."""
    fixed, moving, truth, core = _pair(seed=6)
    inverted = (700.0 - moving).astype(np.float32)
    dvf = demons_registration(fixed, inverted, (1.0, 1.0, 1.0),
                              method="syn", iterations=150, step=2.0,
                              forces="lncc")
    assert np.abs(dvf[..., 0] - truth)[core].mean() < 0.75


def test_syn_pyramid_path():
    fixed, moving, truth, core = _pair(seed=7, shape=(16, 32, 32),
                                       max_shift=1.5)
    dvf = demons_registration(fixed, moving, (1.0, 1.0, 1.0),
                              method="syn", iterations=60, step=2.0,
                              pyramid=(2, 1))
    assert np.abs(dvf[..., 0] - truth)[core].mean() < 0.35


def test_demons_batch_syn_routing():
    """demons_batch(method='syn') must hit the SyN core, not fall
    through to the Thirion loop."""
    from medicalimageanalysis_tpu.parallel.batch import demons_batch

    fixed, moving, truth, core = _pair(shape=(16, 32, 32), seed=8,
                                       max_shift=1.5)
    batch = demons_batch(np.stack([fixed]), np.stack([moving]),
                         (1.0, 1.0, 1.0), method="syn", iterations=60,
                         step=2.0)
    err = np.abs(np.asarray(batch[0])[..., 0] - truth)[core]
    assert err.mean() < 0.4


def test_forces_validation():
    with pytest.raises(ValueError, match="forces"):
        demons_registration(np.ones((4, 8, 8)), np.ones((4, 8, 8)),
                            forces="ncc")
    with pytest.raises(ValueError, match="unknown method"):
        demons_registration(np.ones((4, 8, 8)), np.ones((4, 8, 8)),
                            method="sny")
    from medicalimageanalysis_tpu.parallel.batch import demons_batch
    with pytest.raises(ValueError, match="forces"):
        demons_batch(np.ones((1, 4, 8, 8)), np.ones((1, 4, 8, 8)),
                     forces="LNCC ")
    # canonical ANTs casing routes to the SyN core, not the Thirion
    # fallthrough (method strings are normalized)
    d = demons_registration(np.ones((6, 10, 10), np.float32),
                            np.ones((6, 10, 10), np.float32),
                            method="SyN", iterations=2)
    assert d.shape == (6, 10, 10, 3)


def test_demons_batch_lncc_passthrough():
    """demons_batch(forces='lncc') lanes match the single-pair path."""
    from medicalimageanalysis_tpu.parallel.batch import demons_batch

    fixed, moving, truth, core = _pair(shape=(16, 32, 32), seed=4,
                                       max_shift=1.5)
    inverted = (700.0 - moving).astype(np.float32)
    single = demons_registration(fixed, inverted, (1.0, 1.0, 1.0),
                                 method="fast", iterations=40,
                                 step=1.0, forces="lncc")
    batch = demons_batch(np.stack([fixed, fixed]),
                         np.stack([inverted, inverted]),
                         (1.0, 1.0, 1.0), method="fast", iterations=40,
                         step=1.0, forces="lncc")
    # the per-iteration peak normalization amplifies f32 reduction-
    # order differences, so compare recovered fields statistically,
    # not elementwise
    err_single = np.abs(single[..., 0] - truth)[core].mean()
    assert err_single < 0.4
    for b in range(2):
        lane = np.asarray(batch[b])
        assert np.abs(lane - single).mean() < 2e-2, b
        err_lane = np.abs(lane[..., 0] - truth)[core].mean()
        assert err_lane < 0.4, b
