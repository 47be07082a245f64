"""Intensity-standardization filters (ops/filters.histogram_match)
— NEW; sitk HistogramMatchingImageFilter equivalent."""

def test_histogram_match_recovers_affine_remap():
    """A gamma-curved copy of a volume maps back onto the original's
    distribution: matched quantiles align within table resolution."""
    import numpy as np
    from medicalimageanalysis_tpu.ops.filters import histogram_match

    rng = np.random.default_rng(0)
    ref = rng.normal(300.0, 80.0, size=(8, 32, 32)).astype(np.float32)
    # moving = nonlinear monotone remap of the same anatomy
    mov = (np.clip(ref, 0, None) / 500.0) ** 1.7 * 900.0 + 50.0
    out = np.asarray(histogram_match(mov, ref, n_quantiles=256))
    assert out.shape == mov.shape and out.dtype == np.float32
    for q in (10, 25, 50, 75, 90):
        assert abs(np.percentile(out, q) - np.percentile(ref, q)) < 8.0
    # monotone: ordering of voxels is preserved
    flat_m, flat_o = mov.ravel(), out.ravel()
    idx = np.argsort(flat_m)
    assert np.all(np.diff(flat_o[idx]) >= -1e-3)


def test_histogram_match_exclude_below():
    import numpy as np
    import pytest
    from medicalimageanalysis_tpu.ops.filters import histogram_match

    rng = np.random.default_rng(1)
    body = rng.normal(200.0, 30.0, size=(4, 16, 16)).astype(np.float32)
    ref = body.copy()
    mov = body * 2.0
    # drown both in background that would skew the tables
    ref[:, :8] = -1000.0
    mov[:, :8] = -1000.0
    out = np.asarray(histogram_match(mov, ref, exclude_below=-500.0))
    sel = slice(None), slice(8, None)
    assert abs(np.median(out[sel]) - np.median(ref[sel])) < 10.0
    with pytest.raises(ValueError, match="every voxel"):
        histogram_match(mov, ref, exclude_below=1e9)


def test_histogram_match_large_magnitude_flat_background():
    """Regression (review finding): at intensity magnitudes where a
    range-scaled epsilon underflows float32 resolution, the quantile
    table used to keep duplicate knots, anchoring a dominant flat
    background at the END of the collapsed run. The table must stay
    strictly increasing so the background maps to the run's lower
    edge — invariant under a constant intensity offset."""
    import numpy as np
    from medicalimageanalysis_tpu.ops.filters import histogram_match

    rng = np.random.default_rng(7)
    body = rng.uniform(100.0, 400.0, size=(4, 24, 24)).astype(np.float32)
    ref = rng.uniform(100.0, 400.0, size=(4, 24, 24)).astype(np.float32)
    mov = body.copy()
    mov[:2] = 100.0  # 50% flat background
    ref[:2] = 100.0

    lo = float(np.asarray(histogram_match(mov, ref))[:2].mean())
    # identical distributions shifted to magnitude 1e4: eps used to
    # collapse (ulp(1e4) ~ 1e-3 > 1e-6 * range)
    hi_out = np.asarray(histogram_match(mov + 10000.0, ref + 10000.0))
    hi = float(hi_out[:2].mean()) - 10000.0
    assert abs(hi - lo) < 1.0, (lo, hi)
    # table knots must be strictly increasing in float32 at magnitude
    # (indirect check: the mapped background sits at the table's lower
    # edge, i.e. near the background value itself, not the run's end)
    assert abs(hi - 100.0) < 2.0


def test_anisotropic_diffusion_preserves_edges():
    """Perona-Malik: flat-region noise drops sharply while a strong
    step edge keeps nearly all its contrast — the property the plain
    Gaussian cannot have at equal smoothing."""
    import numpy as np

    from medicalimageanalysis_tpu.ops.filters import (
        anisotropic_diffusion, gaussian_filter)

    rng = np.random.default_rng(0)
    vol = np.where(np.arange(48)[None, None, :] < 24, 0.0, 500.0)
    vol = np.broadcast_to(vol, (12, 32, 48)).copy()
    vol += rng.normal(0, 10, vol.shape)
    out = np.asarray(anisotropic_diffusion(vol, iterations=10,
                                           kappa=30.0))
    assert out.shape == vol.shape and out.dtype == np.float32
    flat = np.s_[2:-2, 2:-2, 4:18]
    assert out[flat].std() < 0.5 * vol[flat].std()
    # edge contrast across x=23|24 stays >= 95%
    edge_after = out[:, :, 26:30].mean() - out[:, :, 18:22].mean()
    assert edge_after > 0.95 * 500.0
    # the Gaussian achieving the same flat-noise reduction blurs the
    # 2-voxel transition zone; anisotropic keeps it sharp
    gau = np.asarray(gaussian_filter(vol, 1.5))
    trans_a = out[:, :, 24].mean() - out[:, :, 23].mean()
    trans_g = gau[:, :, 24].mean() - gau[:, :, 23].mean()
    assert trans_a > 1.5 * trans_g
    # reciprocal conductance + validation
    out2 = np.asarray(anisotropic_diffusion(vol, iterations=3,
                                            kappa=30.0,
                                            conductance="reciprocal"))
    assert np.isfinite(out2).all()
    import pytest
    with pytest.raises(ValueError, match="conductance"):
        anisotropic_diffusion(vol, conductance="linear")
    with pytest.raises(ValueError, match="expected"):
        anisotropic_diffusion(vol[0])


def test_curvature_flow_denoises():
    import numpy as np

    from medicalimageanalysis_tpu.ops.filters import curvature_flow

    rng = np.random.default_rng(1)
    zz, yy, xx = np.mgrid[0:16, 0:32, 0:32].astype(np.float32)
    vol = 300.0 / (1.0 + np.exp(-(xx - 16.0)))  # smooth sigmoid edge
    vol = vol + rng.normal(0, 8, vol.shape)
    out = np.asarray(curvature_flow(vol, iterations=10, time_step=0.05))
    assert out.shape == vol.shape and np.isfinite(out).all()
    flat = np.s_[2:-2, 2:-2, 2:8]
    assert out[flat].std() < 0.7 * vol[flat].std()
    # edge contrast retained
    assert (out[:, :, 24:].mean() - out[:, :, :8].mean()) > \
        0.9 * (vol[:, :, 24:].mean() - vol[:, :, :8].mean())


def test_anisotropic_diffusion_physical_gradient_conductance():
    """The conductance gates on the PHYSICAL gradient df/spacing
    (ITK semantics) — a raw-difference gate would make kappa
    axis-dependent under anisotropic spacing. Pinned analytically on a
    single step face: spacing_z = 3, step height 30, kappa = 10 ->
    grad = 10 -> c = exp(-1) (a raw-df gate would give exp(-9))."""
    import numpy as np

    from medicalimageanalysis_tpu.ops.filters import anisotropic_diffusion

    vol = np.zeros((4, 4, 4), np.float32)
    vol[2:] = 30.0  # step between z=1 and z=2
    sp = (1.0, 1.0, 3.0)  # [sx, sy, sz]
    t = 1.0 / (2.0 * (1.0 + 1.0 + 1.0 / 9.0))
    out = np.asarray(anisotropic_diffusion(
        vol, iterations=1, kappa=10.0, spacing_xyz=sp,
        conductance="exp"))
    c = np.exp(-((30.0 / 3.0) / 10.0) ** 2)
    delta = t * c * 30.0 / 9.0  # time_step * c * df / sz^2
    np.testing.assert_allclose(out[1], 0.0 + delta, rtol=1e-5)
    np.testing.assert_allclose(out[2], 30.0 - delta, rtol=1e-5)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[3], 30.0, atol=1e-5)
