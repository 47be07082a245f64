"""N4-style MR bias field correction (ops/n4.py) — BEYOND-PARITY:
the reference wraps SimpleITK (which ships
N4BiasFieldCorrectionImageFilter) but never exposes bias correction."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.ops.n4 import (bspline_smooth_field,
                                             n4_bias_correction)
from tests.helpers import write_ct_series


def _biased_volume(shape=(24, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, n) for n in shape],
                             indexing="ij")
    logb = 0.25 * zz + 0.18 * yy * xx - 0.15 * xx ** 2
    truth = np.where(zz ** 2 + yy ** 2 + xx ** 2 < 0.6, 800.0, 300.0)
    truth = np.clip(truth + rng.normal(0, 15, shape), 1, None)
    return truth * np.exp(logb), truth, np.exp(logb)


def test_smoother_reproduces_smooth_fields():
    """The WLS fit is an exact least-squares projection: fields well
    inside the spline space come back to f32 tolerance, dense and
    masked alike."""
    shape = (16, 24, 24)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, n) for n in shape],
                             indexing="ij")
    smooth = 0.1 * zz + 0.05 * yy * xx
    w = np.ones(shape, np.float32)
    for sp in (12, 6):
        f = bspline_smooth_field(smooth, w, sp)
        assert np.abs(f - smooth).max() < 5e-3, sp
    # constant field: partition of unity makes this representable
    f = bspline_smooth_field(np.full(shape, 0.3), w, 8)
    assert np.abs(f - 0.3).max() < 5e-3
    # masked fit still reproduces inside the mask and stays bounded
    wm = (xx > 0).astype(np.float32)
    f = bspline_smooth_field(smooth, wm, 8)
    assert np.abs((f - smooth)[xx > 0]).max() < 5e-3
    assert np.abs(f).max() < 1.0


def test_smoother_attenuates_noise():
    """Pure noise projects onto the coarse spline space with a large
    variance reduction (the fit must not amplify — the failure mode
    of Lee's one-shot heuristic under refinement)."""
    rng = np.random.default_rng(1)
    r = rng.normal(0, 0.05, (16, 24, 24))
    f = bspline_smooth_field(r, np.ones(r.shape, np.float32), 8)
    assert f.std() < 0.25 * r.std()
    assert np.abs(f).max() < 2.0 * 3 * 0.05


def test_n4_recovers_synthetic_bias():
    vol, truth, field_true = _biased_volume()
    corr, field_est = n4_bias_correction(vol, shrink=2,
                                         return_field=True)
    assert corr.dtype == np.float32 and corr.shape == vol.shape
    # multiplicative decomposition identity
    assert np.allclose(vol, corr * field_est, rtol=2e-3)
    # recovered field matches truth up to global scale: >=75% of the
    # log-bias std removed
    r = field_est / field_true
    r = r / r.mean()
    assert r.std() < 0.25 * (field_true.std() / field_true.mean())
    # shading of the bright tissue class tightens toward the noise CV
    bright = truth > 500
    cv_b = vol[bright].std() / vol[bright].mean()
    cv_a = corr[bright].std() / corr[bright].mean()
    assert cv_a < 0.45 * cv_b


def test_n4_shrink_consistency():
    """shrink is a fit-resolution knob, not a quality cliff: the
    recovered fields at shrink 2 and 4 agree closely."""
    vol, _, _ = _biased_volume(shape=(32, 40, 40), seed=2)
    _, f2 = n4_bias_correction(vol, shrink=2, return_field=True)
    _, f4 = n4_bias_correction(vol, shrink=4, return_field=True)
    ratio = f2 / f4
    assert ratio.std() / ratio.mean() < 0.03


def test_n4_mask_and_nonpositive_passthrough():
    vol, _, _ = _biased_volume()
    vol = vol.copy()
    vol[:4] = 0.0  # air padding
    vol[4] = -77.0  # negative intensities (background-subtracted MR)
    mask = np.zeros(vol.shape, bool)
    mask[6:, 4:-4, 4:-4] = True
    corr = n4_bias_correction(vol, mask=mask, shrink=2)
    # non-positive voxels pass through the division UNTOUCHED — both
    # zeros and negatives (review finding: negatives used to be
    # rescaled by the extrapolated field)
    assert np.all(corr[:4] == 0)
    assert np.all(corr[4] == np.float32(-77.0))
    assert np.isfinite(corr).all()
    # degenerate: empty mask returns the input untouched
    out, field = n4_bias_correction(np.zeros((4, 8, 8)),
                                    return_field=True)
    assert np.all(out == 0) and np.all(field == 1)


def test_finalize_host_matches_device():
    """The host separable-lerp finalize is an exact twin of the device
    map_coordinates path (both selected automatically from the
    measured transfer rate)."""
    import jax.numpy as jnp

    from medicalimageanalysis_tpu.ops.n4 import (_host_finalize,
                                                 _n4_finalize)
    rng = np.random.default_rng(9)
    vol = rng.normal(300, 50, (11, 14, 17))
    vol[0] = 0.0
    vol[1] = -5.0
    total = rng.normal(0, 0.1, (6, 7, 9))  # shrink-2 grid (ceil)
    c_h, f_h = _host_finalize(vol, total, 2, True)
    c_d, f_d = _n4_finalize(jnp.asarray(vol, jnp.float32),
                            jnp.asarray(total, jnp.float32), 2)
    assert np.allclose(f_h, np.asarray(f_d), rtol=1e-5, atol=1e-6)
    assert np.allclose(c_h, np.asarray(c_d), rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(c_d)[0] == 0) and np.all(c_h[0] == 0)
    assert np.all(np.asarray(c_d)[1] == np.float32(-5.0))


def test_n4_batch_rejects_mismatched_masks():
    import pytest

    from medicalimageanalysis_tpu.parallel.batch import n4_batch
    with pytest.raises(ValueError, match="masks shape"):
        n4_batch(np.ones((2, 8, 8, 8)), masks=np.ones((8, 8, 8)))


def test_device_sharpen_matches_host_golden():
    """The on-device Wiener sharpening (f32 XLA FFT inside the level
    loop) matches the host f64 golden to interp-table tolerance."""
    import jax.numpy as jnp

    from medicalimageanalysis_tpu.ops.n4 import (_device_sharpen,
                                                 _sharpen_from_hist)
    rng = np.random.default_rng(5)
    n_bins = 200
    h = rng.gamma(2.0, 50.0, n_bins).astype(np.float32)
    h[:20] = 0
    vmin, vmax = 5.1, 6.9
    c_d, m_d = _device_sharpen(jnp.asarray(h), jnp.float32(vmin),
                               jnp.float32(vmax), n_bins, 0.15, 0.01)
    c_h, m_h = _sharpen_from_hist(h, vmin, vmax, n_bins, 0.15, 0.01)
    scale = vmax - vmin
    assert np.abs(np.asarray(c_d) - c_h).max() < 1e-4 * scale
    assert np.abs(np.asarray(m_d) - m_h).max() < 1e-3 * scale
    # degenerate range -> identity mapping on both paths
    c_d, m_d = _device_sharpen(jnp.asarray(h), jnp.float32(2.0),
                               jnp.float32(2.0), n_bins, 0.15, 0.01)
    assert np.allclose(np.asarray(m_d), np.asarray(c_d))


def test_n4_rejects_non_3d():
    with pytest.raises(ValueError, match="expected"):
        n4_bias_correction(np.ones((8, 8)))


def test_n4_batch_matches_single_and_shards():
    """n4_batch lanes reproduce the single-volume trajectories (the
    convergence gate freezes early-converging lanes), empty-mask lanes
    come back untouched with unit fields, and the 'data'-sharded path
    matches the unsharded one."""
    from medicalimageanalysis_tpu.parallel.batch import n4_batch
    from medicalimageanalysis_tpu.parallel.mesh import make_mesh

    vols, fields = [], []
    for seed in range(3):
        v, _, f = _biased_volume(shape=(16, 24, 24), seed=seed)
        vols.append(v)
        fields.append(f)
    vols.append(np.zeros((16, 24, 24)))  # empty-mask lane
    fields.append(np.ones((16, 24, 24)))
    batch = np.stack(vols)
    corr_b, field_b = n4_batch(batch, shrink=2, return_fields=True)
    assert corr_b.shape == batch.shape and corr_b.dtype == np.float32
    # per-lane parity with the single-volume path: vmapped einsums
    # reduce in a different order, and ~60 iterations of histogram
    # feedback amplify the f32 delta — so compare the fields as a
    # ratio (unit mean, sub-percent spread), not elementwise
    for b in range(3):
        corr_s, field_s = n4_bias_correction(vols[b], shrink=2,
                                             return_field=True)
        ratio = field_b[b] / field_s
        assert abs(ratio.mean() - 1.0) < 2e-3, b
        assert ratio.std() < 5e-3, b
    # empty lane untouched
    assert np.all(corr_b[3] == 0) and np.allclose(field_b[3], 1.0)
    # sharded over 'data' reproduces the unsharded batch
    mesh = make_mesh(n_devices=4)
    corr_m, field_m = n4_batch(batch, shrink=2, return_fields=True,
                               mesh=mesh)
    # same compounded-f32 story shard-local (B=1) vs vmapped (B=4)
    assert np.abs(field_m / field_b - 1.0).max() < 5e-3


def test_image_correct_bias_method(tmp_path):
    """Image.correct_bias wires mask_roi + mm control spacing +
    in_place through to the kernel."""
    vol, _, field_true = _biased_volume(shape=(12, 32, 32), seed=3)
    write_ct_series(tmp_path / "mr", np.ascontiguousarray(
        vol.astype(np.int16)), modality="MR")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = list(Data.image.values())[0]
    corr, field = img.correct_bias(shrink=2, control_spacing_mm=25.0,
                                   return_field=True)
    assert corr.shape == img.array.shape
    r = field / field_true
    r = r / r.mean()
    assert r.std() < 0.5 * (field_true.std() / field_true.mean())
    before = img.array.copy()
    out = img.correct_bias(shrink=2, in_place=True)
    assert img.array is out and not np.array_equal(img.array, before)


# --- host-f64 full-loop twin (VERDICT r3 #8) ---------------------------
# A plain-NumPy float64 implementation of one N4 fitting level
# (masked histogram -> Wiener sharpen -> E[u|v] -> exact WLS B-spline
# smooth -> subtract, with the CV convergence gate), mirroring
# ops/n4._n4_level step for step. The device path is pinned against it
# per level — the same golden-twin pattern as the warp/EDT/DVH kernels.

def _host_wls_fit_apply(vol_r, w, bz, by, bx, bz2, by2, bx2):
    def ev(phi):
        f = np.einsum("cde,zc->zde", phi, bz)
        f = np.einsum("zde,yd->zye", f, by)
        return np.einsum("zye,xe->zyx", f, bx)

    def adj(vol, mz, my, mx):
        g = np.einsum("zyx,zc->cyx", vol, mz)
        g = np.einsum("cyx,yd->cdx", g, my)
        return np.einsum("cdx,xe->cde", g, mx)

    eps = 1e-12
    b = adj(w * vol_r, bz, by, bx)
    diag = adj(w, bz2, by2, bx2)
    lam = 1e-5 * max(diag.max(), eps)
    diag = diag + lam

    def a_op(phi):
        return adj(w * ev(phi), bz, by, bx) + lam * phi

    x = np.zeros_like(b)
    r = b.copy()
    z = r / diag
    p = z.copy()
    rz = (r * z).sum()
    rz0 = rz
    for _ in range(150):
        if not rz > 1e-10 * rz0:
            break
        ap = a_op(p)
        denom = (p * ap).sum()
        alpha = rz / max(denom, eps) if denom > 0 else 0.0
        x = x + alpha * p
        r = r - alpha * ap
        z = r / diag
        rz_n = (r * z).sum()
        beta = rz_n / max(rz, eps) if rz > 0 else 0.0
        p = z + beta * p
        rz = rz_n
    return ev(x)


def _host_n4_level(res, total, w, n_bins, fwhm, noise, conv_threshold,
                   max_iter, mats):
    from medicalimageanalysis_tpu.ops.n4 import _sharpen_from_hist

    eps = 1e-12
    res = res.astype(np.float64).copy()
    total = total.astype(np.float64).copy()
    n = max(w.sum(), 1.0)
    cv = 1e9
    i = 0
    while i < max_iter and cv >= conv_threshold:
        sel = w > 0
        vmin, vmax = res[sel].min(), res[sel].max()
        width = max(vmax - vmin, 1e-9) / n_bins
        idx = np.clip(((res - vmin) / width).astype(np.int64),
                      0, n_bins - 1)
        hist = np.zeros(n_bins)
        np.add.at(hist, idx.ravel(), w.ravel())
        centers, mapping = _sharpen_from_hist(hist, vmin, vmax, n_bins,
                                              fwhm, noise)
        euv = np.interp(res, centers, mapping)
        r = np.where(sel, res - euv, 0.0)
        f = _host_wls_fit_apply(r, w, *mats)
        f = f - (f * w).sum() / n
        ef = np.exp(f)
        mu = (ef * w).sum() / n
        var = (w * (ef - mu) ** 2).sum() / n
        cv = np.sqrt(max(var, 0.0)) / max(mu, eps)
        res -= f
        total += f
        i += 1
    return res, total


@pytest.mark.parametrize("bias_mode", ["poly", "waves"])
def test_n4_device_level_matches_host_f64_twin(bias_mode):
    """Pin every fitting level of the device N4 program against the
    plain-NumPy f64 twin: identical level inputs, outputs compared on
    the accumulated log-field and the residual."""
    import jax.numpy as jnp

    from medicalimageanalysis_tpu.ops.n4 import (_bspline_basis_matrix,
                                                 _level_basis_mats,
                                                 _level_spacings,
                                                 _n4_level)

    shape = (16, 24, 24)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, n) for n in shape],
                             indexing="ij")
    if bias_mode == "poly":
        logb = 0.3 * zz + 0.2 * yy * xx - 0.18 * xx ** 2
    else:
        logb = 0.22 * np.sin(1.3 * zz + 0.4) + 0.15 * np.cos(
            1.1 * yy) * xx
    rng = np.random.default_rng(3)
    truth = np.where(zz ** 2 + yy ** 2 + xx ** 2 < 0.55, 700.0, 250.0)
    truth = np.clip(truth + rng.normal(0, 10, shape), 1, None)
    vol = truth * np.exp(logb)

    w64 = (vol > 0).astype(np.float64)
    res64 = np.where(w64 > 0, np.log(vol), 0.0)
    tot64 = np.zeros_like(res64)
    n_bins, fwhm, noise, thr, iters = 64, 0.15, 0.01, 1e-4, 6

    for sp_vox in _level_spacings(shape, 3, 8.0, 1):
        mats_dev = _level_basis_mats(shape, sp_vox)
        mats_host = [_bspline_basis_matrix(n, sp_vox[ax], p)
                     for p in (1, 2) for ax, n in enumerate(shape)]

        def dev_level(n_it):
            return _n4_level(
                jnp.asarray(res64, jnp.float32),
                jnp.asarray(tot64, jnp.float32),
                jnp.asarray(w64, jnp.float32), n_bins, fwhm, noise,
                thr, n_it, *mats_dev)

        # tier 1 — ONE iteration from identical inputs: the f32 CG
        # contributes ~9e-4 abs, so 2e-3 catches any transposed
        # contraction / wrong mapping / binning bug outright (field
        # updates are O(0.05))
        res_d1, tot_d1 = dev_level(1)
        res_h1, tot_h1 = _host_n4_level(res64, tot64, w64, n_bins,
                                        fwhm, noise, thr, 1, mats_host)
        np.testing.assert_allclose(np.asarray(tot_d1), tot_h1,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_d1), res_h1,
                                   atol=2e-3)

        # tier 2 — the full level (convergence gate live): per-iter
        # f32 noise compounds, so 1.2e-2; a gate/trajectory bug costs
        # a whole O(0.05) update and still fails
        res_d, tot_d = dev_level(iters)
        res_h, tot_h = _host_n4_level(res64, tot64, w64, n_bins, fwhm,
                                      noise, thr, iters, mats_host)
        np.testing.assert_allclose(np.asarray(tot_d), tot_h,
                                   atol=1.2e-2)
        np.testing.assert_allclose(np.asarray(res_d), res_h,
                                   atol=1.2e-2)
        # propagate the HOST state so each level is pinned from
        # identical inputs
        res64, tot64 = res_h, tot_h

    # smoke check on the same fixture: the accumulated field tracks
    # the true log-bias direction (recovery QUALITY is pinned by
    # test_n4_recovers_synthetic_bias at production settings; this
    # tiny 6-iter fixture only needs to move the right way)
    lb = logb - logb.mean()
    tb = tot64 - tot64.mean()
    err = np.abs(tb - lb).mean() / np.abs(lb).mean()
    assert err < 0.6, err
