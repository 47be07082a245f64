"""N4-style MR bias field correction — TPU-native.

BEYOND-PARITY: the reference wraps SimpleITK (which ships
N4BiasFieldCorrectionImageFilter) but never exposes bias correction;
MR pipelines need it before intensity registration / radiomics. This
is a from-scratch implementation of the N4 scheme (Tustison et al.,
IEEE TMI 2010): iterate

  1. histogram sharpening of the log-intensity distribution (Wiener
     deconvolution of a Gaussian bias kernel) -> the expected true
     intensity E[u|v] per voxel,
  2. the residual v - E[u|v] is a bias sample; smooth it with a
     multi-level cubic B-spline approximation,
  3. subtract, accumulate, repeat until the field update's coefficient
     of variation stalls; halve the control spacing per fitting level.

Work split per the package rule (host decides, device moves): the
host only chooses the level schedule and builds the per-level basis
matrices; a whole fitting level — histogram, Wiener deconvolution
(512-point XLA FFT), E[u|v] lookup, B-spline smoothing, convergence
test — is ONE device program (`lax.while_loop`), so iteration count
never multiplies host<->device round trips. The smoother solves
the EXACT weighted least-squares B-spline fit

    min_phi  sum_p w_p ( (B phi)_p - r_p )^2  +  lam |phi|^2

by Jacobi-preconditioned conjugate gradients, where applying the
normal operator A = B^T W B factorizes on the regular voxel grid into
six separable per-axis matrix contractions (pure MXU einsums — the
TPU-native form of ITK's per-point scatter accumulation; ITK instead
uses Lee's one-shot heuristic, whose refinement iteration is not a
contraction for all modes and can diverge on dense 3-D data). The
control grid is tiny (~(extent/spacing)^3), so ~tens of CG steps on
device dominate nothing. Not bit-parity with ITK (different
shrink/fit details, documented); convergence behavior and output
quality match the N4 design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["n4_bias_correction", "bspline_smooth_field"]

_EPS = 1e-12


def _bspline_basis_matrix(length, spacing_vox, power=1):
    """Dense (length, n_ctrl) cubic B-spline evaluation matrix for a
    uniform control grid of ``spacing_vox`` voxels (one border control
    each side). ``power`` raises the basis entries elementwise (the
    B^2 / B^3 matrices of Lee's approximation)."""
    u = np.arange(length, dtype=np.float64) / float(spacing_vox)
    i = np.floor(u).astype(int)
    t = u - i
    b0 = (1 - t) ** 3 / 6.0
    b1 = (3 * t ** 3 - 6 * t ** 2 + 4) / 6.0
    b2 = (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1) / 6.0
    b3 = t ** 3 / 6.0
    # +4: the last partial cell still references controls i..i+3 — +3
    # would clip its b3 weight into the previous control, measurably
    # distorting the boundary fit whenever spacing does not divide
    # length-1 (review finding)
    n_ctrl = int(np.floor((length - 1) / spacing_vox)) + 4
    m = np.zeros((length, n_ctrl), np.float64)
    for k, bk in enumerate((b0, b1, b2, b3)):
        cols = np.clip(i + k, 0, n_ctrl - 1)
        np.add.at(m, (np.arange(length), cols), bk)
    return m ** power


def _bspline_eval(phi, bz, by, bx):
    f = jnp.einsum("cde,zc->zde", phi, bz)
    f = jnp.einsum("zde,yd->zye", f, by)
    return jnp.einsum("zye,xe->zyx", f, bx)


def _bspline_adjoint(vol, bz, by, bx):
    g = jnp.einsum("zyx,zc->cyx", vol, bz)
    g = jnp.einsum("cyx,yd->cdx", g, by)
    return jnp.einsum("cdx,xe->cde", g, bx)


@jax.jit
def _wls_fit_apply(vol_r, w, bz, by, bx, bz2, by2, bx2):
    """Exact weighted least-squares cubic-B-spline fit of vol_r with
    per-voxel weights w (normal equations, Jacobi-preconditioned CG),
    then evaluate the fitted field back on the voxel grid. The normal
    operator A phi = B^T W (B phi) + lam phi is applied as six
    separable contractions; its exact diagonal is the separable
    contraction of w with the squared basis matrices."""
    b = _bspline_adjoint(w * vol_r, bz, by, bx)
    # Jacobi preconditioner: diag(A)_c = sum_p w_p B_pc^2 + lam
    diag = _bspline_adjoint(w, bz2, by2, bx2)
    lam = 1e-5 * jnp.maximum(jnp.max(diag), _EPS)
    diag = diag + lam

    def a_op(phi):
        return _bspline_adjoint(w * _bspline_eval(phi, bz, by, bx),
                                bz, by, bx) + lam * phi

    x = jnp.zeros_like(b)
    r = b
    z = r / diag
    p = z
    rz0 = jnp.sum(r * z)

    # converge to a 1e-10 relative preconditioned-residual reduction
    # (or 150 steps); the update is gated on the carried rz so lanes
    # that converged keep their state frozen under vmap
    def body(st):
        i, x, r, p, rz = st
        active = rz > 1e-10 * rz0
        ap = a_op(p)
        denom = jnp.sum(p * ap)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, _EPS), 0.0)
        x_n = x + alpha * p
        r_n = r - alpha * ap
        z = r_n / diag
        rz_n = jnp.sum(r_n * z)
        beta = jnp.where(rz > 0, rz_n / jnp.maximum(rz, _EPS), 0.0)
        p_n = z + beta * p
        return (i + 1,
                jnp.where(active, x_n, x), jnp.where(active, r_n, r),
                jnp.where(active, p_n, p), jnp.where(active, rz_n, rz))

    def cond(st):
        i, _, _, _, rz = st
        return (i < 150) & (rz > 1e-10 * rz0)

    _, x, r, p, rz = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rz0))
    return _bspline_eval(x, bz, by, bx)


def bspline_smooth_field(residual, weights, spacing_vox, passes=None):
    """Smooth a (masked) residual volume onto a cubic B-spline field
    with control spacing ``spacing_vox`` (scalar or per-axis voxels):
    the exact least-squares projection onto the spline space under the
    voxel weights (a tiny ridge keeps unsupported border controls
    bounded). f32 on device; ``passes`` is accepted for backward
    compatibility and ignored (CG solves to convergence)."""
    del passes
    r = jnp.asarray(np.asarray(residual, np.float32))
    w = jnp.asarray(np.asarray(weights, np.float32))
    sv = np.broadcast_to(np.asarray(spacing_vox, np.float64), (3,))
    mats = _level_basis_mats(r.shape, sv)
    return np.asarray(_wls_fit_apply(r, w, *mats), np.float64)


def _masked_hist(res, w, n_bins):
    """Weighted histogram of the masked residual with a data-dependent
    range (traced)."""
    big = jnp.float32(3.4e38)
    vmin = jnp.min(jnp.where(w > 0, res, big))
    vmax = jnp.max(jnp.where(w > 0, res, -big))
    width = jnp.maximum(vmax - vmin, 1e-9) / n_bins
    idx = jnp.clip(((res - vmin) / width).astype(jnp.int32),
                   0, n_bins - 1)
    hist = jnp.zeros((n_bins,), jnp.float32).at[idx.ravel()].add(
        w.ravel())
    return hist, vmin, vmax


def _device_sharpen(h, vmin, vmax, n_bins, fwhm, noise):
    """Device twin of ``_sharpen_from_hist``: Wiener deconvolution of
    the histogram by the Gaussian bias kernel and the E[u|v] table,
    via an XLA FFT over the (tiny, power-of-two) padded bin axis."""
    binw = jnp.maximum(vmax - vmin, 1e-9) / n_bins
    centers = vmin + (jnp.arange(n_bins, dtype=jnp.float32) + 0.5) * binw
    n_pad = 1
    while n_pad < 2 * n_bins:
        n_pad <<= 1
    sigma = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    d = np.arange(n_pad, dtype=np.float32)
    d = jnp.minimum(d, n_pad - d) * binw
    g = jnp.exp(-0.5 * (d / sigma) ** 2)
    g = g / jnp.sum(g)
    gf = jnp.fft.fft(g)
    hf = jnp.fft.fft(h, n_pad)
    wiener = jnp.conj(gf) / (jnp.abs(gf) ** 2 + noise ** 2)
    u_hist = jnp.maximum(jnp.real(jnp.fft.ifft(hf * wiener))[:n_bins],
                         0.0)
    uf = jnp.fft.fft(u_hist, n_pad)
    uuf = jnp.fft.fft(u_hist * centers, n_pad)
    den = jnp.real(jnp.fft.ifft(uf * gf))[:n_bins]
    num = jnp.real(jnp.fft.ifft(uuf * gf))[:n_bins]
    mapping = jnp.where(den > _EPS, num / jnp.maximum(den, _EPS),
                        centers)
    # degenerate guards: flat residual range or empty sharpened
    # histogram fall back to the identity mapping
    degenerate = ((vmax - vmin < 1e-9) | (jnp.sum(u_hist) <= 0))
    return centers, jnp.where(degenerate, centers, mapping)


@partial(jax.jit,
         static_argnames=("n_bins", "fwhm", "noise", "conv_threshold",
                          "max_iter"))
def _n4_level(res, total, w, n_bins, fwhm, noise, conv_threshold,
              max_iter, *mats):
    """One full N4 fitting level as a single device program: the
    sharpen -> E[u|v] -> WLS-smooth -> subtract iteration runs inside
    a lax.while_loop with its own convergence test, so a level costs
    ONE dispatch regardless of iteration count (the host only builds
    the per-level basis matrices).

    The body gates its update on the carried convergence statistic:
    under vmap (n4_batch) the loop runs until EVERY lane converges,
    and without the gate already-converged lanes would keep drifting
    past their single-volume trajectories."""
    n = jnp.maximum(jnp.sum(w), 1.0)

    def body(st):
        i, res, total, cv_prev = st
        h, vmin, vmax = _masked_hist(res, w, n_bins)
        centers, mapping = _device_sharpen(h, vmin, vmax, n_bins,
                                           fwhm, noise)
        euv = jnp.interp(res, centers, mapping)
        r = jnp.where(w > 0, res - euv, 0.0)
        f = _wls_fit_apply(r, w, *mats)
        # bias is defined up to a global scale
        f = f - jnp.sum(f * w) / n
        ef = jnp.exp(f)
        mu = jnp.sum(ef * w) / n
        var = jnp.sum(w * (ef - mu) ** 2) / n
        cv = jnp.sqrt(jnp.maximum(var, 0.0)) / jnp.maximum(mu, _EPS)
        active = cv_prev >= conv_threshold
        return (i + 1,
                jnp.where(active, res - f, res),
                jnp.where(active, total + f, total),
                jnp.where(active, cv, cv_prev))

    def cond(st):
        i, _, _, cv = st
        return (i < max_iter) & (cv >= conv_threshold)

    _, res, total, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), res, total, jnp.float32(1e9)))
    return res, total


def _level_spacings(shape3, levels, min_control_spacing, shrink):
    """The control-spacing schedule (one (3,) vector per level):
    whole-extent at level 0, halved per level, floored before the mesh
    can resolve anatomy, deduplicated once the floor engages."""
    max_extent = max(shape3)
    floor_sp = np.maximum(
        np.broadcast_to(np.asarray(min_control_spacing, np.float64),
                        (3,)) / shrink, 4.0)
    out = []
    for level in range(levels):
        sp_vox = np.maximum(max_extent / (2.0 ** level), floor_sp)
        if out and np.array_equal(sp_vox, out[-1]):
            break
        out.append(sp_vox)
    return out


def _level_basis_mats(shape3, sp_vox):
    """The six (grid, control) basis matrices one fitting level needs
    (B and B^2 per axis), as device f32 arrays in ``_wls_fit_apply``
    order."""
    mats = []
    for p in (1, 2):
        for ax, n in enumerate(shape3):
            mats.append(jnp.asarray(
                _bspline_basis_matrix(n, sp_vox[ax], p), jnp.float32))
    return tuple(mats)


def _sharpen_from_hist(h, vmin, vmax, n_bins, fwhm, noise):
    """Host numpy golden twin of ``_device_sharpen`` (f64 FFTs) —
    kept for parity testing of the device path."""
    if vmax - vmin < 1e-9:
        c = np.array([vmin, vmax + 1.0])
        return c, c.copy()
    h = np.asarray(h, np.float64)
    binw = (vmax - vmin) / n_bins
    centers = vmin + (np.arange(n_bins) + 0.5) * binw
    n_pad = 1
    while n_pad < 2 * n_bins:
        n_pad <<= 1
    sigma = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    # wrapped Gaussian kernel centered at bin 0
    d = np.arange(n_pad, dtype=np.float64)
    d = np.minimum(d, n_pad - d) * binw
    g = np.exp(-0.5 * (d / sigma) ** 2)
    g /= g.sum()
    gf = np.fft.fft(g)
    hf = np.fft.fft(h, n_pad)
    wiener = np.conj(gf) / (np.abs(gf) ** 2 + noise ** 2)
    u_hist = np.real(np.fft.ifft(hf * wiener))[:n_bins]
    u_hist = np.maximum(u_hist, 0.0)
    if u_hist.sum() <= 0:
        return centers, centers.copy()
    # E[u|v] = conv(u_hist * u, G)(v) / conv(u_hist, G)(v)
    uf = np.fft.fft(u_hist, n_pad)
    uuf = np.fft.fft(u_hist * centers, n_pad)
    den = np.real(np.fft.ifft(uf * gf))[:n_bins]
    num = np.real(np.fft.ifft(uuf * gf))[:n_bins]
    mapping = np.where(den > _EPS, num / np.maximum(den, _EPS), centers)
    return centers, mapping


def n4_bias_correction(volume, mask=None, shrink=4, n_bins=200,
                       fwhm=0.15, noise=0.01, levels=4,
                       max_iterations=50, conv_threshold=1e-3,
                       min_control_spacing=32.0, return_field=False):
    """Correct a smooth multiplicative bias field (MR shading).

    volume: (Z, Y, X) positive intensities (non-positive voxels are
    excluded from the fit and pass through the division untouched);
    mask: optional fit region (default: volume > 0); shrink: integer
    subsampling for the fit (N4 practice — the field is smooth, the
    fit does not need full resolution); levels/max_iterations: fitting
    levels with control spacing halved per level, iterations gated by
    ``conv_threshold`` on the field update's coefficient of variation.
    ``min_control_spacing`` (FULL-resolution voxels, scalar or
    per-axis (z, y, x)) floors the control mesh: finer meshes start
    absorbing anatomy into the "bias" (measurably worsening recovery)
    — the same reason ITK's N4 defaults to a very coarse 200 mm
    spline distance.

    Returns the corrected volume (same shape, float32), or
    (corrected, field) with the full-resolution multiplicative field
    when ``return_field`` — input == corrected * field.
    """
    vol = np.asarray(volume, np.float64)
    if vol.ndim != 3:
        raise ValueError(f"n4_bias_correction: expected (Z, Y, X), "
                         f"got {vol.shape}")
    m_full = (np.ones(vol.shape, bool) if mask is None
              else np.asarray(mask) > 0)
    m_full = m_full & (vol > 0)
    shrink = max(1, int(shrink))
    sv = vol[::shrink, ::shrink, ::shrink]
    sm = m_full[::shrink, ::shrink, ::shrink]
    if not sm.any():
        out = vol.astype(np.float32)
        return (out, np.ones_like(out)) if return_field else out
    logv = np.zeros(sv.shape, np.float64)
    logv[sm] = np.log(sv[sm])
    # device-resident iteration state: the host only sees the two
    # per-level dispatch boundaries, never per-iteration data
    w = jnp.asarray(sm.astype(np.float32))
    res = jnp.asarray(logv.astype(np.float32))
    total = jnp.zeros_like(res)
    for sp_vox in _level_spacings(sv.shape, levels,
                                  min_control_spacing, shrink):
        mats = _level_basis_mats(sv.shape, sp_vox)
        res, total = _n4_level(res, total, w, n_bins, float(fwhm),
                               float(noise), float(conv_threshold),
                               int(max_iterations), *mats)
    # finalize (trilinear-upsample the shrunk-grid log field to the
    # full grid, exponentiate, divide): on device when transfers are
    # local-priced, on host when the full-volume round trip would cost
    # more than the host math (tunnel) — same auto-selection as the
    # marching-cubes / rasterizer paths
    if _finalize_on_device():
        corrected, field = _n4_finalize(
            jnp.asarray(np.asarray(vol, np.float32)), total, shrink)
        corrected = np.asarray(corrected)
        field = np.asarray(field) if return_field else None
    else:
        corrected, field = _host_finalize(vol, np.asarray(total),
                                          shrink, return_field)
    if return_field:
        return corrected, field
    return corrected


# a per-volume bandwidth threshold: host upsample+exp+divide runs at
# ~100 MB/s-of-volume, and the device path moves ~2 volumes (3 with
# the field) across the link — so the link must be a few x faster
# than the host math for the device finalize to win
_HOST_FINALIZE_BYTES_PER_S = 1e8


def _finalize_on_device():
    try:
        from ..runtime import transfer_rate_bytes_per_s
        rate = transfer_rate_bytes_per_s()
        return rate is None or rate > 2.0 * _HOST_FINALIZE_BYTES_PER_S
    except Exception:
        return True


def _host_upsample(lt, out_shape, shrink):
    """Separable trilinear upsample of the shrunk log field to the
    full grid at coordinates k/shrink, edge-clamped — exact twin of
    the device ``map_coordinates(order=1, mode='nearest')`` path
    without materializing full-resolution coordinate volumes."""
    for ax, n in enumerate(out_shape):
        u = np.arange(n) / shrink
        i0 = np.minimum(u.astype(np.int64), lt.shape[ax] - 1)
        i1 = np.minimum(i0 + 1, lt.shape[ax] - 1)
        f = (u - i0).reshape([-1 if a == ax else 1 for a in range(3)])
        lt = (np.take(lt, i0, axis=ax) * (1.0 - f)
              + np.take(lt, i1, axis=ax) * f)
    return lt


def _host_finalize(vol, log_total, shrink, want_field):
    lt = np.asarray(log_total, np.float64)
    if shrink > 1:
        lt = _host_upsample(lt, vol.shape, shrink)
    field = np.exp(lt).astype(np.float32)
    # non-positive voxels were excluded from the fit and pass through
    # the division untouched (documented contract)
    corrected = np.where(vol > 0, vol / field, vol).astype(np.float32)
    return corrected, (field if want_field else None)


@partial(jax.jit, static_argnames=("shrink",))
def _n4_finalize(vol, total, shrink):
    if shrink > 1:
        coords = [
            jnp.minimum(
                jnp.arange(n, dtype=jnp.float32) / shrink, sn - 1
            ).reshape([-1 if a == i else 1 for i in range(3)])
            for a, (n, sn) in enumerate(zip(vol.shape, total.shape))]
        coords = [jnp.broadcast_to(c, vol.shape) for c in coords]
        total_full = jax.scipy.ndimage.map_coordinates(
            total, coords, order=1, mode="nearest")
    else:
        total_full = total
    field = jnp.exp(total_full)
    # non-positive voxels pass through untouched (documented contract)
    return jnp.where(vol > 0, vol / field, vol), field
