"""Golden tests for the Pallas tile-slab trilinear warp (CPU interpret
mode; the same code path compiles on TPU — validated in docs/PERF.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu.ops.pallas_warp import (
    _field_warp_call, affine_coords, affine_warp, field_warp,
    field_warp_xla, make_warp_sampler)
from medicalimageanalysis_tpu.ops.resample import affine_resample


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _numpy_trilinear(vol, cz, cy, cx, bg):
    """Independent numpy golden (mirrors reference vtk/sitk linear
    interpolation semantics with clamped edge taps)."""
    Z, Y, X = vol.shape
    inside = ((cz >= 0) & (cz <= Z - 1) & (cy >= 0) & (cy <= Y - 1)
              & (cx >= 0) & (cx <= X - 1))
    z0 = np.clip(np.floor(cz).astype(int), 0, Z - 1)
    y0 = np.clip(np.floor(cy).astype(int), 0, Y - 1)
    x0 = np.clip(np.floor(cx).astype(int), 0, X - 1)
    z1 = np.minimum(z0 + 1, Z - 1)
    y1 = np.minimum(y0 + 1, Y - 1)
    x1 = np.minimum(x0 + 1, X - 1)
    fz, fy, fx = cz - np.floor(cz), cy - np.floor(cy), cx - np.floor(cx)
    out = 0.0
    for (zi, wz) in ((z0, 1 - fz), (z1, fz)):
        for (yi, wy) in ((y0, 1 - fy), (y1, fy)):
            for (xi, wx) in ((x0, 1 - fx), (x1, fx)):
                out = out + wz * wy * wx * vol[zi, yi, xi]
    return np.where(inside, out, bg).astype(np.float32)


def test_field_warp_smooth_dvf_matches_numpy(rng):
    vol = rng.normal(size=(20, 30, 70)).astype(np.float32)
    zz, yy, xx = np.mgrid[0:20, 0:30, 0:70].astype(np.float32)
    cz = zz + 3.0 * np.sin(xx / 15) * np.cos(yy / 9)
    cy = yy - 2.5 * np.cos(zz / 5)
    cx = xx + 4.0 * np.sin(yy / 7)
    out, _, ovf = _field_warp_call(
        jnp.asarray(vol)[None], jnp.asarray(cz), jnp.asarray(cy),
        jnp.asarray(cx), jnp.float32(-3001.0), False, None, True)
    assert float(ovf) == 0.0  # kernel itself covered every tap
    golden = _numpy_trilinear(vol, cz, cy, cx, -3001.0)
    np.testing.assert_allclose(np.asarray(out)[0], golden, atol=2e-4)


def test_field_warp_large_displacement_small_variation(rng):
    """Absolute displacement far beyond the slab caps is fine as long
    as the within-tile variation fits (slab base absorbs it)."""
    vol = rng.normal(size=(64, 24, 130)).astype(np.float32)
    zz, yy, xx = np.mgrid[0:64, 0:24, 0:130].astype(np.float32)
    cz = zz - 37.25          # constant 37-voxel shift
    cy = yy + 11.5
    cx = xx - 55.75
    out, _, ovf = _field_warp_call(
        jnp.asarray(vol)[None], jnp.asarray(cz), jnp.asarray(cy),
        jnp.asarray(cx), jnp.float32(0.0), False, None, True)
    assert float(ovf) == 0.0
    golden = _numpy_trilinear(vol, cz, cy, cx, 0.0)
    np.testing.assert_allclose(np.asarray(out)[0], golden, atol=2e-4)


def test_field_warp_overflow_fallback_is_exact(rng):
    """A field rougher than the caps must still return exact results at
    the eager surface (overflow counter triggers the XLA twin)."""
    vol = rng.normal(size=(24, 24, 70)).astype(np.float32)
    zz, yy, xx = np.mgrid[0:24, 0:24, 0:70].astype(np.float32)
    cz = zz + np.where((xx.astype(int) % 9) == 0, 18.0, -3.0)
    out = np.asarray(field_warp(vol, cz, yy, xx, interpret=True))
    golden = _numpy_trilinear(vol, cz, yy, xx, 0.0)
    np.testing.assert_allclose(out, golden, atol=2e-4)


def test_affine_warp_matches_affine_resample(rng):
    from scipy.spatial.transform import Rotation
    vol = rng.normal(size=(20, 30, 70)).astype(np.float32)
    A = np.eye(4)
    A[:3, :3] = Rotation.from_euler("zyx", [8, -5, 3],
                                    degrees=True).as_matrix()
    A[:3, 3] = [3.5, -2.0, 1.25]
    out = np.asarray(affine_warp(vol, A, (24, 32, 80),
                                 background=-3001.0, interpret=True))
    ref = np.asarray(affine_resample(vol, A, (24, 32, 80),
                                     background=-3001.0))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_batched_volumes_share_coords(rng):
    vol = rng.normal(size=(3, 16, 20, 40)).astype(np.float32)
    zz, yy, xx = np.mgrid[0:16, 0:20, 0:40].astype(np.float32)
    cz, cy, cx = zz + 0.5, yy - 0.25, xx + 1.5
    out = np.asarray(field_warp(vol, cz, cy, cx, interpret=True))
    for b in range(3):
        golden = _numpy_trilinear(vol[b], cz, cy, cx, 0.0)
        np.testing.assert_allclose(out[b], golden, atol=2e-4)


def test_sampler_vjp_matches_xla_autodiff(rng):
    vol = rng.normal(size=(16, 18, 40)).astype(np.float32)
    zz, yy, xx = np.mgrid[0:16, 0:18, 0:40].astype(np.float32)
    cz = jnp.asarray(zz + 1.5 * np.sin(xx / 9))
    cy = jnp.asarray(yy - 1.0 * np.cos(zz / 4))
    cx = jnp.asarray(xx + 2.0 * np.sin(yy / 6))
    sampler = make_warp_sampler(vol, background=0.0, interpret=True)

    g1 = jax.grad(lambda a, b, c: jnp.sum(sampler(a, b, c) ** 2),
                  argnums=(0, 1, 2))(cz, cy, cx)
    g2 = jax.grad(lambda a, b, c: jnp.sum(
        field_warp_xla(jnp.asarray(vol), a, b, c, 0.0) ** 2),
        argnums=(0, 1, 2))(cz, cy, cx)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)


def test_affine_coords_convention(rng):
    """affine_coords must agree with affine_resample's coordinate map
    (output pixel (x,y,z,1) -> input pixel, x-major matrix rows)."""
    A = np.array([[1.1, 0.02, -0.01, 3.0],
                  [0.03, 0.9, 0.04, -2.0],
                  [-0.02, 0.01, 1.05, 1.0],
                  [0, 0, 0, 1.0]], np.float32)
    cz, cy, cx = affine_coords(A, (4, 5, 6))
    z, y, x = 2, 3, 4
    v = A @ np.array([x, y, z, 1.0], np.float32)
    assert np.allclose([float(cx[z, y, x]), float(cy[z, y, x]),
                        float(cz[z, y, x])], v[:3], atol=1e-5)


def test_register_level_pallas_parity_smoke(rng):
    """The TPU branch of _register_level can't run here, but its loss
    construction (grid warp vs point sampling) must agree: check the
    Pallas-sampler loss equals the XLA-sampler loss at a test pose."""
    from medicalimageanalysis_tpu.models.rigid_intensity import (
        pose_to_matrix)
    from medicalimageanalysis_tpu.ops import geometry as geo

    ref = rng.normal(size=(16, 20, 24)).astype(np.float32)
    mov = np.roll(ref, 2, axis=2)
    r_p2p = np.eye(4, dtype=np.float32)
    m_pos2pix = np.eye(4, dtype=np.float32)
    pose = jnp.asarray([0.01, -0.02, 0.015, 1.0, -0.5, 0.25],
                       jnp.float32)
    center = jnp.asarray([12.0, 10.0, 8.0])
    m = pose_to_matrix(pose, center)
    P = jnp.asarray(m_pos2pix) @ m @ jnp.asarray(r_p2p)
    cz, cy, cx = affine_coords(P, ref.shape)
    vals_pallas = field_warp(mov, cz, cy, cx, interpret=True)
    vals_xla = field_warp_xla(jnp.asarray(mov), cz, cy, cx, 0.0)
    np.testing.assert_allclose(np.asarray(vals_pallas),
                               np.asarray(vals_xla), atol=2e-4)


def test_axis_align_prepass_large_rotations(rng):
    """Near-90-degree-multiple rotations must factor into an exact
    transpose/flip + a residual that fits the kernel caps, and the
    factored resample must equal the direct XLA resample exactly."""
    from scipy.spatial.transform import Rotation
    from medicalimageanalysis_tpu.ops.pallas_warp import fits_warp_caps
    from medicalimageanalysis_tpu.ops.resample import (
        _affine_resample_jit, _axis_align_input, _relayout)

    vol = rng.normal(size=(20, 26, 34)).astype(np.float32)
    cases = [
        ("zyx", [90, 0, 0]),          # pure 90 about z
        ("zyx", [92, -3, 2]),         # oblique near 90
        ("zyx", [-88, 1, 179]),       # combination
        ("zyx", [3, -91, 2]),         # near 90 about y
    ]
    for seq, angles in cases:
        A = np.eye(4)
        A[:3, :3] = Rotation.from_euler(seq, angles, degrees=True) \
            .as_matrix()
        A[:3, 3] = [4.0, -3.5, 2.25]
        assert not fits_warp_caps(A), angles  # direct path overflows
        al = _axis_align_input(A, vol.shape)
        assert al is not None, angles
        perm, flips, A2 = al
        assert fits_warp_caps(A2), angles
        out_shape = (22, 28, 30)
        ref = np.asarray(_affine_resample_jit(
            jnp.asarray(vol), jnp.asarray(A, jnp.float32), out_shape,
            jnp.float32(-3001.0)))
        vol2 = _relayout(jnp.asarray(vol), perm, flips)
        got = np.asarray(affine_warp(vol2, A2.astype(np.float32),
                                     out_shape, background=-3001.0,
                                     interpret=True))
        np.testing.assert_allclose(got, ref, atol=3e-4)


def test_axis_align_prepass_identityish_returns_none():
    from medicalimageanalysis_tpu.ops.resample import _axis_align_input
    A = np.eye(4)
    A[:3, 3] = [1.0, 2.0, 3.0]
    assert _axis_align_input(A, (10, 10, 10)) is None
    # fully oblique: dominant entries collide -> no permutation
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec(np.deg2rad(54.7) * np.ones(3) / np.sqrt(3))
    A2 = np.eye(4)
    A2[:3, :3] = R.as_matrix()
    al = _axis_align_input(A2, (10, 10, 10))
    # either no factorization or one that simply doesn't fit the caps —
    # never a wrong answer (exactness is enforced by the caller's
    # fits_warp_caps + overflow check)
    if al is not None:
        assert al[2].shape == (4, 4)


def test_affine_warp_fused_matches_eager(rng):
    """affine_warp_fused (one-program relayout+coords+warp) must match
    the eager chain and report zero overflow on in-cap transforms."""
    from scipy.spatial.transform import Rotation
    from medicalimageanalysis_tpu.ops.pallas_warp import affine_warp_fused
    from medicalimageanalysis_tpu.ops.resample import (
        _affine_resample_jit, _axis_align_input)

    vol = rng.normal(size=(18, 24, 40)).astype(np.float32)
    # small rotation: direct
    A = np.eye(4)
    A[:3, :3] = Rotation.from_euler("zyx", [5, -4, 3],
                                    degrees=True).as_matrix()
    A[:3, 3] = [2.0, -1.5, 0.75]
    out, ovf = affine_warp_fused(vol, jnp.asarray(A, jnp.float32),
                                 jnp.float32(-3001.0), (20, 26, 42),
                                 interpret=True)
    assert float(ovf) == 0.0
    ref = _affine_resample_jit(jnp.asarray(vol), jnp.asarray(A, jnp.float32),
                               (20, 26, 42), jnp.float32(-3001.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    # large rotation through the relayout arguments
    A = np.eye(4)
    A[:3, :3] = Rotation.from_euler("zyx", [91, 2, -3],
                                    degrees=True).as_matrix()
    A[:3, 3] = [3.0, 30.5, 1.0]
    perm, flips, A2 = _axis_align_input(A, vol.shape)
    out, ovf = affine_warp_fused(vol, jnp.asarray(A2, jnp.float32),
                                 jnp.float32(-3001.0), (20, 26, 42),
                                 perm=perm, flips=flips, interpret=True)
    assert float(ovf) == 0.0
    ref = _affine_resample_jit(jnp.asarray(vol), jnp.asarray(A, jnp.float32),
                               (20, 26, 42), jnp.float32(-3001.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


def test_disp_mode_matches_xla_twin(rng):
    """Fused-coordinate displacement mode (planar (3,Z,Y,X) field, base
    coords generated in-kernel) vs the XLA twin, on shapes that force
    output-grid padding so the (program_id, iota) < out-dims mask is
    exercised."""
    from medicalimageanalysis_tpu.ops.pallas_warp import warp_disp_jit

    vol = rng.normal(size=(21, 29, 71)).astype(np.float32)
    disp = rng.normal(scale=2.0, size=(3, 18, 27, 66)).astype(np.float32)
    Zo, Yo, Xo = disp.shape[1:]
    zz = np.arange(Zo, dtype=np.float32)[:, None, None]
    yy = np.arange(Yo, dtype=np.float32)[None, :, None]
    xx = np.arange(Xo, dtype=np.float32)[None, None, :]
    ref = np.asarray(field_warp_xla(
        jnp.asarray(vol)[None], jnp.asarray(zz + disp[2]),
        jnp.asarray(yy + disp[1]), jnp.asarray(xx + disp[0]), 0.25))[0]
    out, ovf = warp_disp_jit(jnp.asarray(vol), jnp.asarray(disp), 0.25,
                             interpret=True, with_overflow=True)
    assert float(ovf) == 0.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # batched volumes share the field
    volb = rng.normal(size=(3, 21, 29, 71)).astype(np.float32)
    refb = np.stack([np.asarray(field_warp_xla(
        jnp.asarray(volb[b])[None], jnp.asarray(zz + disp[2]),
        jnp.asarray(yy + disp[1]), jnp.asarray(xx + disp[0]), 0.0))[0]
        for b in range(3)])
    outb = warp_disp_jit(jnp.asarray(volb), jnp.asarray(disp), 0.0,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(outb), refb, atol=1e-5)


def test_affine_mode_in_kernel_coords(rng):
    """Affine mode (12 SMEM coefficients, coords from program_id+iota)
    must match the coordinate-mode kernel + affine_coords exactly."""
    from medicalimageanalysis_tpu.ops.pallas_warp import affine_warp_fused

    vol = rng.normal(size=(19, 33, 67)).astype(np.float32)
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] += rng.normal(scale=0.05, size=(3, 3)).astype(np.float32)
    A[:3, 3] = [2.5, -1.0, 0.5]
    osh = (17, 30, 70)
    cz, cy, cx = affine_coords(A, osh)
    ref = np.asarray(field_warp_xla(jnp.asarray(vol)[None],
                                    cz, cy, cx, -3001.0))[0]
    out, ovf = affine_warp_fused(jnp.asarray(vol), jnp.asarray(A),
                                 jnp.float32(-3001.0), osh,
                                 interpret=True)
    assert float(ovf) == 0.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_required_window_bounds_field_spread(rng):
    """required_window must cap the per-tile spread any smooth field
    actually exhibits, and the implied slab must be computable."""
    from medicalimageanalysis_tpu.ops.pallas_warp import (
        required_window, window_slab_bytes)
    from scipy.ndimage import gaussian_filter

    d = rng.normal(scale=6.0, size=(3, 40, 48, 130)).astype(np.float32)
    for c in range(3):
        d[c] = gaussian_filter(d[c], sigma=5.0) * 30.0
    dz, dy = required_window(d)
    assert dz >= 16 and dy >= 16
    # tiny field -> floors at the default caps
    dz0, dy0 = required_window(np.zeros((3, 8, 8, 128), np.float32))
    assert (dz0, dy0) == (16, 16)
    assert window_slab_bytes((40, 48, 130), (dz, dy), batch=3) > 0


def test_invert_dvf_rough_field_roundtrip(rng):
    """invert_dvf on a rough field: compose(d, v) ~ 0 in the interior
    (the eager surface must stay exact regardless of backend path)."""
    from scipy.ndimage import gaussian_filter
    from medicalimageanalysis_tpu.ops.registration.dvf import (
        compose_dvf, invert_dvf)

    d = rng.normal(scale=4.0, size=(24, 28, 32, 3)).astype(np.float32)
    for c in range(3):
        d[..., c] = gaussian_filter(d[..., c], sigma=3.0) * 6.0
    sp = (1.0, 1.0, 1.0)
    v = invert_dvf(d, sp, iterations=30)
    resid = compose_dvf(d, v, sp)
    interior = resid[6:-6, 6:-6, 6:-6]
    assert np.abs(interior).max() < 0.35


def test_disp_sampler_vjp_matches_xla_autodiff(rng):
    """make_disp_sampler's fused VJP (cotangent = g * coordinate
    gradients, planar) must match XLA autodiff through the gather."""
    from medicalimageanalysis_tpu.ops.pallas_warp import (
        _base_grid, make_disp_sampler)

    vol = rng.normal(size=(12, 16, 40)).astype(np.float32)
    disp = (0.8 * rng.normal(size=(3, 12, 16, 40))).astype(np.float32)
    sampler = make_disp_sampler(vol, background=0.0, interpret=True)
    g1 = jax.grad(lambda d: jnp.sum(sampler(d) ** 2))(jnp.asarray(disp))

    zz, yy, xx = _base_grid(vol.shape)

    def xla_loss(d):
        out = field_warp_xla(jnp.asarray(vol)[None], zz + d[2],
                             yy + d[1], xx + d[0], 0.0)[0]
        return jnp.sum(out ** 2)

    g2 = jax.grad(xla_loss)(jnp.asarray(disp))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_oblique_shear_kernel_exact(rng):
    """The staircase-shear oblique path (30-60 deg rotations) matches
    the independent numpy golden with zero overflow — the case that
    previously fell back to the XLA gather (VERDICT r2 #1)."""
    from scipy.spatial.transform import Rotation

    from medicalimageanalysis_tpu.ops.pallas_warp import (
        affine_warp_oblique, oblique_plan)
    from medicalimageanalysis_tpu.ops.resample import _axis_align_input

    Z, Y, X = 20, 28, 36
    vol = rng.normal(size=(Z, Y, X)).astype(np.float32)
    for deg, axis in [(45.0, (0, 0, 1)), (60.0, (0, 0, 1)),
                      (45.0, (1, 1, 1)), (33.0, (1, 2, 0.5))]:
        ax = np.asarray(axis, float)
        R = Rotation.from_rotvec(
            np.deg2rad(deg) * ax / np.linalg.norm(ax)).as_matrix()
        A = np.eye(4)
        A[:3, :3] = R
        c = np.array([X / 2, Y / 2, Z / 2])
        A[:3, 3] = c - R @ c
        al = _axis_align_input(A, vol.shape)
        if al is not None:
            perm, flips, A2 = al
            shp = tuple(vol.shape[p] for p in perm)
        else:
            perm, flips, A2 = None, (), A
            shp = vol.shape
        plan = oblique_plan(A2, shp)
        assert plan is not None, (deg, axis)
        out, ovf = affine_warp_oblique(
            vol, A2, -3001.0, (Z, Y, X), plan, perm=perm, flips=flips,
            interpret=True)
        cz, cy, cx = affine_coords(A, (Z, Y, X))
        golden = _numpy_trilinear(vol, np.asarray(cz), np.asarray(cy),
                                  np.asarray(cx), -3001.0)
        assert float(ovf) == 0.0, (deg, axis)
        np.testing.assert_allclose(np.asarray(out), golden, atol=2e-4)


def test_oblique_plan_gates():
    """Planner refuses maps the shear factorization cannot serve."""
    from medicalimageanalysis_tpu.ops.pallas_warp import oblique_plan

    # weak x column (x output direction nearly orthogonal to input x)
    A = np.eye(4)
    A[0, 0] = 0.1
    assert oblique_plan(A, (32, 32, 32)) is None
    # slope too steep for the staircase (ky = 2)
    A = np.eye(4)
    A[1, 0] = 2.0
    assert oblique_plan(A, (32, 32, 32)) is None
    # a clean 45-degree in-plane rotation plans with small windows
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    A = np.eye(4)
    A[:2, :2] = [[c, -s], [s, c]]
    plan = oblique_plan(A, (32, 64, 64))
    assert plan is not None
    assert plan["window"][0] <= 24 and plan["window"][1] <= 24
