"""Value-level conformance for every radiomics FEATURE FORMULA.

The texture matrices are already pinned against brute-force counting
(test_radiomics.py); this module pins the ~94 feature VALUES: a second,
dumb-and-direct float64 implementation of every formula — explicit
Python loops transcribed from the IBSI/pyradiomics definitions, sharing
no code with ops/radiomics.py — evaluated on brute-force matrices,
across 3 phantoms x FBS/FBN discretizations. A transposed index or
swapped marginal in any family formula fails these outright.

Closed-form analytic cases (uniform cube, two-level checkerboard)
anchor the conventions themselves.
"""

import numpy as np
import pytest

from medicalimageanalysis_tpu.ops import radiomics as R

from test_radiomics import (brute_glcm, brute_gldm_ngtdm, brute_glrlm,
                            _in)

EPS = 2.2e-16


# --------------------------------------------------------------------
# dumb-and-direct formula twins (explicit loops, 1-based gray levels)
# --------------------------------------------------------------------

def twin_glcm_one_direction(P):
    """All GLCM features for ONE direction's symmetric count matrix,
    straight from the IBSI definitions."""
    P = np.asarray(P, np.float64)
    Ng = P.shape[0]
    total = P.sum()
    if total <= 0:
        return None
    p = P / total

    px = [sum(p[i, j] for j in range(Ng)) for i in range(Ng)]
    py = [sum(p[i, j] for i in range(Ng)) for j in range(Ng)]
    mux = sum((i + 1) * px[i] for i in range(Ng))
    muy = sum((j + 1) * py[j] for j in range(Ng))
    sigx = np.sqrt(sum(px[i] * (i + 1 - mux) ** 2 for i in range(Ng)))
    sigy = np.sqrt(sum(py[j] * (j + 1 - muy) ** 2 for j in range(Ng)))

    p_plus = np.zeros(2 * Ng - 1)   # k = i + j in 2 .. 2Ng
    p_minus = np.zeros(Ng)          # k = |i - j| in 0 .. Ng-1
    for i in range(Ng):
        for j in range(Ng):
            p_plus[i + j] += p[i, j]
            p_minus[abs(i - j)] += p[i, j]

    def S(fn):
        return sum(fn(i + 1, j + 1, p[i, j])
                   for i in range(Ng) for j in range(Ng))

    hxy = -S(lambda i, j, v: v * np.log2(v + EPS))
    hxy1 = -S(lambda i, j, v: v * np.log2(
        px[i - 1] * py[j - 1] + EPS))
    hxy2 = -sum(px[i] * py[j] * np.log2(px[i] * py[j] + EPS)
                for i in range(Ng) for j in range(Ng))
    hx = -sum(px[i] * np.log2(px[i] + EPS) for i in range(Ng))
    hy = -sum(py[j] * np.log2(py[j] + EPS) for j in range(Ng))

    da = sum(k * p_minus[k] for k in range(Ng))
    if sigx > 0 and sigy > 0:
        corr = (S(lambda i, j, v: i * j * v) - mux * muy) / (sigx * sigy)
    else:
        corr = 1.0

    return {
        "Autocorrelation": S(lambda i, j, v: i * j * v),
        "JointAverage": mux,
        "ClusterProminence": S(
            lambda i, j, v: (i + j - mux - muy) ** 4 * v),
        "ClusterShade": S(lambda i, j, v: (i + j - mux - muy) ** 3 * v),
        "ClusterTendency": S(
            lambda i, j, v: (i + j - mux - muy) ** 2 * v),
        "Contrast": S(lambda i, j, v: (i - j) ** 2 * v),
        "Correlation": corr,
        "DifferenceAverage": da,
        "DifferenceEntropy": -sum(
            p_minus[k] * np.log2(p_minus[k] + EPS) for k in range(Ng)),
        "DifferenceVariance": sum(
            (k - da) ** 2 * p_minus[k] for k in range(Ng)),
        "JointEnergy": S(lambda i, j, v: v * v),
        "JointEntropy": hxy,
        "Imc1": (hxy - hxy1) / max(max(hx, hy), EPS),
        "Imc2": np.sqrt(max(1.0 - np.exp(-2.0 * (hxy2 - hxy)), 0.0)),
        "Idm": S(lambda i, j, v: v / (1.0 + (i - j) ** 2)),
        "Idmn": S(lambda i, j, v: v / (1.0 + ((i - j) / Ng) ** 2)),
        "Id": S(lambda i, j, v: v / (1.0 + abs(i - j))),
        "Idn": S(lambda i, j, v: v / (1.0 + abs(i - j) / Ng)),
        "InverseVariance": S(
            lambda i, j, v: v / (i - j) ** 2 if i != j else 0.0),
        "MaximumProbability": p.max(),
        "SumAverage": sum((k + 2) * p_plus[k]
                          for k in range(2 * Ng - 1)),
        "SumEntropy": -sum(p_plus[k] * np.log2(p_plus[k] + EPS)
                           for k in range(2 * Ng - 1)),
        "SumSquares": S(lambda i, j, v: (i - mux) ** 2 * v),
    }


def twin_average_directions(per_dir):
    per_dir = [f for f in per_dir if f is not None]
    if not per_dir:
        return None
    return {k: float(np.mean([f[k] for f in per_dir]))
            for k in per_dir[0]}


def twin_rlm(P, n_vox, keys):
    """The 16 shared run-length/zone-size formulas for one (Ng, L)
    count matrix (GLRLM per direction, or GLSZM)."""
    P = np.asarray(P, np.float64)
    Ng, L = P.shape
    nr = P.sum()
    if nr <= 0:
        return None
    p = P / nr

    def S(fn):
        return sum(fn(i + 1, j + 1, P[i, j])
                   for i in range(Ng) for j in range(L))

    ri = [sum(P[i, j] for j in range(L)) for i in range(Ng)]
    rj = [sum(P[i, j] for i in range(Ng)) for j in range(L)]
    mu_i = S(lambda i, j, v: i * v / nr)
    mu_j = S(lambda i, j, v: j * v / nr)
    vals = [
        S(lambda i, j, v: v / j ** 2) / nr,
        S(lambda i, j, v: v * j ** 2) / nr,
        sum(r * r for r in ri) / nr,
        sum(r * r for r in ri) / nr ** 2,
        sum(r * r for r in rj) / nr,
        sum(r * r for r in rj) / nr ** 2,
        nr / n_vox if n_vox > 0 else float("nan"),
        S(lambda i, j, v: (i - mu_i) ** 2 * v / nr),
        S(lambda i, j, v: (j - mu_j) ** 2 * v / nr),
        -S(lambda i, j, v: (v / nr) * np.log2(v / nr + EPS)),
        S(lambda i, j, v: v / i ** 2) / nr,
        S(lambda i, j, v: v * i ** 2) / nr,
        S(lambda i, j, v: v / (i ** 2 * j ** 2)) / nr,
        S(lambda i, j, v: v * i ** 2 / j ** 2) / nr,
        S(lambda i, j, v: v * j ** 2 / i ** 2) / nr,
        S(lambda i, j, v: v * i ** 2 * j ** 2) / nr,
    ]
    return dict(zip(keys, [float(v) for v in vals]))


def twin_gldm(P, n_vox):
    """The 14 dependence features; dependence size j = column + 1."""
    P = np.asarray(P, np.float64)
    Ng, Nd = P.shape
    nz = P.sum()
    if nz <= 0:
        return None

    def S(fn):
        return sum(fn(i + 1, j + 1, P[i, j])
                   for i in range(Ng) for j in range(Nd))

    si = [sum(P[i, j] for j in range(Nd)) for i in range(Ng)]
    sj = [sum(P[i, j] for i in range(Ng)) for j in range(Nd)]
    mu_i = S(lambda i, j, v: i * v / nz)
    mu_j = S(lambda i, j, v: j * v / nz)
    return {
        "SmallDependenceEmphasis": S(lambda i, j, v: v / j ** 2) / nz,
        "LargeDependenceEmphasis": S(lambda i, j, v: v * j ** 2) / nz,
        "GrayLevelNonUniformity": sum(s * s for s in si) / nz,
        "DependenceNonUniformity": sum(s * s for s in sj) / nz,
        "DependenceNonUniformityNormalized": sum(
            s * s for s in sj) / nz ** 2,
        "GrayLevelVariance": S(
            lambda i, j, v: (i - mu_i) ** 2 * v / nz),
        "DependenceVariance": S(
            lambda i, j, v: (j - mu_j) ** 2 * v / nz),
        "DependenceEntropy": -S(
            lambda i, j, v: (v / nz) * np.log2(v / nz + EPS)),
        "LowGrayLevelEmphasis": S(lambda i, j, v: v / i ** 2) / nz,
        "HighGrayLevelEmphasis": S(lambda i, j, v: v * i ** 2) / nz,
        "SmallDependenceLowGrayLevelEmphasis": S(
            lambda i, j, v: v / (i ** 2 * j ** 2)) / nz,
        "SmallDependenceHighGrayLevelEmphasis": S(
            lambda i, j, v: v * i ** 2 / j ** 2) / nz,
        "LargeDependenceLowGrayLevelEmphasis": S(
            lambda i, j, v: v * j ** 2 / i ** 2) / nz,
        "LargeDependenceHighGrayLevelEmphasis": S(
            lambda i, j, v: v * i ** 2 * j ** 2) / nz,
    }


def twin_ngtdm(s, n):
    """The 5 NGTDM features (pyradiomics conventions: coarseness cap
    1e6, contrast over present-level pairs, strength over sum(s))."""
    s = np.asarray(s, np.float64)
    n = np.asarray(n, np.float64)
    nvp = n.sum()
    if nvp <= 0:
        return None
    Ng = s.size
    p = n / nvp
    present = [i for i in range(Ng) if p[i] > 0]
    ngp = len(present)

    ps = sum(p[i] * s[i] for i in range(Ng))
    coarseness = 1.0 / ps if ps > 0 else 1e6

    if ngp > 1:
        acc = 0.0
        for i in present:
            for j in present:
                acc += p[i] * p[j] * (i - j) ** 2
        contrast = acc / (ngp * (ngp - 1)) * (s.sum() / nvp)
    else:
        contrast = 0.0

    denom = 0.0
    for i in present:
        for j in present:
            denom += abs((i + 1) * p[i] - (j + 1) * p[j])
    busyness = ps / denom if denom > 0 else 0.0

    complexity = 0.0
    for i in present:
        for j in present:
            complexity += (abs(i - j)
                           * (p[i] * s[i] + p[j] * s[j])
                           / (p[i] + p[j]))
    complexity /= nvp

    s_present = sum(s[i] for i in present)
    strength = 0.0
    if s_present > 0:
        for i in present:
            for j in present:
                strength += (p[i] + p[j]) * (i - j) ** 2
        strength /= s_present

    return {"Coarseness": float(coarseness), "Contrast": float(contrast),
            "Busyness": float(busyness), "Complexity": float(complexity),
            "Strength": float(strength)}


def twin_firstorder(vals, mask, spacing, hist):
    x = np.sort(np.asarray(vals, np.float64)[np.asarray(mask) > 0])
    n = x.size
    vox = float(np.prod(np.asarray(spacing, np.float64)))
    mean = x.sum() / n
    var = ((x - mean) ** 2).sum() / n
    std = np.sqrt(var)
    p10, p25, p75, p90 = np.percentile(x, [10, 25, 75, 90])
    rob = x[(x >= p10) & (x <= p90)]
    ph = np.asarray(hist, np.float64)
    ph = ph[ph > 0] / ph.sum()
    return {
        "Energy": float((x ** 2).sum()),
        "TotalEnergy": float(vox * (x ** 2).sum()),
        "Entropy": float(-(ph * np.log2(ph)).sum()),
        "Minimum": float(x[0]),
        "10Percentile": float(p10),
        "90Percentile": float(p90),
        "Maximum": float(x[-1]),
        "Mean": float(mean),
        "Median": float(np.median(x)),
        "InterquartileRange": float(p75 - p25),
        "Range": float(x[-1] - x[0]),
        "MeanAbsoluteDeviation": float(np.abs(x - mean).sum() / n),
        "RobustMeanAbsoluteDeviation": float(
            np.abs(rob - rob.mean()).sum() / rob.size),
        "RootMeanSquared": float(np.sqrt((x ** 2).sum() / n)),
        "StandardDeviation": float(std),
        "Skewness": float(((x - mean) ** 3).sum() / n / std ** 3)
        if std > 0 else 0.0,
        "Kurtosis": float(((x - mean) ** 4).sum() / n / var ** 2)
        if var > 0 else 0.0,
        "Variance": float(var),
        "Uniformity": float((ph ** 2).sum()),
    }


def brute_glszm(lev, mask, ng):
    """Zone-size counts by explicit BFS flood fill (26-connected),
    independent of the package's scipy.ndimage.label path."""
    lev = np.asarray(lev)
    m = np.asarray(mask) > 0
    offs = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
            for c in (-1, 0, 1) if a or b or c]
    seen = np.zeros(m.shape, bool)
    zones = []  # (gray_level, size)
    Z, Y, X = m.shape
    for z in range(Z):
        for y in range(Y):
            for x in range(X):
                if not m[z, y, x] or seen[z, y, x]:
                    continue
                g = lev[z, y, x]
                stack = [(z, y, x)]
                seen[z, y, x] = True
                size = 0
                while stack:
                    v = stack.pop()
                    size += 1
                    for d in offs:
                        u = (v[0] + d[0], v[1] + d[1], v[2] + d[2])
                        if (_in(m.shape, u) and m[u] and not seen[u]
                                and lev[u] == g):
                            seen[u] = True
                            stack.append(u)
                zones.append((int(g), size))
    max_zone = max((s for _, s in zones), default=1)
    P = np.zeros((ng, max_zone), np.float64)
    for g, s in zones:
        P[g, s - 1] += 1
    return P


# --------------------------------------------------------------------
# phantoms
# --------------------------------------------------------------------

def _phantom(name):
    """(volume, mask, spacing) triplets. Masks are >=3 voxels thick in
    every axis so no direction's matrix is empty."""
    sp = (0.9, 1.1, 2.0)
    if name == "uniform":
        vol = np.full((6, 7, 8), 120.0)
        mask = np.zeros(vol.shape, bool)
        mask[1:5, 1:6, 1:7] = True
        return vol, mask, sp
    if name == "checker":
        zz, yy, xx = np.mgrid[0:7, 0:8, 0:6]
        vol = np.where((zz + yy + xx) % 2 == 0, 50.0, 150.0)
        mask = np.ones(vol.shape, bool)
        mask[0, :, :] = False
        return vol, mask, sp
    # "blob": smooth gradient + noise, ellipsoid mask
    rng = np.random.default_rng(11)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, n)
                               for n in (8, 9, 7)], indexing="ij")
    vol = 100.0 * zz + 60.0 * yy * xx + rng.normal(0, 20, zz.shape)
    mask = zz ** 2 + yy ** 2 + xx ** 2 < 0.9
    return vol, mask, sp


def _crop(vol, mask):
    nz = np.nonzero(mask)
    lo = [a.min() for a in nz]
    hi = [a.max() + 1 for a in nz]
    sl = tuple(slice(a, b) for a, b in zip(lo, hi))
    return vol[sl], mask[sl]


def _assert_panel(got, want, label, rtol=1e-9, atol=1e-10):
    assert set(got) == set(want), label
    for k in want:
        g, w = got[k], want[k]
        if np.isnan(w):
            assert np.isnan(g), f"{label}.{k}: {g} vs nan"
        else:
            assert np.isclose(g, w, rtol=rtol, atol=atol), \
                f"{label}.{k}: {g} vs {w}"


@pytest.mark.parametrize("phantom", ["uniform", "checker", "blob"])
@pytest.mark.parametrize("disc", ["fbs", "fbn"])
def test_all_feature_formulas_vs_loop_twin(phantom, disc):
    vol, mask, sp = _phantom(phantom)
    kw = ({"bin_width": 25.0} if disc == "fbs" else {"n_bins": 6})
    res = R.compute_radiomics(
        vol, mask, sp, alpha=0,
        families=("firstorder", "glcm", "glrlm", "glszm", "gldm",
                  "ngtdm"), **kw)

    cvol, cm = _crop(np.asarray(vol, np.float32), mask)
    levels, ng = R.discretize(cvol, cm, **kw)
    n_vox = int(cm.sum())

    glcm_dirs, glrlm_dirs = [], []
    lmax = max(cvol.shape)
    for d in R.DIRECTIONS_13:
        glcm_dirs.append(twin_glcm_one_direction(
            brute_glcm(levels, cm, ng, d)))
        glrlm_dirs.append(twin_rlm(
            brute_glrlm(levels, cm, ng, d, lmax), n_vox,
            R._GLRLM_KEYS))
    gldm_m, s, n = brute_gldm_ngtdm(levels, cm, ng, alpha=0)

    hist = np.zeros(ng)
    for g in levels[cm]:
        hist[g] += 1

    _assert_panel(res["firstorder"],
                  twin_firstorder(cvol, cm, sp, hist), "firstorder",
                  rtol=1e-6)  # package sees the f32 crop
    _assert_panel(res["glcm"], twin_average_directions(glcm_dirs),
                  "glcm")
    _assert_panel(res["glrlm"], twin_average_directions(glrlm_dirs),
                  "glrlm")
    _assert_panel(res["glszm"],
                  twin_rlm(brute_glszm(levels, cm, ng), n_vox,
                           R._GLSZM_KEYS), "glszm")
    _assert_panel(res["gldm"], twin_gldm(gldm_m, n_vox), "gldm")
    # ngtdm_s is a device f32 accumulation (the only non-integer
    # matrix), so the end-to-end values carry ~1e-7 input noise;
    # the FORMULAS are pinned tight on identical f64 inputs below
    _assert_panel(res["ngtdm"], twin_ngtdm(s, n), "ngtdm", rtol=1e-5)
    _assert_panel(R.ngtdm_features(s, n), twin_ngtdm(s, n),
                  "ngtdm-formula")


def test_uniform_cube_closed_forms():
    """Analytic anchors: a single-level ROI has zero texture by
    definition — these pin the CONVENTIONS (1-based levels, symmetric
    p, guard values), not just twin agreement."""
    vol, mask, sp = _phantom("uniform")
    res = R.compute_radiomics(vol, mask, sp, n_bins=4,
                              families=("glcm", "glrlm", "gldm",
                                        "ngtdm"))
    g = res["glcm"]
    assert np.isclose(g["Contrast"], 0.0)
    assert np.isclose(g["JointEnergy"], 1.0)
    assert np.isclose(g["MaximumProbability"], 1.0)
    assert np.isclose(g["Idm"], 1.0)
    assert np.isclose(g["Correlation"], 1.0)      # sigma=0 convention
    assert np.isclose(g["JointAverage"], 1.0)     # 1-based levels
    assert np.isclose(g["SumAverage"], 2.0)
    # one level, every voxel one max-length run per direction
    assert np.isclose(res["glrlm"]["HighGrayLevelRunEmphasis"], 1.0)
    assert np.isclose(res["ngtdm"]["Coarseness"], 1e6)  # cap
    assert np.isclose(res["ngtdm"]["Contrast"], 0.0)


def test_checkerboard_closed_forms():
    """Two-level 3-D checkerboard along an axis direction: every pair
    crosses levels, so for direction (0,0,1) the normalized symmetric
    GLCM is exactly [[0, .5], [.5, 0]]."""
    vol, mask, sp = _phantom("checker")
    cvol, cm = _crop(np.asarray(vol, np.float32), mask)
    levels, ng = R.discretize(cvol, cm, n_bins=2)
    assert ng == 2
    mats = R.texture_matrices(levels, cm, ng)
    feats = R.glcm_features(mats["glcm"][0:1])  # direction (0, 0, 1)
    assert np.isclose(feats["Contrast"], 1.0)
    assert np.isclose(feats["JointEnergy"], 0.5)
    assert np.isclose(feats["JointEntropy"], 1.0, atol=1e-6)
    assert np.isclose(feats["SumAverage"], 3.0)
    assert np.isclose(feats["JointAverage"], 1.5)
    assert np.isclose(feats["Correlation"], -1.0)
    assert np.isclose(feats["MaximumProbability"], 0.5)
    # every run has length 1 in the axis directions
    rl = R.glrlm_features(mats["glrlm"][0:1], int(cm.sum()))
    assert np.isclose(rl["LongRunEmphasis"], 1.0)
    assert np.isclose(rl["ShortRunEmphasis"], 1.0)
    assert np.isclose(rl["RunPercentage"], 1.0)
