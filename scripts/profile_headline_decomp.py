"""Decompose the bench headline: where do 1.46 s - 0.83 s go?

BENCH r4c: total_s=1.463 for 8 series, staged 31.46 MB, link rate
38 MB/s -> bound 9.67 series/s, value_over_bound 0.565. The bound
assumes the 4 MB round-trip probe's rate holds for sustained one-way
uploads. This probe measures, in one process:

  1. sustained one-way upload at the bench's chunk payload size
     (packed ~11.8 MB), repeated, forced by a 1-element pull of a
     device-side sum (no download of the payload);
  2. the same via the actual fn_packed dispatch (upload + compute);
  3. host section: read_dicoms parse + stack + pack12 per chunk;
  4. the 4 MB round-trip rate for comparison.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_SLICES, SIZE, CHUNK = 40, 256, 4

from medicalimageanalysis_tpu import runtime
from medicalimageanalysis_tpu.ops.bitpack import pack12, unpack12_device
from medicalimageanalysis_tpu.parallel.batch import make_preprocess_fn

runtime.setup_jax_cache()

rate = runtime.transfer_rate_bytes_per_s(force=True)
print(f"4MB-roundtrip rate: {rate/1e6:.1f} MB/s", flush=True)

rng = np.random.default_rng(0)
raw = rng.integers(0, 3000, size=(CHUNK, N_SLICES, SIZE, SIZE)
                   ).astype(np.int16)
packed = pack12(raw)
words, lo = packed[0], np.float32(packed[1])
print(f"chunk payload: raw {raw.nbytes/1e6:.2f} MB, "
      f"packed {words.nbytes/1e6:.2f} MB", flush=True)


@jax.jit
def touch(w):
    return w.ravel()[0].astype(jnp.float32)


# 1. sustained upload: device_put + 1-element pull, fresh buffer each
# time (perturbed so no caching layer can dedup)
for _ in range(2):  # warm then measure
    t0 = time.perf_counter()
    ts = []
    for i in range(4):
        w = words.copy()
        w[0, 0] ^= np.uint16(i + 1)
        t1 = time.perf_counter()
        dev = jax.device_put(w)
        float(touch(dev))
        ts.append(time.perf_counter() - t1)
up_rate = words.nbytes / min(ts)
print(f"sustained upload (device_put, best of 4): "
      f"{[round(t*1e3,1) for t in ts]} ms -> {up_rate/1e6:.1f} MB/s",
      flush=True)

# 2. the bench's actual dispatch: fn_packed(upload + unpack + preprocess)
OUT_SHAPE = (N_SLICES, SIZE // 2, SIZE // 2)
pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE, ffs_op="none")


@jax.jit
def fn_packed(w, lo, sl, ic):
    r = unpack12_device(w, lo, SIZE, dtype=jnp.int16)
    return pre(r, sl, ic)


ones = np.ones(CHUNK, np.float32)
zeros = np.zeros(CHUNK, np.float32)
out = fn_packed(words, lo, ones, zeros)
float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
ts2 = []
for i in range(4):
    w = words.copy()
    w[0, 0] ^= np.uint16(i + 1)
    t1 = time.perf_counter()
    out = fn_packed(w, lo, ones, zeros)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts2.append(time.perf_counter() - t1)
print(f"fn_packed dispatch (upload+compute): "
      f"{[round(t*1e3,1) for t in ts2]} ms", flush=True)

# 3. host section: synth series on disk -> read_dicoms + stack + pack
import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.config import config
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

config.jit_ingest = False
tmp = tempfile.mkdtemp(prefix="mia_decomp_")
dirs = []
for s in range(CHUNK):
    arr = rng.integers(0, 3000, size=(N_SLICES, SIZE, SIZE)
                       ).astype(np.int16)
    d = os.path.join(tmp, f"s{s:02d}")
    CreateDicomImage(d, arr, spacing=[0.97, 0.97], thickness=2.5).run()
    dirs.append(d)
files = [os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d))]
for _ in range(3):
    Data.clear()
    t1 = time.perf_counter()
    mia.read_dicoms(file_list=files)
    batch = np.stack([Data.image[n].array for n in Data.image_list])
    pk = pack12(batch)
    t_host = time.perf_counter() - t1
    print(f"host parse+stack+pack per chunk: {t_host*1e3:.1f} ms",
          flush=True)

# 4. two-chunk pipelined e2e (the bench inner loop shape): is chunk
# k+1's host work really hidden under chunk k's upload?
ts3 = []
for i in range(3):
    t1 = time.perf_counter()
    pend = []
    for c in range(2):
        w = words.copy()
        w[0, 0] ^= np.uint16(10 * i + c + 1)
        pend.append(fn_packed(w, lo, ones, zeros))
    float(jax.tree_util.tree_leaves(pend[-1])[0].ravel()[0])
    ts3.append(time.perf_counter() - t1)
print(f"two back-to-back dispatches (no host between): "
      f"{[round(t*1e3,1) for t in ts3]} ms", flush=True)
