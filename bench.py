"""Benchmark: end-to-end CT ingest -> FFS -> resample -> mask throughput.

Measures the BASELINE.json north-star workload (series/sec): synthetic
CT series on disk -> DICOM parse + decode (host) -> fused device
pipeline (rescale + FFS + separable resample + Gaussian + threshold
mask, one XLA program over the whole batch).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "series/sec", "vs_baseline": N}
vs_baseline is against the 50 series/sec v5e-8 target (BASELINE.md).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

N_SERIES = int(os.environ.get("BENCH_SERIES", 8))
N_SLICES = int(os.environ.get("BENCH_SLICES", 40))
SIZE = int(os.environ.get("BENCH_SIZE", 256))
OUT_SHAPE = (N_SLICES, SIZE // 2, SIZE // 2)
TARGET = 50.0  # series/sec on v5e-8 (BASELINE.json north_star)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.data import Data
    from medicalimageanalysis_tpu.parallel.batch import make_preprocess_fn
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    from medicalimageanalysis_tpu.config import config
    # host assembles the raw stacks; ALL device work happens in one
    # batched program below (cohort design — avoids per-series
    # host<->device round trips)
    config.jit_ingest = False

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="mia_bench_")
    for s in range(N_SERIES):
        arr = rng.integers(0, 3000, size=(N_SLICES, SIZE, SIZE)) \
            .astype(np.int16)
        CreateDicomImage(os.path.join(tmp, f"s{s:02d}"), arr,
                         spacing=[0.97, 0.97], thickness=2.5).run()

    fn = jax.jit(make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                                    ffs_op="none"))

    # warmup: compile ingest jits + pipeline outside the timed region
    mia.read_dicoms(folder_path=os.path.join(tmp, "s00"))
    warm_raw = np.zeros((N_SERIES, N_SLICES, SIZE, SIZE), np.int16)
    vols, masks = fn(warm_raw, np.ones(N_SERIES, np.float32),
                     np.zeros(N_SERIES, np.float32))
    jax.block_until_ready((vols, masks))

    t0 = time.perf_counter()
    mia.read_dicoms(folder_path=tmp)
    t_ingest = time.perf_counter() - t0

    batch = np.stack([Data.image[n].array for n in Data.image_list])
    slopes = np.ones(batch.shape[0], np.float32)
    intercepts = np.zeros(batch.shape[0], np.float32)

    t1 = time.perf_counter()
    vols, masks = fn(batch, slopes, intercepts)
    jax.block_until_ready((vols, masks))
    t_device = time.perf_counter() - t1

    total = t_ingest + t_device
    value = N_SERIES / total
    print(json.dumps({
        "metric": "ct_ingest_ffs_resample_mask_throughput",
        "value": round(value, 3),
        "unit": "series/sec",
        "vs_baseline": round(value / TARGET, 4),
        "detail": {
            "n_series": N_SERIES, "slices": N_SLICES, "size": SIZE,
            "ingest_s": round(t_ingest, 3),
            "device_pipeline_s": round(t_device, 4),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
