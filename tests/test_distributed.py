"""Two-process jax.distributed cohort test (CPU, CI-style).

Drives parallel.mesh.initialize_distributed + ingest_cohort +
distributed_cohort_batch across two REAL processes: each worker parses
its own synthetic DICOM folder (host-local, like one node of a
multi-host pod), contributes its series as local shards of a global
batch over a ('data', 'space') mesh spanning both processes, and runs
one sharded reduction whose value every process can check analytically.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_WORKER = r"""
import os, sys, tempfile
import numpy as np
import jax

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["MIA_COORDINATOR"] = f"localhost:{port}"

from medicalimageanalysis_tpu.parallel.mesh import (initialize_distributed,
                                                    make_mesh)
ok = initialize_distributed(num_processes=2, process_id=pid)
assert ok, "initialize_distributed returned False with coordinator set"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()   # 4 cpu devs x 2

# host-local ingest: each worker parses its own folder
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.parallel.cohort import (
    distributed_cohort_batch, ingest_cohort)
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

rng = np.random.default_rng(100 + pid)
tmp = tempfile.mkdtemp()
for s in range(2):
    arr = np.full((8, 16, 16), 100 * (pid * 2 + s + 1), np.int16)
    CreateDicomImage(os.path.join(tmp, f"s{s}"), arr,
                     spacing=[1.0, 1.0], thickness=2.0).run()

results = ingest_cohort(folder_path=tmp)   # local device program
names = sorted(results)
assert len(names) == 2, names

mesh = make_mesh(8, space=2)
local_vols = [np.asarray(Data.image[n].array, np.float32) for n in names]
gbatch = distributed_cohort_batch(local_vols, mesh)
assert gbatch.shape == (4, 8, 16, 16), gbatch.shape

# one sharded global reduction: per-series means then a global sum.
# series values are 100,200 (proc 0) and 300,400 (proc 1) -> sum 1000.
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

@jax.jit
def total_mean(b):
    return jnp.sum(jnp.mean(b, axis=(1, 2, 3)))

out = total_mean(gbatch)   # replicated scalar: addressable everywhere
val = float(out)
assert abs(val - 1000.0) < 1e-3, val

# sequence-parallel demons across the 2-process mesh: one volume
# z-sharded over 'space', halo ppermutes + pmax riding the global mesh;
# result must match each worker's own single-device demons loop
from medicalimageanalysis_tpu.ops.registration.demons import (
    demons_registration)
from medicalimageanalysis_tpu.parallel.halo import demons_z_sharded

zz, yy, xx = np.mgrid[0:8, 0:16, 0:16].astype(np.float32)
fx = (np.exp(-(((zz - 4) / 2) ** 2 + ((yy - 8) / 4) ** 2
               + ((xx - 8) / 4) ** 2)) * 100).astype(np.float32)
mv = np.roll(fx, shift=1, axis=2).astype(np.float32)
got = demons_z_sharded(fx, mv, mesh, iterations=4, std=1, halo=4)
ref = demons_registration(fx, mv, method="fast", iterations=4, std=1)
derr = float(np.abs(got - ref).max())
assert derr < 2e-3, f"sharded demons mismatch across processes: {derr}"
print(f"worker {pid} OK total={val} demons_err={derr:.2e}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("MIA_SKIP_DISTRIBUTED") == "1",
                    reason="distributed test disabled")
def test_two_process_cohort():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    with tempfile.NamedTemporaryFile("w", suffix=".py",
                                     delete=False) as f:
        f.write(_WORKER)
        worker = f.name

    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"worker {i} OK total=1000.0" in out, out[-1500:]
