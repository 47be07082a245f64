"""Mechanical audit: Pallas composition rules hold everywhere.

Hardware-only failure modes (CPU tests dispatch around the kernels and
cannot catch them — found on the chip by examples/cohort_scale.py):

1. a VMAPPED pallas_call with an ANY-memory-space operand does not
   lower on Mosaic (vmap adds a grid dim + nontrivial index map) —
   batch with lax.map/scan instead;
2. shard_map's varying-axes validation rejects pallas_call outputs —
   kernel-wrapping sites must use parallel.mesh.shard_map_nocheck.
"""

import ast
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..",
                    "medicalimageanalysis_tpu")

# entry points that reach pl.pallas_call
_KERNEL_NAMES = (
    "warp_jit", "warp_disp_jit", "field_warp", "field_warp_disp",
    "make_warp_sampler", "make_disp_sampler", "affine_warp",
    "affine_warp_fused", "_warp_call", "_field_warp_call",
    "_demons_core", "_syn_core", "_invert_planar", "_compose_planar",
)


def _py_files():
    for base, dirs, files in os.walk(ROOT):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(base, f)


def test_no_vmap_around_kernel_entry_points():
    offenders = []
    for path in _py_files():
        src = open(path, errors="replace").read()
        if "vmap" not in src:
            continue
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            name = fn.attr if isinstance(fn, ast.Attribute) else \
                getattr(fn, "id", "")
            if name != "vmap":
                continue
            seg = ast.get_source_segment(src, node) or ""
            hit = [k for k in _KERNEL_NAMES if k in seg]
            if hit:
                offenders.append(f"{path}:{node.lineno} vmap over {hit}")
    assert not offenders, (
        "jax.vmap around a Pallas kernel entry point does not lower on "
        "TPU (Mosaic rejects batched ANY-space operands); use "
        "lax.map/scan:\n" + "\n".join(offenders))


def test_shard_map_sites_use_nocheck_helper():
    """Direct shard_map( calls are only allowed where the body cannot
    reach a Pallas kernel (currently: the pure-stencil gaussian);
    everything else must go through shard_map_nocheck."""
    allowed_direct = {"gaussian_z_sharded"}
    offenders = []
    for path in _py_files():
        if path.endswith(os.path.join("parallel", "mesh.py")):
            continue  # the helper itself
        src = open(path, errors="replace").read()
        if "shard_map(" not in src:
            continue
        tree = ast.parse(src)
        # map each call to its enclosing function name
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            for sub in ast.walk(node):
                if isinstance(sub, ast.Call):
                    fn = sub.func
                    name = fn.attr if isinstance(fn, ast.Attribute) \
                        else getattr(fn, "id", "")
                    if name == "shard_map" \
                            and node.name not in allowed_direct:
                        offenders.append(
                            f"{path}:{sub.lineno} in {node.name}")
    assert not offenders, (
        "direct shard_map() in a function that may dispatch a Pallas "
        "kernel — use parallel.mesh.shard_map_nocheck (vma validation "
        "rejects pallas_call outputs):\n" + "\n".join(offenders))
