"""Registration model families (optimizable, differentiable, device-run).

- rigid_intensity: 6-DoF pose model optimized through the trilinear
  warp (models/rigid_intensity.py)
- B-spline FFD: control-grid deformation model
  (ops/registration/bspline.py — re-exported here)
- demons: dense field iterations (ops/registration/demons.py)
"""

from ..runtime import setup_jax_cache as _setup_jax_cache
_setup_jax_cache()
def __getattr__(name):
    if name in ("register_rigid_intensity", "pose_to_matrix"):
        from . import rigid_intensity
        return getattr(rigid_intensity, name)
    if name == "bspline_registration":
        from ..ops.registration.bspline import bspline_registration
        return bspline_registration
    if name == "demons_registration":
        from ..ops.registration.demons import demons_registration
        return demons_registration
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["register_rigid_intensity", "pose_to_matrix",
           "bspline_registration", "demons_registration"]
