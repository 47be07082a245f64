"""Stateless compute utilities (mirror of reference mia/utils).

Exports match reference utils/__init__.py (ContourToDiscreteMesh,
ContourToMask, MaskToContour, ModelToMask, Volume, Refinement,
DeformableITK) plus the JAX-native names. Lazy so `import
medicalimageanalysis_tpu` stays light.
"""

_LAZY = {
    "ContourToDiscreteMesh": ("convert.contour", "ContourToDiscreteMesh"),
    "ContourToMask": ("convert.contour", "ContourToMask"),
    "MaskToContour": ("convert.contour", "MaskToContour"),
    "ModelToMask": ("convert.contour", "ModelToMask"),
    "Volume": ("mesh.volume", "Volume"),
    "TriMesh": ("mesh.trimesh", "TriMesh"),
    "Refinement": ("mesh.surface", "Refinement"),
    "clean_mesh": ("mesh.surface", "clean_mesh"),
    "expansion": ("mesh.surface", "expansion"),
    "surface_boundary": ("mesh.surface", "surface_boundary"),
    "only_main_component": ("mesh.surface", "only_main_component"),
    "DeformableITK": ("deformable.jax_backend", "DeformableITK"),
    "DeformableJAX": ("deformable.jax_backend", "DeformableJAX"),
    "ICP": ("rigid.icp", "ICP"),
    "external": ("image.threshold", "external"),
    "euler_transform": ("image.transform", "euler_transform"),
    "contours_from_mask": ("roi.contour", "contours_from_mask"),
    "CreateDicomImage": ("creation", "CreateDicomImage"),
    "CreateImageFromMask": ("creation", "CreateImageFromMask"),
    "accumulate_dose": ("dose", "accumulate_dose"),
    "register_dose_grid": ("dose", "register_dose_grid"),
    "evaluate_constraints": ("dose", "evaluate_constraints"),
    "bed": ("radiobiology", "bed"),
    "eqd2": ("radiobiology", "eqd2"),
    "geud": ("radiobiology", "geud"),
    "ntcp_lkb": ("radiobiology", "ntcp_lkb"),
    "ntcp_logistic": ("radiobiology", "ntcp_logistic"),
    "tcp_logistic": ("radiobiology", "tcp_logistic"),
    "find_phase_groups": ("fourd", "find_phase_groups"),
    "combine_phases": ("fourd", "combine_phases"),
    "compute_itv": ("fourd", "compute_itv"),
    "dice_coefficient": ("metrics", "dice_coefficient"),
    "jaccard_index": ("metrics", "jaccard_index"),
    "hausdorff_distance": ("metrics", "hausdorff_distance"),
    "mean_surface_distance": ("metrics", "mean_surface_distance"),
    "surface_dice": ("metrics", "surface_dice"),
    "compare_rois": ("metrics", "compare_rois"),
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        mod = importlib.import_module(f"{__name__}.{module}")
        return getattr(mod, attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
