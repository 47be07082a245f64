"""Domain model: Image, Roi, Poi, Dose, Rigid, Deformable
(exports mirror reference structure/__init__.py)."""


def __getattr__(name):
    import importlib
    table = {"Image": "image", "Display": "image", "Roi": "roi",
             "Poi": "poi", "Dose": "dose", "Rigid": "rigid",
             "Deformable": "deformable"}
    if name in table:
        mod = importlib.import_module(f"{__name__}.{table[name]}")
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["Image", "Roi", "Poi", "Dose", "Rigid", "Deformable"]
