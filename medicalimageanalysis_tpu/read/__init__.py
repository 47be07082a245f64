"""Reader implementations (exports mirror reference read/__init__.py)."""


def __getattr__(name):
    import importlib
    table = {"DicomReader": "dicom", "MhdReader": "mhd",
             "ThreeMfReader": "mf3", "StlReader": "stl",
             "VtkReader": "vtk", "PlyReader": "ply",
             "ObjReader": "obj", "ReadRTStruct": "rtstruct",
             "ReadREG": "reg", "ReadRTDose": "rtdose",
             "Read3D": "volume3d", "ReadXRay": "planar",
             "ReadRF": "planar", "ReadUS": "planar"}
    if name in table:
        mod = importlib.import_module(f"{__name__}.{table[name]}")
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["DicomReader", "MhdReader", "ThreeMfReader", "StlReader",
           "VtkReader", "PlyReader", "ObjReader", "Read3D", "ReadXRay",
           "ReadRF", "ReadUS", "ReadRTStruct", "ReadREG", "ReadRTDose"]
