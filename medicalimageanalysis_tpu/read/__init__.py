"""Reader implementations (DICOM, MHD, 3MF, STL, VTK)."""
