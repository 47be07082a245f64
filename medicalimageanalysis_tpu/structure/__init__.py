"""Domain model: Image, Roi, Poi, Dose, Rigid, Deformable."""
