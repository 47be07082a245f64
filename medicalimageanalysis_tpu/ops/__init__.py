"""Device-side compute kernels (JAX/XLA/Pallas) and the geometry core."""
