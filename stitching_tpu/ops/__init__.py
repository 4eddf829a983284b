"""Device-side (JAX/XLA/Pallas) compute kernels for the stitching pipeline."""
