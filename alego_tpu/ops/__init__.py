"""Core compute kernels: geometry, projection, segmentation, features,
correspondence search, solvers."""
