"""Alignment kernels: NumPy oracle, pure-XLA scan, and Pallas TPU wavefront."""
