"""Per-cell / per-face physics kernels (pure, vectorised JAX)."""
