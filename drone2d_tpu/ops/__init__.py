"""Device-path compute kernels: frame math, path geometry, rigid-body physics."""
