"""Low-level ops: counter-based hashing, Pallas TPU kernels."""
