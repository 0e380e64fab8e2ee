"""I/O layer: reference-compatible flat-file writers and checkpoints."""
