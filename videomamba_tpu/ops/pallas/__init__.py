"""Pallas TPU fast-path kernels (selected via ops.dispatch / use_fast_path)."""
