"""Pallas TPU kernels — the production fused path for hot scenes."""
