"""Pallas TPU kernels for the hot ops (with interpret-mode fallback)."""
