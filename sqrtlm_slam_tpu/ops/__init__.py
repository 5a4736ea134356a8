"""Pallas TPU kernels for the hot ops (fallbacks keep CPU tests hermetic)."""

from .hamming import hamming_matrix_pallas, hamming_matrix_reference  # noqa: F401
