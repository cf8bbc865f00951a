"""Pallas TPU kernels for the hot loops."""

from .segscan import masked_depth_cumsums, pallas_available  # noqa: F401
