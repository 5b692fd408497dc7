"""Pallas TPU kernels for the hot path (intersection + fused path tracing).

Populated by kernels/megakernel.py; the pure-XLA pipeline in render/ is the
semantic reference these kernels are validated against.
"""
