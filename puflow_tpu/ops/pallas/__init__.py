"""Pallas TPU kernels for the hot geometry ops.

Each kernel has a pure-XLA reference implementation in `puflow_tpu.ops`;
tests assert equivalence. Kernels are selected automatically on TPU via the
dispatch wrappers in the reference modules.
"""
