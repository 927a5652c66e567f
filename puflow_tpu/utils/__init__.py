"""Shared utilities: point-cloud IO, timers."""

from puflow_tpu.utils.io import load_xyz, save_xyz

__all__ = ["load_xyz", "save_xyz"]
