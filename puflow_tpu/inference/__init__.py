"""Patch-based whole-cloud inference."""

from puflow_tpu.inference.patch import (
    extract_patches,
    merge_patches,
    normalize_cloud,
    remove_outliers,
    upsample_cloud,
)

__all__ = [
    "extract_patches",
    "merge_patches",
    "normalize_cloud",
    "remove_outliers",
    "upsample_cloud",
]
