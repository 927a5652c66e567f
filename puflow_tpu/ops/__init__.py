"""Geometry ops: pairwise distances, k-NN, FPS, gather, Chamfer, EMD.

Every op has a pure-XLA implementation (the reference oracle) and, where the
profile demands, a Pallas TPU kernel under `puflow_tpu.ops.pallas`.
"""

from puflow_tpu.ops.knn import pairwise_sqdist, knn_indices, gather_points
from puflow_tpu.ops.fps import farthest_point_sample
from puflow_tpu.ops.chamfer import chamfer_parts, chamfer_distance, hausdorff_distance
from puflow_tpu.ops.emd import emd_auction, emd_loss

__all__ = [
    "pairwise_sqdist",
    "knn_indices",
    "gather_points",
    "farthest_point_sample",
    "chamfer_parts",
    "chamfer_distance",
    "hausdorff_distance",
    "emd_auction",
    "emd_loss",
]
