"""Device-mesh parallelism: data/patch-axis sharding over ICI.

The reference is single-GPU (`train_pu1k.py:145`, SURVEY.md §2.4); here
data-parallel training and patch-parallel inference are first-class via
`jax.sharding.Mesh` + jit shardings. XLA inserts the psum/all-gather
collectives; nothing in the model code mentions devices.
"""

from puflow_tpu.parallel.mesh import make_mesh, batch_sharding, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
