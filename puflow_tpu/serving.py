"""Deployment surface: serialize inference entry points to portable
`jax.export` artifacts (StableHLO + embedded weights).

The reference ships inference as a Python checkout + checkpoint + CUDA
extensions compiled on the host (`modules/discrete/upsample.py`); a serving
fleet re-materialises that whole environment per node. Here the entire
traced computation — model weights baked in as constants, Pallas kernels
included — round-trips through `jax.export.serialize` bytes, so a server
needs only jax + the artifact file:

  * `export_patch_sampler`   — the per-patch upsampler
    ``patches [B, k, 3] -> [B, k*r, 3]`` (the unit a patch-parallel server
    schedules). Batch may be symbolic (any B at runtime, one artifact).
  * `export_cloud_upsampler` — the full whole-cloud pipeline
    ``clouds [B, N, 3] -> [B, npoint, 3]`` (normalise -> FPS seeds -> k-NN
    patches -> model -> union merge), shapes fixed at export time like
    every pipeline compilation.
  * `save_exported` / `load_exported` — file round-trip; the loaded object
    is directly callable (and jittable) on the serving host.

Exports are per-platform ('tpu' and/or 'cpu'): the TPU export embeds the
fused Mosaic kernels, the CPU export the XLA fallback path, chosen by the
same dispatch gates as live tracing (`models/discrete.use_fused_encoder`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import export as jax_export

from puflow_tpu.inference.patch import upsample_cloud_impl


def _sample_closure(params, state, model: str, upratio: int):
    if model == "discrete":
        from puflow_tpu.models import discrete as m
    elif model in ("continuous", "cnf"):
        from puflow_tpu.models import continuous as m
    else:
        raise ValueError(f"unknown model family: {model}")

    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    def sample(patches):
        return m.sample(params, state, patches, upratio)

    return sample


def _batch_spec(batch, shape_tail):
    """jax.ShapeDtypeStruct with a concrete or symbolic leading batch."""
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        return jax.ShapeDtypeStruct((b, *shape_tail), jnp.float32)
    return jax.ShapeDtypeStruct((int(batch), *shape_tail), jnp.float32)


def export_patch_sampler(params, state, model: str = "discrete",
                         upratio: int = 4, patch_size: int = 256,
                         batch: int | None = None,
                         platforms=None) -> jax_export.Exported:
    """Export ``patches [B, patch_size, 3] -> [B, patch_size*upratio, 3]``.

    ``batch=None`` exports with a symbolic batch dimension (one artifact
    serves every request size); a concrete ``batch`` pins it. ``platforms``
    defaults to the current backend.
    """
    sample = _sample_closure(params, state, model, upratio)
    spec = _batch_spec(batch, (patch_size, 3))
    return jax_export.export(jax.jit(sample),
                             platforms=platforms)(spec)


def export_cloud_upsampler(params, state, model: str = "discrete",
                           cloud_points: int = 2048, npoint: int | None = None,
                           upratio: int = 4, patch_size: int = 256,
                           expand_ratio: float = 4.0,
                           batch: int = 8,
                           platforms=None) -> jax_export.Exported:
    """Export the full pipeline ``clouds [batch, cloud_points, 3] ->
    [batch, npoint, 3]`` (default npoint = cloud_points*upratio + 24, the
    reference CLI's pre-outlier-removal count, `upsample.py:46-54`).

    The batch must be concrete: the merge kernels' grids depend on it.
    """
    if npoint is None:
        npoint = cloud_points * upratio + 24
    if model == "discrete":
        from puflow_tpu.checkpoint import _discrete_sample_fn as sample_fn
    else:
        from puflow_tpu.checkpoint import _cnf_sample_fn as sample_fn
    model_params = (jax.tree.map(jnp.asarray, params),
                    jax.tree.map(jnp.asarray, state))

    def run(pc):
        return upsample_cloud_impl(model_params, pc, sample_fn, npoint,
                                   upratio, patch_size, expand_ratio)

    spec = jax.ShapeDtypeStruct((int(batch), cloud_points, 3), jnp.float32)
    return jax_export.export(jax.jit(run), platforms=platforms)(spec)


def save_exported(exported: jax_export.Exported, path: str) -> None:
    """Write an export artifact (conventional suffix: ``.jaxexp``)."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Load an artifact -> a directly-callable (jittable) function."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    @functools.wraps(exported.call)
    def call(*args):
        return exported.call(*args)

    call.exported = exported
    return call
