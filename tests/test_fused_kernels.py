"""Fused Pallas kernels vs the XLA formulations (interpret mode, real ckpt).

The fused encoder / interp-head / inverse-flow kernels only dispatch on TPU;
these tests pin their math on CPU through the Pallas interpreter so kernel
regressions are caught by the (CPU) suite.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = "/root/reference/pretrain/puflow-x4-pu1k.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="no pretrained ckpt")


@pytest.fixture(scope="module")
def folded():
    from puflow_tpu.checkpoint import load_checkpoint

    params, state, _ = load_checkpoint(CKPT, "discrete", fold=True)
    return (jax.tree.map(jnp.asarray, params),
            jax.tree.map(jnp.asarray, state))


def test_encoder_kernel_matches_xla(folded):
    from puflow_tpu.models import discrete
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.encoder_pallas import (
        EXACT_PRECISION,
        FAST_PRECISION,
        encoder_conditions_pallas,
    )

    params, state = folded
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3)) * 0.3
    idx = knn_indices(x, x, 16)
    cs_ref, _ = discrete.feat_extract(params, state, x, idx, train=False)
    cs_k = encoder_conditions_pallas(params, x, idx, True, EXACT_PRECISION)
    # the fused-path default (single-pass bf16 from block 1) is gated
    # end-to-end by the golden pipeline CD (scripts/exp_encoder_cd.py);
    # here pin a coarse per-block bound so a config regression is caught
    cs_f = encoder_conditions_pallas(params, x, idx, True, FAST_PRECISION)
    for i, (a, b, f) in enumerate(zip(cs_ref, cs_k, cs_f)):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        # the kernel's 3-pass bf16 matmul decomposition (~2^-22 relative
        # per product) compounds through the recursive pyramid: gate the
        # RELATIVE error (activation scale grows ~500x by block 5)
        scale = np.abs(np.asarray(a)).max()
        assert err < 5e-5 * scale + 1e-4, f"block {i}: {err} (scale {scale})"
        err_f = np.abs(np.asarray(a) - np.asarray(f)).max()
        assert err_f < 5e-2 * scale + 1e-3, \
            f"fast block {i}: {err_f} (scale {scale})"


def test_encoder_cm_kernel_matches_xla(folded):
    """The transposed (channel-major) encoder kernel — the shipped round-4
    fused path — matches the XLA encoder, and its pack layout places
    patch i of a pack at lanes i*n..(i+1)*n."""
    from puflow_tpu.models import discrete
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.encoder_pallas import (
        EXACT_PRECISION,
        FAST_PRECISION,
        encoder_conditions_pallas_cm,
    )

    params, state = folded
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 3)) * 0.3
    idx = knn_indices(x, x, 16)
    cs_ref, _ = discrete.feat_extract(params, state, x, idx, train=False)
    cs_k = encoder_conditions_pallas_cm(params, x, idx, 1, True,
                                        EXACT_PRECISION)
    cs_f = encoder_conditions_pallas_cm(params, x, idx, 1, True,
                                        FAST_PRECISION)
    for i, (a, b, f) in enumerate(zip(cs_ref, cs_k, cs_f)):
        b = np.swapaxes(np.asarray(b), 1, 2)
        err = np.abs(np.asarray(a) - b).max()
        scale = np.abs(np.asarray(a)).max()
        assert err < 5e-5 * scale + 1e-4, f"block {i}: {err} ({scale})"
        f = np.swapaxes(np.asarray(f), 1, 2)
        err_f = np.abs(np.asarray(a) - f).max()
        assert err_f < 5e-2 * scale + 1e-3, f"fast block {i}: {err_f}"

    cs_p = encoder_conditions_pallas_cm(params, x, idx, 2, True,
                                        EXACT_PRECISION)
    for i, (a, p) in enumerate(zip(cs_k, cs_p)):
        a, p = np.asarray(a), np.asarray(p)
        packed = np.concatenate([a[0::2], a[1::2]], axis=0)  # noqa: F841
        want = np.stack([np.concatenate([a[2 * j], a[2 * j + 1]], axis=1)
                         for j in range(2)])
        assert np.array_equal(p, want), f"pack layout block {i}"


def test_interp_weights_cm_t_matches_xla(folded):
    """Transposed weight head + fused slot softmax (shipped round-4 path)
    vs the XLA head + softmax tail."""
    from puflow_tpu.models.encoder import (
        knn_context_apply,
        weight_unit_apply,
    )
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.encoder_pallas import (
        interp_weights_cm_pallas_t,
    )

    params, state = folded
    r = 4
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 3)) * 0.3
    idx = knn_indices(x, x, 8)
    ip, istate = params["interp"], state["interp"]
    ctx, _ = knn_context_apply(ip["knn_context"], istate["knn_context"], x,
                               idx, False)
    logits, _ = weight_unit_apply(ip["weight_unit"], istate["weight_unit"],
                                  ctx, False)
    w = jax.nn.softmax(logits[..., :r].astype(jnp.float32), axis=2)
    ref = jnp.transpose(w, (0, 3, 2, 1)).reshape(2, r, 8 * 64)

    got = interp_weights_cm_pallas_t(ip, x, idx, r, True, False)
    err = np.abs(np.asarray(ref) - np.asarray(got)).max()
    assert err < 5e-4, err
    got_f = interp_weights_cm_pallas_t(ip, x, idx, r, True, True)
    err_f = np.abs(np.asarray(ref) - np.asarray(got_f)).max()
    assert err_f < 0.05, err_f


def test_interp_kernel_matches_xla(folded):
    from puflow_tpu.models.encoder import (
        knn_context_apply,
        weight_unit_apply,
    )
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.encoder_pallas import interp_logits_pallas

    params, state = folded
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 3)) * 0.3
    idx = knn_indices(x, x, 8)
    ip, istate = params["interp"], state["interp"]
    ctx, _ = knn_context_apply(ip["knn_context"], istate["knn_context"], x,
                               idx, False)
    logits_ref, _ = weight_unit_apply(ip["weight_unit"],
                                      istate["weight_unit"], ctx, False)
    logits_k = interp_logits_pallas(ip, x, idx, True, False)
    err = np.abs(np.asarray(logits_ref) - np.asarray(logits_k)).max()
    assert err < 2e-3, err
    # fast mode (single-pass bf16 head): coarse bound; end-to-end gated by
    # the golden pipeline CD (scripts/exp_encoder_cd.py)
    logits_f = interp_logits_pallas(ip, x, idx, True, True)
    err_f = np.abs(np.asarray(logits_ref) - np.asarray(logits_f)).max()
    assert err_f < 1.0, err_f


def test_interp_latents_kernel_matches_xla(folded):
    """The fully-fused variant (weight head + softmax + latent blend)
    matches the XLA softmax/gather/einsum tail."""
    from puflow_tpu.models.encoder import (
        knn_context_apply,
        weight_unit_apply,
    )
    from puflow_tpu.ops.knn import knn_indices, make_neighbor_gather
    from puflow_tpu.ops.pallas.encoder_pallas import interp_latents_pallas

    params, state = folded
    r = 4
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 3)) * 0.3
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 3))
    idx = knn_indices(x, x, 8)
    ip, istate = params["interp"], state["interp"]
    ctx, _ = knn_context_apply(ip["knn_context"], istate["knn_context"], x,
                               idx, False)
    logits, _ = weight_unit_apply(ip["weight_unit"], istate["weight_unit"],
                                  ctx, False)
    w = jax.nn.softmax(logits[..., :r].astype(jnp.float32), axis=2)
    nei = make_neighbor_gather(idx, x.shape[1], None)(z)
    ref = jnp.einsum("bnkc,bnkr->bncr", nei.astype(jnp.float32), w)

    got = interp_latents_pallas(ip, x, idx, z, r, True, False)
    err = np.abs(np.asarray(ref) - np.asarray(got)).max()
    assert err < 5e-4, err
    got_f = interp_latents_pallas(ip, x, idx, z, r, True, True)
    err_f = np.abs(np.asarray(ref) - np.asarray(got_f)).max()
    assert err_f < 0.3, err_f


def test_dispatch_gate_boundaries(caplog):
    """Pin the exact fused-kernel dispatch boundaries and the fallback log.

    The fused encoder dispatches iff N*K <= 8192 and the fused inverse flow
    iff N*r <= 4096 (VMEM working-set budgets); shapes just above each gate
    must fall back with a one-line warning — never silently.
    """
    import logging

    from puflow_tpu.models.discrete import (
        ENCODER_FUSED_MAX_NK,
        FLOW_G_FUSED_MAX_NR,
        _warned_shapes,
        use_fused_encoder,
        use_fused_flow_g,
    )

    assert ENCODER_FUSED_MAX_NK == 8192
    assert FLOW_G_FUSED_MAX_NR == 4096
    # at the boundary: dispatches (on a TPU backend)
    assert use_fused_encoder(512, 16, backend="tpu")
    assert use_fused_flow_g(1024, 4, backend="tpu")
    # never on CPU (kernels are TPU Mosaic programs)
    assert not use_fused_encoder(512, 16, backend="cpu")
    assert not use_fused_flow_g(1024, 4, backend="cpu")
    # just above: falls back and logs once
    _warned_shapes.clear()
    with caplog.at_level(logging.WARNING, logger="puflow_tpu.dispatch"):
        assert not use_fused_encoder(513, 16, backend="tpu")
        assert not use_fused_flow_g(1025, 4, backend="tpu")
        assert not use_fused_encoder(513, 16, backend="tpu")  # dedup
    gate_logs = [r for r in caplog.records if "fused" in r.message]
    assert len(gate_logs) == 2, [r.message for r in gate_logs]


def test_flow_g_above_gate_falls_back_identically(folded):
    """A shape just above the N*r gate takes the XLA fallback inside
    g_transform(fast=True): identical to the explicit XLA path (the kernel's
    slot-major tiling is only specified below the gate — that is WHY the
    gate exists)."""
    from puflow_tpu.models import discrete

    params, _ = folded
    B, n, r = 1, 1032, 4  # N*r = 4128 > 4096
    assert not discrete.use_fused_flow_g(n, r, backend="tpu")
    z = jax.random.normal(jax.random.PRNGKey(7), (B, n, 3, r)) * 0.5
    cs = [jax.random.normal(jax.random.PRNGKey(20 + i), (B, n, c)) * 0.5
          for i, c in enumerate([32, 64, 128, 128, 128, 128])]
    # fast=True must produce the same result as the explicit XLA path
    x_fast = discrete.g_transform(params, z, cs, r, fast=True)
    x_ref = discrete.g_transform(params, z, cs, r, fast=False)
    np.testing.assert_array_equal(np.asarray(x_fast), np.asarray(x_ref))


def test_flow_g_kernel_matches_xla(folded):
    from puflow_tpu.models import discrete
    from puflow_tpu.ops.pallas import flow_pallas
    from puflow_tpu.ops.pallas.flow_pallas import flow_g_pallas

    params, _ = folded
    B, n, r = 2, 32, 4
    z = jax.random.normal(jax.random.PRNGKey(3), (B, n, 3, r)) * 0.5
    cs = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, n, c)) * 0.5
          for i, c in enumerate([32, 64, 128, 128, 128, 128])]
    x_ref = discrete.g_transform(params, z, cs, r, fast=False)
    # FLOW_PASSES is read at trace time, so clear the jit cache around
    # each setting (same-signature calls would otherwise reuse the first
    # trace)
    old = flow_pallas.FLOW_PASSES
    try:
        # exact 3-pass decomposition: tight bound
        flow_pallas.FLOW_PASSES = 3
        flow_g_pallas.clear_cache()
        x_k = flow_g_pallas(params["flow_blocks"], z, cs, True)
        np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                                   atol=1e-5)
        # shipped 2-pass default: coarse bound here; end-to-end golden-CD
        # gated on the real chip (scripts/check_fused_parity.py, 4.82e-4)
        flow_pallas.FLOW_PASSES = 2
        flow_g_pallas.clear_cache()
        x_f = flow_g_pallas(params["flow_blocks"], z, cs, True)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                                   atol=5e-3)
    finally:
        flow_pallas.FLOW_PASSES = old
        flow_g_pallas.clear_cache()


def test_flow_f_kernel_matches_xla(folded):
    """The fused forward flow (points -> latents, no logdet) matches
    f_transform's z output on REAL encoder conditions (synthetic random
    conditions amplify through the injector exp() to ~1e9 scales the real
    chain never sees)."""
    from puflow_tpu.models import discrete
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas import flow_pallas
    from puflow_tpu.ops.pallas.flow_pallas import flow_f_pallas

    params, state = folded
    B, n = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(4), (B, n, 3)) * 0.3
    idx = knn_indices(x, x, 16)
    cs, _ = discrete.feat_extract(params, state, x, idx, train=False)
    z_ref, _ = discrete.f_transform(params, x, cs)
    assert np.abs(np.asarray(z_ref)).max() < 50  # sane latent scale
    # the f kernel pins 3-pass (exact) matmuls internally (2-pass measured
    # 7% z error — forward intermediates reach +-130); ~6e-6-relative
    # rounding still amplifies through six injector exp() stages
    z_k = flow_f_pallas(params["flow_blocks"], x, cs, True)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               atol=2e-3)


def test_flow_g_blend_matches_composition(folded):
    """The blend-fused inverse flow (interp weights + neighbour-latent
    blend in the g kernel's prologue, z handed over in f's packed
    channel-major layout) matches the 4-kernel composition
    encoder -> f -> interp_latents -> g to softmax ULP."""
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.encoder_pallas import (
        encoder_conditions_pallas,
        interp_latents_pallas,
        interp_weights_cm_pallas,
    )
    from puflow_tpu.ops.pallas.flow_pallas import (
        flow_f_pallas,
        flow_g_blend_pallas,
        flow_g_pallas,
    )

    params, _ = folded
    B, n, r = 2, 64, 4  # 8*64 = 512 rows: divisible by 128 (wide idx)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, n, 3)) * 0.3
    idx16 = knn_indices(x, x, 16)
    idx8 = idx16[..., :8]

    from puflow_tpu.ops.knn import make_neighbor_gather

    cs = encoder_conditions_pallas(params, x, idx16, True)
    z = flow_f_pallas(params["flow_blocks"], x, cs, True)
    # the SAME weights feed both sides (the blend-fusion claim is about
    # the in-prologue gather/blend, not the weight head — the round-4
    # transposed head rounds bf16 differently from the row-major
    # interp_latents kernel, which has its own matches-XLA test)
    ws = interp_weights_cm_pallas(params["interp"], x, idx8, r, True)
    w_bnkr = jnp.transpose(ws.reshape(B, r, 8, n), (0, 3, 2, 1))
    nei = make_neighbor_gather(idx8, n, None)(z.astype(jnp.float32))
    fz = jnp.einsum("bnkc,bnkr->bncr", nei.astype(jnp.float32),
                    w_bnkr.astype(jnp.float32))
    out_ref = flow_g_pallas(params["flow_blocks"],
                            fz.reshape(B, n, 3, r), cs, True)

    z_cm = flow_f_pallas(params["flow_blocks"], x, cs, True, True)
    out = flow_g_blend_pallas(params["flow_blocks"], z_cm, ws, idx8, cs,
                              True)
    # the in-prologue z gather is the exact hi/lo bf16 split (~2^-16);
    # the XLA reference einsum above is exact f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=3e-5)
    # the fully-fused latents kernel (row-major head) stays consistent
    # with its own composition to fast-mode tolerance
    fz_k = interp_latents_pallas(params["interp"], x, idx8,
                                 z.astype(jnp.float32), r, True)
    assert np.abs(np.asarray(fz_k) - np.asarray(fz)).max() < 0.3


def test_flow_f_gate_and_fallback():
    from puflow_tpu.models.discrete import (FLOW_F_FUSED_MAX_N,
                                            use_fused_flow_f)

    assert FLOW_F_FUSED_MAX_N == 2048
    assert use_fused_flow_f(2048, backend="tpu")
    assert not use_fused_flow_f(2049, backend="tpu")
    assert not use_fused_flow_f(256, backend="cpu")


def test_knn_kernel_matches_xla_sets():
    """Fused kNN kernel: ascending order, self-first, same neighbour SETS
    as the XLA path (interpret mode; distance-rounding near-ties are
    astronomically unlikely on random data)."""
    from puflow_tpu.ops.knn import knn_indices
    from puflow_tpu.ops.pallas.knn_pallas import (knn_self_pallas,
                                                  use_fused_knn)

    xyz = jax.random.normal(jax.random.PRNGKey(3), (3, 128, 3))
    ref = np.asarray(knn_indices(xyz, xyz, 16))
    got = np.asarray(knn_self_pallas(xyz, 16, True))
    assert got.shape == ref.shape
    # slot 0 is the point itself
    assert (got[:, :, 0] == np.arange(128)[None]).all()
    # ascending distances
    d = np.asarray(jnp.sum((xyz[:, :, None] - xyz[:, None]) ** 2, -1))
    dd = np.take_along_axis(d.reshape(-1, 128), got.reshape(-1, 16), axis=1)
    assert (np.diff(dd, axis=1) >= -1e-12).all()
    # same sets at both consumer prefixes (k=8 interp graph, k=16 encoder)
    for kk in (8, 16):
        assert all(set(ref[b, i, :kk]) == set(got[b, i, :kk])
                   for b in range(3) for i in range(128))
    # dispatch gate: TPU only, n multiple of 128 within VMEM envelope
    assert use_fused_knn(256, backend="tpu")
    assert not use_fused_knn(100, backend="tpu")
    assert not use_fused_knn(2048, backend="tpu")
    assert not use_fused_knn(256, backend="cpu")
