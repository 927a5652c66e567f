"""EMD auction kernel experiments, round 3b.

Variants against the shipped kernel (`ops/pallas/emd_pallas.py`, V1 =
min-iota selects):

* V2 — offload the `won`/`displaced` row gathers to the MXU: the bid
  matrix is one-hot per row (only column idx1[i] can carry a bid), so
  "did row i win" is colwin gathered at idx1[i] == i. Lane-dynamic
  gathers are not expressible in Mosaic; a one-hot bf16 matmul is exact
  here because every gathered value is < 32 after splitting colwin into
  (hi, lo) = (colwin >> 5, colwin & 31) and the one-hot rows involve no
  accumulation. Replaces two full [n, m] VPU reduce sweeps with one
  bf16 mask write + one tiny MXU op.
* V3 — two clouds per grid program (halves scalar loop overhead).

Each variant must match the dense-XLA auction (`ops/emd.emd_auction`)
EXACTLY on assignments before its timing counts. Run on the real TPU:

    python - <<'EOF'
    exec(open('scripts/exp_emd_v2.py').read())
    EOF
"""

from __future__ import annotations

import functools
import os

import jax

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/puflow_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import puflow_tpu  # noqa: F401
from puflow_tpu.ops.pallas.emd_pallas import _COMPILER_PARAMS, _NEG_BIG

def _kernel_v2(xyz1_ref, xyz2_ref, assign_out_ref, dist_out_ref,
               price_ref, inv_ref, assign_ref, base_ref, *, eps: float,
               iters: int, n: int, m: int):
    colio = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    rowio = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    rowcol = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    price_ref[...] = jnp.zeros((1, m), jnp.float32)
    inv_ref[...] = jnp.full((1, m), -1, jnp.int32)
    assign_ref[...] = jnp.full((n, 1), -1, jnp.int32)

    x1 = xyz1_ref[0]
    x2 = xyz2_ref[0]
    sq1 = jnp.sum(x1 * x1, axis=1, keepdims=True)
    sq2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
    cross = jax.lax.dot_general(
        x1, x2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq1 + jnp.transpose(sq2) - 2.0 * cross, 0.0)
    base_ref[...] = 3.0 - jnp.sqrt(d2)

    def body(it, _):
        value = base_ref[...] - price_ref[...]
        m1 = jnp.max(value, axis=1, keepdims=True)
        idx1 = jnp.min(jnp.where(value == m1, colio, jnp.int32(2 ** 30)),
                       axis=1, keepdims=True)
        sel = colio == idx1                                  # [n, m]
        m2 = jnp.max(jnp.where(sel, _NEG_BIG, value), axis=1,
                     keepdims=True)
        unass = assign_ref[...] < 0
        bid = m1 - m2 + eps

        bidmat = jnp.where(sel & unass, bid, _NEG_BIG)
        colmax = jnp.max(bidmat, axis=0, keepdims=True)      # [1, m]
        colwin = jnp.min(jnp.where(bidmat == colmax, rowio, jnp.int32(2 ** 30)),
                         axis=0, keepdims=True)              # [1, m]
        got = colmax > _NEG_BIG / 2

        # MXU gathers: colwin at idx1 (for `won`) and got at assign (for
        # `displaced`). Values < 32 after hi/lo split -> bf16-exact; the
        # one-hot rows accumulate at most one nonzero product.
        hi = jnp.transpose((colwin >> 5).astype(jnp.bfloat16))   # [m, 1]
        lo = jnp.transpose((colwin & 31).astype(jnp.bfloat16))   # [m, 1]
        gotf = jnp.transpose(got.astype(jnp.bfloat16))           # [m, 1]
        rhs = jnp.concatenate([hi, lo, gotf], axis=1)            # [m, 3]
        sel_bid = (sel & unass).astype(jnp.bfloat16)             # [n, m]
        sel_own = (colio == assign_ref[...]).astype(jnp.bfloat16)
        # bf16 dots need DEFAULT contract precision — Mosaic rejects the
        # fp32-precision form with bf16 operands ("Bad lhs type").
        gath_b = jax.lax.dot_general(
            sel_bid, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)                 # [n, 3]
        gath_o = jax.lax.dot_general(
            sel_own, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        win_at_bid = (gath_b[:, 0:1] * 32.0 + gath_b[:, 1:2]).astype(
            jnp.int32)
        bid_got = gath_b[:, 2:3] > 0.5
        won = unass & bid_got & (win_at_bid == rowcol)
        displaced = gath_o[:, 2:3] > 0.5                     # owned col rebid

        new_assign = jnp.where(won, idx1,
                               jnp.where(displaced, -1, assign_ref[...]))
        is_last = it == iters - 1
        last_assign = jnp.where(unass, idx1, assign_ref[...])
        assign_ref[...] = jnp.where(is_last, last_assign, new_assign)
        inv_ref[...] = jnp.where(got, colwin, inv_ref[...])
        price_ref[...] = price_ref[...] + jnp.where(got, colmax, 0.0)
        return 0

    jax.lax.fori_loop(0, iters, body, 0)

    sel = (colio == assign_ref[...]).astype(jnp.float32)
    x2_sel = jax.lax.dot_general(
        sel, x2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    diff = x1 - x2_sel
    dist_out_ref[0] = jnp.sum(diff * diff, axis=1, keepdims=True)
    assign_out_ref[0] = assign_ref[...]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def emd_v2(xyz1, xyz2, eps=0.005, iters=50, interpret=False):
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    kernel = functools.partial(_kernel_v2, eps=eps, iters=iters, n=n, m=m)
    assign, dist = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.VMEM((1, m), jnp.int32),
            pltpu.VMEM((n, 1), jnp.int32),
            pltpu.VMEM((n, m), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32))
    return dist[..., 0], assign[..., 0]


def check(fn, name, B=4, n=256, iters=50, interpret=False):
    from puflow_tpu.ops.emd import emd_auction

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x1 = jax.random.normal(k1, (B, n, 3))
    x2 = x1 + 0.01 * jax.random.normal(k2, (B, n, 3))
    d_ref, a_ref = emd_auction(x1, x2, 0.005, iters)
    d, a = fn(x1, x2, 0.005, iters, interpret)
    ok = bool((np.asarray(a) == np.asarray(a_ref)).all())
    dd = float(np.abs(np.asarray(d) - np.asarray(d_ref)).max())
    print(f"{name}: assign exact={ok} dist_delta={dd:.2e}")
    return ok


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:
        check(emd_v2, "V2 [4x256x50] (interpret)", interpret=True)
        return

    from puflow_tpu.ops.pallas.emd_pallas import emd_auction_pallas
    from puflow_tpu.utils.timing import time_fn

    assert check(emd_auction_pallas, "V1 [4x256x50]")
    assert check(emd_v2, "V2 [4x256x50]")

    B, n, iters = 32, 1024, 50
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x1 = jax.random.normal(k1, (B, n, 3))
    x2 = x1 + 0.01 * jax.random.normal(k2, (B, n, 3))
    for name, fn in (("V1 shipped", emd_auction_pallas), ("V2 mxu", emd_v2)):
        t = time_fn(lambda: fn(x1, x2, 0.005, iters)[0], iters=20, warmup=3)
        print(f"{name} [32x1024x50]: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
