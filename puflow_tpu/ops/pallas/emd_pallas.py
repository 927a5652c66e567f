"""Auction EMD as a single VMEM-resident Pallas kernel.

The XLA formulation (`puflow_tpu.ops.emd`) re-reads the [n, m] distance
matrix from HBM on every one of the 50 auction iterations (~13 GB of
traffic at training shapes; measured 599 ms for [32, 1024]). Here only the
raw [n, 3] coordinates enter the kernel; the base value matrix
``3 - |x1 - x2|`` is computed ONCE into a VMEM scratch (4 MB at training
shapes — recomputing it per iteration costs ~6 VPU passes including a
[n, m] sqrt, measured ~40% of the iteration), and each iteration is pure
VPU work: subtract prices, row top-2, per-column winner, masked vector
updates.

Semantics identical to the dense reference reformulation (see
`ops/emd.py`, mirroring `metric/emd/emd_cuda.cu`): one winner per target
(ties -> lowest bidder row), displaced owners unassigned, the final
iteration force-assigns every remaining bidder WITHOUT displacing
(cuda Assign's `!last` guard), output distances are squared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e9

# The cached base matrix (4 MB at [1024, 1024]) plus the per-iteration
# value/bid temporaries exceed the default 16 MB scoped-VMEM limit.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _onehot_dot(sel_bf16, rhs_bf16, interp: bool):
    """Exact one-hot gather as a bf16 MXU matmul.

    Every row of ``sel_bf16`` is one-hot (or all-zero) and every gathered
    value fits bf16's 8-bit mantissa exactly (< 256 by construction), so
    the product is exact and there is no accumulation. Mosaic requires
    DEFAULT contract precision for bf16 operands; interpret mode (XLA:CPU)
    can't run a standalone bf16 x bf16 -> f32 dot, and computing on f32
    upcasts is bit-identical here.
    """
    if interp:
        return jax.lax.dot_general(
            sel_bf16.astype(jnp.float32), rhs_bf16.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        sel_bf16, rhs_bf16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _auction_kernel(xyz1_ref, xyz2_ref, assign_out_ref, dist_out_ref,
                    price_ref, inv_ref, assign_ref, base_ref, *, eps: float,
                    iters: int, n: int, m: int, interp: bool):
    colio = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    rowio = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    rowcol = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    price_ref[...] = jnp.zeros((1, m), jnp.float32)
    inv_ref[...] = jnp.full((1, m), -1, jnp.int32)
    assign_ref[...] = jnp.full((n, 1), -1, jnp.int32)

    x1 = xyz1_ref[0]                                       # [n, 3]
    x2 = xyz2_ref[0]                                       # [m, 3]
    sq1 = jnp.sum(x1 * x1, axis=1, keepdims=True)          # [n, 1]
    sq2 = jnp.sum(x2 * x2, axis=1, keepdims=True)          # [m, 1]

    # The base value matrix 3 - |x1 - x2| is constant across iterations;
    # cache it in VMEM ONCE (4 MB at [1024, 1024]) — recomputing it per
    # iteration (matmul + d2 + a 1M-element sqrt, ~6 VPU passes) was ~40%
    # of the iteration cost.
    cross = jax.lax.dot_general(
        x1, x2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [n, m]
    d2 = jnp.maximum(sq1 + jnp.transpose(sq2) - 2.0 * cross, 0.0)
    base_ref[...] = 3.0 - jnp.sqrt(d2)

    def body(it, _):
        value = base_ref[...] - price_ref[...]              # [n, m]
        m1 = jnp.max(value, axis=1, keepdims=True)          # [n, 1]
        # min lane index among exact-max entries == argmax's
        # first-occurrence tie rule, but Mosaic lowers max +
        # equality-select + min faster than its argmax reduction (same
        # finding as fps_pallas.py).
        idx1 = jnp.min(jnp.where(value == m1, colio, jnp.int32(2 ** 30)),
                       axis=1, keepdims=True)
        sel = colio == idx1                                 # [n, m]
        m2 = jnp.max(jnp.where(sel, _NEG_BIG, value), axis=1,
                     keepdims=True)
        unass = assign_ref[...] < 0                         # [n, 1]
        bid = m1 - m2 + eps

        bidmat = jnp.where(sel & unass, bid, _NEG_BIG)
        colmax = jnp.max(bidmat, axis=0, keepdims=True)     # [1, m]
        colwin = jnp.min(jnp.where(bidmat == colmax, rowio,
                                   jnp.int32(2 ** 30)),
                         axis=0, keepdims=True)
        got = colmax > _NEG_BIG / 2

        # `won`/`displaced` are row-gathers of the column state at each
        # row's bid / owned column. Lane-dynamic gathers are not
        # expressible in Mosaic and full [n, m] reduce sweeps are the
        # VPU bottleneck (two sweeps ~21% of kernel time measured); an
        # exact one-hot bf16 MXU matmul does both in one tiny op. colwin
        # is split (hi, lo) = (>>5, &31) so each gathered value is < 32
        # (bf16-exact; exact up to n = 8192).
        hi = jnp.transpose((colwin >> 5).astype(jnp.bfloat16))   # [m, 1]
        lo = jnp.transpose((colwin & 31).astype(jnp.bfloat16))   # [m, 1]
        gotf = jnp.transpose(got.astype(jnp.bfloat16))           # [m, 1]
        rhs = jnp.concatenate([hi, lo, gotf], axis=1)            # [m, 3]
        sel_bid = (sel & unass).astype(jnp.bfloat16)             # [n, m]
        sel_own = (colio == assign_ref[...]).astype(jnp.bfloat16)
        gath_b = _onehot_dot(sel_bid, rhs, interp)               # [n, 3]
        gath_o = _onehot_dot(sel_own, rhs, interp)
        win_at_bid = (gath_b[:, 0:1] * 32.0
                      + gath_b[:, 1:2]).astype(jnp.int32)
        won = unass & (gath_b[:, 2:3] > 0.5) & (win_at_bid == rowcol)
        displaced = gath_o[:, 2:3] > 0.5       # my owned column was rebid

        new_assign = jnp.where(won, idx1,
                               jnp.where(displaced, -1, assign_ref[...]))
        # last iteration: every unassigned bidder force-assigns and NOTHING
        # is displaced (cuda Assign's `!last` guard, emd_cuda.cu:205)
        is_last = it == iters - 1
        last_assign = jnp.where(unass, idx1, assign_ref[...])
        assign_ref[...] = jnp.where(is_last, last_assign, new_assign)
        inv_ref[...] = jnp.where(got, colwin, inv_ref[...])
        price_ref[...] = price_ref[...] + jnp.where(got, colmax, 0.0)
        return 0

    jax.lax.fori_loop(0, iters, body, 0)

    # squared distance to the matched point: gather x2 rows via a tiny
    # one-hot matmul (lane-dynamic gathers are not expressible in Mosaic)
    sel = (colio == assign_ref[...]).astype(jnp.float32)    # [n, m]
    x2_sel = jax.lax.dot_general(
        sel, x2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [n, 3]
    diff = x1 - x2_sel
    dist_out_ref[0] = jnp.sum(diff * diff, axis=1, keepdims=True)
    assign_out_ref[0] = assign_ref[...]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def emd_auction_pallas(xyz1: jax.Array, xyz2: jax.Array,
                       eps: float = 0.005, iters: int = 50,
                       interpret: bool = False):
    """Auction matching: [B, n, 3] x [B, m, 3] -> (dist [B, n], assign)."""
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]

    kernel = functools.partial(_auction_kernel, eps=eps, iters=iters,
                               n=n, m=m, interp=interpret)
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
            pltpu.VMEM((1, m), jnp.float32),   # price
            pltpu.VMEM((1, m), jnp.int32),     # assignment_inv
            pltpu.VMEM((n, 1), jnp.int32),     # assignment
            pltpu.VMEM((n, m), jnp.float32),   # cached base value matrix
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32))
    return dist[..., 0], assign[..., 0]
