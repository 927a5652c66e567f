"""Monotone piecewise spline transforms with analytic inverses and log-dets.

Parity targets: reference `modules/flows/spline/` —
  * `rational_quadratic_spline` (`quadratic_rational.py:12-131`, Durkan et
    al. neural spline flows),
  * `rational_linear_spline` (`linear_rational.py:48-142`, Dolatabadi et al.
    with learned lambdas),
  * `cubic_spline` (`cubic.py:15-208`, Blinn-style cubic root solving).

All transforms: identity linear tails outside [-tail_bound, tail_bound],
softmax-normalised bin widths/heights with minimum sizes, jit-safe (mask
selects, no boolean indexing).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations, inputs, eps: float = 1e-6):
    """Index of the bin containing each input (reference
    `spline/__init__.py:4-10`)."""
    locs = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= locs, axis=-1) - 1


def _cbrt(x):
    return jnp.sign(x) * jnp.exp(jnp.log(jnp.abs(x) + 1e-38) / 3.0)


def _normalise_bins(unnormalized, num_bins, min_size, left, right):
    """softmax bins -> (cum_edges [..., n+1], sizes [..., n])."""
    w = jax.nn.softmax(unnormalized, axis=-1)
    w = min_size + (1 - min_size * num_bins) * w
    cum = jnp.cumsum(w, axis=-1)
    cum = jnp.pad(cum, [(0, 0)] * (cum.ndim - 1) + [(1, 0)])
    cum = (right - left) * cum + left
    cum = cum.at[..., 0].set(left)
    cum = cum.at[..., -1].set(right)
    return cum, cum[..., 1:] - cum[..., :-1]


def _take(arr, idx):
    return jnp.take_along_axis(arr, idx[..., None], axis=-1)[..., 0]


def rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse: bool, tails: str = "linear",
        tail_bound: float = 5.0, num_bins: int = 64,
        min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
        min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
        min_derivative: float = DEFAULT_MIN_DERIVATIVE):
    """Monotone RQ spline. Shapes: inputs [...], params [..., num_bins(+1)].

    `unnormalized_derivatives` carries num_bins - 1 interior values for
    'linear' tails (padded with the boundary constant, reference `:23-27`).
    """
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    const = math.log(math.expm1(1 - min_derivative))
    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad,
                                       constant_values=const)

    left, right = -tail_bound, tail_bound
    cumwidths, widths = _normalise_bins(unnormalized_widths, num_bins,
                                        min_bin_width, left, right)
    cumheights, heights = _normalise_bins(unnormalized_heights, num_bins,
                                          min_bin_height, left, right)
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    x = jnp.clip(inputs, left, right)  # masked-out lanes stay well-defined
    bin_idx = jnp.clip(
        _searchsorted(cumheights if inverse else cumwidths, x),
        0, num_bins - 1)

    in_cw = _take(cumwidths, bin_idx)
    in_w = _take(widths, bin_idx)
    in_ch = _take(cumheights, bin_idx)
    in_h = _take(heights, bin_idx)
    delta = _take(heights / widths, bin_idx)
    d0 = _take(derivatives, bin_idx)
    d1 = _take(derivatives[..., 1:], bin_idx)
    s = d0 + d1 - 2 * delta

    if inverse:
        y_rel = x - in_ch
        a = y_rel * s + in_h * (delta - d0)
        b = in_h * d0 - y_rel * s
        c = -delta * y_rel
        disc = jnp.abs(b * b - 4 * a * c)
        root = (2 * c) / (-b - jnp.sqrt(disc))
        theta = root
        out = root * in_w + in_cw
        sign = -1.0
    else:
        theta = (x - in_cw) / in_w
        t1m = theta * (1 - theta)
        out = in_ch + (in_h * (delta * theta**2 + d0 * t1m)) / (delta + s * t1m)
        sign = 1.0

    t1m = theta * (1 - theta)
    denom = delta + s * t1m
    deriv_num = delta**2 * (d1 * theta**2 + 2 * delta * t1m
                            + d0 * (1 - theta) ** 2)
    logabsdet = sign * (jnp.log(deriv_num) - 2 * jnp.log(denom))

    out = jnp.where(inside, out, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return out, logabsdet


def rational_linear_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, unnormalized_lambdas, inverse: bool,
        tails: str = "linear", tail_bound: float = 5.0, num_bins: int = 64,
        min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
        min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
        min_derivative: float = DEFAULT_MIN_DERIVATIVE):
    """Monotone rational-linear spline with learned lambda vertex."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    const = math.log(math.expm1(1 - min_derivative))
    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad,
                                       constant_values=const)

    left, right = -tail_bound, tail_bound
    cumwidths, widths = _normalise_bins(unnormalized_widths, num_bins,
                                        min_bin_width, left, right)
    cumheights, heights = _normalise_bins(unnormalized_heights, num_bins,
                                          min_bin_height, left, right)
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    x = jnp.clip(inputs, left, right)
    bin_idx = jnp.clip(
        _searchsorted(cumheights if inverse else cumwidths, x),
        0, num_bins - 1)

    in_cw = _take(cumwidths, bin_idx)
    in_w = _take(widths, bin_idx)
    in_ch = _take(cumheights, bin_idx)
    in_h = _take(heights, bin_idx)
    delta = _take(heights / widths, bin_idx)
    d0 = _take(derivatives, bin_idx)
    d1 = _take(derivatives[..., 1:], bin_idx)
    lam = _take(0.95 * jax.nn.sigmoid(unnormalized_lambdas) + 0.025, bin_idx)

    wa = 1.0
    wb = jnp.sqrt(d0 / d1) * wa
    wc = (lam * wa * d0 + (1 - lam) * wb * d1) / delta
    ya = in_ch
    yb = in_h + in_ch
    yc = ((1 - lam) * wa * ya + lam * wb * yb) / ((1 - lam) * wa + lam * wb)

    if inverse:
        low = x <= yc
        numerator = jnp.where(low, lam * wa * (ya - x),
                              (wc - lam * wb) * x + lam * wb * yb - wc * yc)
        denominator = jnp.where(low, (wc - wa) * x + wa * ya - wc * yc,
                                (wc - wb) * x + wb * yb - wc * yc)
        theta = numerator / denominator
        out = theta * in_w + in_cw
        deriv_num = jnp.where(low, wa * wc * lam * (yc - ya),
                              wb * wc * (1 - lam) * (yb - yc)) * in_w
    else:
        theta = (x - in_cw) / in_w
        low = theta <= lam
        numerator = jnp.where(low, wa * ya * (lam - theta) + wc * yc * theta,
                              wc * yc * (1 - theta) + wb * yb * (theta - lam))
        denominator = jnp.where(low, wa * (lam - theta) + wc * theta,
                                wc * (1 - theta) + wb * (theta - lam))
        out = numerator / denominator
        deriv_num = jnp.where(low, wa * wc * lam * (yc - ya),
                              wb * wc * (1 - lam) * (yb - yc)) / in_w

    logabsdet = jnp.log(deriv_num) - 2 * jnp.log(jnp.abs(denominator))
    out = jnp.where(inside, out, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return out, logabsdet


def cubic_spline(inputs, unnormalized_widths, unnormalized_heights,
                 unnorm_derivatives_left, unnorm_derivatives_right,
                 inverse: bool, tails: str = "linear",
                 tail_bound: float = 5.0, num_bins: int = 64,
                 min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
                 min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
                 eps: float = 1e-5, quadratic_threshold: float = 1e-3):
    """Monotone cubic spline (Steffen construction, Blinn root solving)."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    left = bottom = -tail_bound
    right = top = tail_bound

    x = jnp.clip(inputs, left, right)
    x01 = (x - (bottom if inverse else left)) / (top - bottom)

    w = jax.nn.softmax(unnormalized_widths, axis=-1)
    w = min_bin_width + (1 - min_bin_width * num_bins) * w
    cumw = jnp.cumsum(w, axis=-1).at[..., -1].set(1.0)
    cumw = jnp.pad(cumw, [(0, 0)] * (cumw.ndim - 1) + [(1, 0)])

    h = jax.nn.softmax(unnormalized_heights, axis=-1)
    h = min_bin_height + (1 - min_bin_height * num_bins) * h
    cumh = jnp.cumsum(h, axis=-1).at[..., -1].set(1.0)
    cumh = jnp.pad(cumh, [(0, 0)] * (cumh.ndim - 1) + [(1, 0)])

    widths = cumw[..., 1:] - cumw[..., :-1]
    slopes = (cumh[..., 1:] - cumh[..., :-1]) / widths
    min1 = jnp.minimum(jnp.abs(slopes[..., :-1]), jnp.abs(slopes[..., 1:]))
    min2 = (0.5 * (widths[..., 1:] * slopes[..., :-1]
                   + widths[..., :-1] * slopes[..., 1:])
            / (widths[..., :-1] + widths[..., 1:]))
    interior = jnp.minimum(min1, min2) * (
        jnp.sign(slopes[..., :-1]) + jnp.sign(slopes[..., 1:]))
    d_left = jax.nn.sigmoid(unnorm_derivatives_left) * 3 * slopes[..., :1]
    d_right = jax.nn.sigmoid(unnorm_derivatives_right) * 3 * slopes[..., -1:]
    derivs = jnp.concatenate([d_left, interior, d_right], axis=-1)

    a = (derivs[..., :-1] + derivs[..., 1:] - 2 * slopes) / widths**2
    b = (3 * slopes - 2 * derivs[..., :-1] - derivs[..., 1:]) / widths
    c = derivs[..., :-1]
    d = cumh[..., :-1]

    bin_idx = jnp.clip(_searchsorted(cumh if inverse else cumw, x01),
                       0, num_bins - 1)
    ia, ib, ic, idd = (_take(v, bin_idx) for v in (a, b, c, d))
    lcw = _take(cumw, bin_idx)
    rcw = _take(cumw[..., 1:], bin_idx)

    if inverse:
        # depressed cubic + Blinn root selection
        b_ = (ib / ia) / 3.0
        c_ = (ic / ia) / 3.0
        d_ = (idd - x01) / ia
        delta1 = -b_**2 + c_
        delta2 = -c_ * b_ + d_
        delta3 = b_ * d_ - c_**2
        disc = 4.0 * delta1 * delta3 - delta2**2
        dep1 = -2.0 * b_ * delta1 + delta2
        dep2 = delta1

        # one real root (disc < 0)
        sq = jnp.sqrt(jnp.maximum(-disc, 0.0))
        p = _cbrt((-dep1 + sq) / 2.0)
        q = _cbrt((-dep1 - sq) / 2.0)
        one_root = (p + q) - b_ + lcw

        # three real roots (disc >= 0)
        theta3 = jnp.arctan2(jnp.sqrt(jnp.maximum(disc, 0.0)), -dep1) / 3.0
        cr1, cr2 = jnp.cos(theta3), jnp.sin(theta3)
        scale = 2 * jnp.sqrt(jnp.maximum(-dep2, 0.0))
        shift = -b_ + lcw
        r1 = cr1 * scale + shift
        r2 = (-0.5 * cr1 - 0.5 * math.sqrt(3) * cr2) * scale + shift
        r3 = (-0.5 * cr1 + 0.5 * math.sqrt(3) * cr2) * scale + shift

        def in_bin(r):
            return ((lcw - eps) < r) & (r < (rcw + eps))

        three_root = jnp.where(in_bin(r1), r1,
                               jnp.where(in_bin(r2), r2, r3))
        out01 = jnp.where(disc < 0, one_root, three_root)

        # nearly-quadratic bins
        qa, qb, qc = ib, ic, idd - x01
        quad = (-qb + jnp.sqrt(jnp.maximum(qb**2 - 4 * qa * qc, 0.0))) / (
            2 * qa)
        out01 = jnp.where(jnp.abs(ia) < quadratic_threshold, quad + lcw,
                          out01)

        shifted = out01 - lcw
        logabsdet = -jnp.log(3 * ia * shifted**2 + 2 * ib * shifted + ic)
        out = out01 * (right - left) + left
        logabsdet = logabsdet - math.log(top - bottom) + math.log(
            right - left)
    else:
        shifted = x01 - lcw
        out01 = ia * shifted**3 + ib * shifted**2 + ic * shifted + idd
        logabsdet = jnp.log(3 * ia * shifted**2 + 2 * ib * shifted + ic)
        out = out01 * (top - bottom) + bottom
        logabsdet = logabsdet + math.log(top - bottom) - math.log(
            right - left)

    out = jnp.where(inside, out, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return out, logabsdet
