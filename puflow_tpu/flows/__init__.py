"""Invertible flow primitives as pure functions over parameter pytrees.

Every layer exposes `*_init(key, ...) -> params`, `*_forward(params, x, ...)
-> (y, logdet)` and `*_inverse(params, z, ...) -> (x, logdet)`. No mutable
state: data-dependent ActNorm initialisation is a separate pure function run
once outside jit (`actnorm_init_from_data`), after which parameters are plain
arrays — replacing the reference's `is_inited` mutable-flag pattern
(`modules/flows/normalize.py:28-32`).
"""

from puflow_tpu.flows.normalize import (
    actnorm_init,
    actnorm_init_from_data,
    actnorm_forward,
    actnorm_inverse,
)
from puflow_tpu.flows.permutate import (
    inv1x1_init,
    inv1x1_forward,
    inv1x1_inverse,
    reverse_permute,
)
from puflow_tpu.flows.coupling import (
    linear_a1d_init,
    linear_a1d_apply,
    additive_coupling_forward,
    additive_coupling_inverse,
    affine_coupling_forward,
    affine_coupling_inverse,
    affine_injector_forward,
    affine_injector_inverse,
)
from puflow_tpu.flows.prior import standard_gaussian_logp, standard_gaussian_sample
