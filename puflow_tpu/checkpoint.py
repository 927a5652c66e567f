"""Checkpoint save/load: native single-file .npz and reference .pt formats.

Native format: one ``.npz`` holding the (params, state) pytrees flattened to
``params/flow_blocks/0/actnorm/logs``-style keys — self-describing, portable,
no pickle. Reference torch ``.pt`` state_dicts are converted transparently on
load (see `puflow_tpu.convert.torch_ckpt`).
"""

from __future__ import annotations

import numpy as np


def _flatten(prefix: str, tree, out: dict):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_checkpoint(path: str, params, state) -> None:
    flat = {}
    _flatten("params", params, flat)
    _flatten("state", state, flat)
    np.savez(path, **flat)


def load_npz_checkpoint(path: str):
    with np.load(path) as data:
        tree = _unflatten({k: data[k] for k in data.files})
    return tree["params"], tree["state"]


# --------------------------------------------------------------------------
# Model-aware loading (CLI entry)
# --------------------------------------------------------------------------
def _discrete_sample_fn(model_params, patches, upratio):
    from puflow_tpu.models import discrete

    params, state = model_params
    return discrete.sample(params, state, patches, upratio)


def _cnf_sample_fn(model_params, patches, upratio):
    from puflow_tpu.models import continuous

    params, state = model_params
    return continuous.sample(params, state, patches, upratio)


def load_checkpoint(path: str, model: str = "discrete", fold: bool = False):
    """Load any supported checkpoint -> (params, state, sample_fn).

    ``sample_fn(model_params=(params, state), patches [M, k, 3], upratio)``
    is a module-level (hashable) jittable callable for `upsample_cloud`.
    ``fold=True`` folds eval-mode BatchNorm into the convs (inference only —
    do NOT fold parameters that will be trained further).
    """
    if path.endswith(".npz"):
        params, state = load_npz_checkpoint(path)
    elif path.endswith((".pt", ".ckpt")):
        if model == "discrete":
            from puflow_tpu.convert.torch_ckpt import load_discrete_checkpoint

            params, state = load_discrete_checkpoint(path)
        else:
            from puflow_tpu.convert.torch_ckpt import load_cnf_checkpoint

            params, state = load_cnf_checkpoint(path)
    else:
        raise ValueError(f"unrecognised checkpoint format: {path}")

    if fold:
        from puflow_tpu.models.fold_bn import fold_bn_inference

        params = fold_bn_inference(params, state)
    sample_fn = (_discrete_sample_fn if model == "discrete"
                 else _cnf_sample_fn)
    return params, state, sample_fn
