"""Execute the REFERENCE upsampler (torch-cpu) over a fixture input dir.

Produces the reference's own .xyz outputs for the 127-fixture side-by-side
(VERDICT round-3 item 2): the same `modules/discrete/upsample.py` chain —
`PatchHelper.upsample` + `remove_outliers` — driven with the shims from
tests/test_pipeline_parity.py, over the same inputs our CLI consumes.
Reference anchors: modules/discrete/upsample.py:20-57,
modules/utils/patch.py (PatchHelper).

usage: python scripts/run_reference_upsample.py <workdir> [n_add]
  reads  <workdir>/input/*.xyz
  writes <workdir>/pred_ref/*.xyz   (N*4 + n_add points each, default 24)

Resumable: skips outputs that already exist (delete pred_ref to redo).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    work = sys.argv[1]
    n_add = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    sys.path.insert(0, "tests")
    sys.path.insert(0, "scripts")
    import torch
    from test_pipeline_parity import CKPT, REFERENCE, _install_shims

    _install_shims()
    sys.path.insert(0, REFERENCE)
    import modules.utils.probs as probs

    orig = probs.GaussianDistribution.__init__

    def cpu_init(self, pc_channel, mu, vars, temperature=1.0, device="cpu"):
        orig(self, pc_channel, mu, vars, temperature, device="cpu")

    probs.GaussianDistribution.__init__ = cpu_init
    from modules.discrete.interpflow import PointInterpFlow
    from modules.utils.patch import PatchHelper

    net = PointInterpFlow(3)
    net.load_state_dict(torch.load(CKPT, map_location="cpu"))
    net.set_to_initialized_state()
    net.eval()
    helper = PatchHelper(256, patch_expand_ratio=4)

    src = os.path.join(work, "input")
    dst = os.path.join(work, "pred_ref")
    os.makedirs(dst, exist_ok=True)
    files = sorted(f for f in os.listdir(src) if f.endswith(".xyz"))
    print(f"{len(files)} inputs -> {dst}", flush=True)
    for i, f in enumerate(files):
        out_path = os.path.join(dst, f)
        if os.path.exists(out_path):
            continue
        pts = np.loadtxt(os.path.join(src, f), dtype=np.float32)
        t0 = time.time()
        with torch.no_grad():
            up = helper.upsample(net, torch.from_numpy(pts)[None],
                                 npoint=pts.shape[0] * 4 + n_add, upratio=4)
            up = PatchHelper.remove_outliers(
                up, torch.from_numpy(pts)[None], n_add).numpy()[0]
        np.savetxt(out_path, up, fmt="%.6f")
        print(f"[{i + 1}/{len(files)}] {f}: {up.shape[0]} pts "
              f"in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
