"""Driver for the native point-to-mesh distance tool (native/p2f).

Mirrors the reference eval flow (`evaluation/eval_pu1k.sh`): run the binary
once per (mesh, prediction) pair before `puflow_tpu.cli.evaluate`, which then
picks up the `<pred>_point2mesh_distance.xyz` side files.
"""

from __future__ import annotations

import os
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
P2F_BIN = os.path.join(_ROOT, "native", "p2f", "p2f")


def ensure_built() -> str:
    """Build the tool if the binary is missing; returns its path."""
    if not os.path.exists(P2F_BIN):
        subprocess.run(["make", "-C", os.path.dirname(P2F_BIN)], check=True,
                       capture_output=True)
    return P2F_BIN


def run_p2f(mesh_off: str, pred_xyz: str, n_threads: int | None = None,
            uniform: bool = False, seed: int = 2021, samples: int = 1000):
    """Compute point-to-mesh distances; writes the side file, returns
    (mean, std) parsed from the tool's stdout.

    With ``uniform=True`` the tool also emits the disk-density side-files
    (`_disk_idx.txt`, `_radius.txt`, `_point2mesh_distance.txt`) that the
    uniformity metric consumes — the reference's equivalent code path is
    dead (`evaluation.cpp:74-114` never called from its main)."""
    cmd = [ensure_built(), mesh_off, pred_xyz]
    if n_threads:
        cmd.append(str(n_threads))
    if uniform:
        cmd += ["--uniform", "--seed", str(seed), "--samples", str(samples)]
    out = subprocess.run(cmd, check=True, capture_output=True,
                         text=True).stdout
    vals = {}
    for line in out.splitlines():
        if ":" in line:
            k, v = line.split(":")
            vals[k.strip()] = float(v)
    return vals.get("p2f avg"), vals.get("p2f std")
