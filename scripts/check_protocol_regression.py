"""Protocol-scale quality regression fence (VERDICT r3 item 3).

Compares a fresh 127-fixture aggregate row (`evaluation.csv` from
`scripts/eval_fixtures.sh <ckpt> <dir> 127`) against the checked-in
expected aggregate for the SHIPPED pipeline config
(`artifacts/protocol_expected_r4.json`). The round-3d strided-merge
episode proved single-cloud CD gates do not catch uniformity collapse —
this fence fails if any aggregate metric drifts beyond tolerance.

usage:
  python scripts/check_protocol_regression.py <results_dir>/evaluation.csv
  python scripts/check_protocol_regression.py --update <csv>   # rebaseline
"""

from __future__ import annotations

import csv
import json
import math
import os
import sys

EXPECTED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "protocol_expected_r4.json")
# metric -> allowed relative increase vs the recorded baseline.
# Round-5 derivation: the r4 vs r5 SAME-CONFIG runs measured the cross-run
# spread at CD 4.1%, JSD 3.1%, EMD 1.1%, hausdorff 1.0%, p2f <1%,
# uniformity <1% (artifacts/protocol_expected_r4.json keeps both rows);
# tolerances sit at ~2x the observed spread — smaller than every drift
# they guard against (the round-4b seeded-merge regression was CD +20%,
# uniformity +100%), unlike the r4 fence whose 10-25% allowances exceeded
# the 0.3-4.3% gap to the reference (VERDICT r4 weak #6).
TOLERANCE = {
    "CD": 0.08, "EMD": 0.05, "hausdorff": 0.06,
    "p2f avg": 0.05, "p2f std": 0.08,
    "JSD": 0.07,
    "uniform_0": 0.10, "uniform_1": 0.10, "uniform_2": 0.10,
    "uniform_3": 0.10, "uniform_4": 0.10,
}


def load_agg(path):
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    agg = rows[-1]
    return {k: float(v) for k, v in agg.items()
            if k != "name" and v not in ("", None)}, len(rows) - 1


def main():
    args = [a for a in sys.argv[1:] if a != "--update"]
    update = "--update" in sys.argv
    agg, n = load_agg(args[0])
    if update:
        with open(EXPECTED, "w") as fh:
            json.dump({"n_files": n, "aggregate": agg}, fh, indent=1)
        print(f"baseline updated from {args[0]} ({n} files)")
        return
    want = json.load(open(EXPECTED))
    exp = want["aggregate"]
    if n != want["n_files"]:
        print(f"FAIL: file count {n} != baseline {want['n_files']}")
        sys.exit(1)
    bad = []
    print(f"{'metric':>12s} {'now':>12s} {'baseline':>12s} {'ratio':>7s}")
    for k, tol in TOLERANCE.items():
        if k not in agg or k not in exp or math.isnan(exp[k]):
            continue
        if math.isnan(agg[k]):
            # a NaN metric in the fresh run is a broken eval, not a pass
            flag = "  <-- NaN in fresh aggregate"
            bad.append(k)
            print(f"{k:>12s} {'nan':>12s} {exp[k]:12.6g} {'':>7s}{flag}")
            continue
        ratio = agg[k] / exp[k] if exp[k] else float("inf")
        flag = ""
        if agg[k] > exp[k] * (1 + tol):
            flag = f"  <-- REGRESSION (tol +{tol:.0%})"
            bad.append(k)
        print(f"{k:>12s} {agg[k]:12.6g} {exp[k]:12.6g} {ratio:7.3f}{flag}")
    if bad:
        print(f"FAIL: {bad}")
        sys.exit(1)
    print("PASS: aggregate within tolerance of the recorded baseline")


if __name__ == "__main__":
    main()
