"""Paired protocol-scale comparison: OUR pipeline vs the EXECUTED torch
reference, from two evaluation.csv files produced by the same eval chain
over the same fixture set (VERDICT round-3 item 2).

usage: python scripts/compare_sidebyside.py <ours.csv> <ref.csv> [rel_tol]

Prints a paired aggregate table and exits non-zero if any aggregate
metric of ours is worse than the reference's by more than rel_tol
(default 0.02 = 2%: looser than the 1% paper gate to absorb
cross-framework fp noise, but two-sided and protocol-scale — reference
anchor: evaluation/evaluate.py:214-289, README.md paper tables).
"""

from __future__ import annotations

import csv
import math
import sys


def load_agg(path):
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    # the aggregate row mirrors the reference's nanmean convention and is
    # the last row (name field empty or 'mean')
    agg = rows[-1]
    out = {}
    for k, v in agg.items():
        try:
            out[k] = float(v)
        except (TypeError, ValueError):
            pass
    return out, len(rows) - 1


def main():
    ours_csv, ref_csv = sys.argv[1], sys.argv[2]
    rel_tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
    ours, n_ours = load_agg(ours_csv)
    ref, n_ref = load_agg(ref_csv)
    print(f"ours: {n_ours} files, ref: {n_ref} files")
    keys = [k for k in ours if k in ref
            and not math.isnan(ours[k]) and not math.isnan(ref[k])]
    bad = []
    print(f"{'metric':>14s} {'ours':>12s} {'reference':>12s} {'ours/ref':>9s}")
    for k in keys:
        ratio = ours[k] / ref[k] if ref[k] else float("inf")
        flag = ""
        # every metric in this CSV is lower-is-better
        if ours[k] > ref[k] * (1 + rel_tol):
            flag = "  <-- WORSE beyond tolerance"
            bad.append(k)
        print(f"{k:>14s} {ours[k]:12.6g} {ref[k]:12.6g} {ratio:9.3f}{flag}")
    if bad:
        print(f"FAIL: {bad} exceed rel_tol={rel_tol}")
        sys.exit(1)
    print(f"PASS: all aggregate metrics within {rel_tol:.0%} of the "
          f"executed reference (or better)")


if __name__ == "__main__":
    main()
