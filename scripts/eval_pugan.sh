#!/usr/bin/env bash
# PU-GAN evaluation driver — parity with reference `evaluation/eval_pugan.sh`:
# run the native point-to-mesh tool per (mesh, prediction) pair, then the
# metrics CLI over the whole set.
#
# usage: scripts/eval_pugan.sh <mesh_dir(.off)> <pred_dir(.xyz)> <gt_dir(.xyz)> <save_dir>
set -euo pipefail

MESH_DIR=${1:?mesh dir}
PRED_DIR=${2:?pred dir}
GT_DIR=${3:?gt dir}
SAVE=${4:?save dir}

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
make -C "$ROOT/native/p2f" >/dev/null

for pred in "$PRED_DIR"/*.xyz; do
    name=$(basename "$pred" .xyz)
    mesh="$MESH_DIR/$name.off"
    if [[ -f "$mesh" ]]; then
        "$ROOT/native/p2f/p2f" "$mesh" "$pred" --uniform
    else
        echo "warn: no mesh for $name, skipping p2f" >&2
    fi
done

python -m puflow_tpu.cli.evaluate --pred "$PRED_DIR" --gt "$GT_DIR" \
    --save_path "$SAVE"
