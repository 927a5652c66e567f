#!/usr/bin/env bash
# Full-protocol smoke evaluation on synthetic fixtures:
#   generate meshes + clouds -> upsample x4 with a checkpoint -> p2f ->
#   evaluate.csv. Mirrors the PU1K eval chain end to end without the
#   unpublished dataset downloads.
#
# usage: scripts/eval_fixtures.sh [checkpoint] [workdir] [n_shapes] [n_input] [n_gt]
#   n_shapes=127 runs the full PU1K-protocol-scale dress rehearsal
#   (127 meshes, matching reference `evaluation/eval_pu1k.sh`'s file count).
#   n_input/n_gt default to the PU1K protocol (2048 -> 8192); pass 5000
#   20000 with the pugan checkpoint for the PU-GAN protocol shapes
#   (reference evaluation/eval_pugan.sh: 27 meshes, 5000 -> 20000).
set -euo pipefail

CKPT=${1:-/root/reference/pretrain/puflow-x4-pu1k.pt}
WORK=${2:-/tmp/puflow_fixture_eval}
N_SHAPES=${3:-2}
N_INPUT=${4:-2048}
N_GT=${5:-8192}

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"

T0=$(date +%s)
python scripts/make_fixtures.py "$WORK" "$N_SHAPES" "$N_INPUT" "$N_GT"
BATCH=$(( N_SHAPES < 16 ? N_SHAPES : 16 ))
python -m puflow_tpu.cli.upsample --source "$WORK/input" \
    --target "$WORK/pred" --checkpoint "$CKPT" --up_ratio 4 \
    --batch "$BATCH" \
    2> >(tee "$WORK/upsample.stderr" >&2)
# fused-path fallbacks log a one-line warning; the protocol run must not
# silently drop to the slow path (puflow_tpu.dispatch logger)
if grep -q "using the XLA fallback" "$WORK/upsample.stderr"; then
    echo "ERROR: fused-kernel fallback fired during the protocol run" >&2
    exit 1
fi
scripts/eval_pu1k.sh "$WORK/mesh" "$WORK/pred" "$WORK/gt" "$WORK/results"
echo "wall-clock: $(( $(date +%s) - T0 ))s for $N_SHAPES shapes"
head -3 "$WORK/results/evaluation.csv"
tail -2 "$WORK/results/evaluation.csv"
