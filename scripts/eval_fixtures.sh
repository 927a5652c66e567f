#!/usr/bin/env bash
# Full-protocol smoke evaluation on synthetic fixtures:
#   generate meshes + clouds -> upsample x4 with a checkpoint -> p2f ->
#   evaluate.csv. Mirrors the PU1K eval chain end to end without the
#   unpublished dataset downloads.
#
# usage: scripts/eval_fixtures.sh [checkpoint] [workdir]
set -euo pipefail

CKPT=${1:-/root/reference/pretrain/puflow-x4-pu1k.pt}
WORK=${2:-/tmp/puflow_fixture_eval}

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"

python scripts/make_fixtures.py "$WORK"
python -m puflow_tpu.cli.upsample --source "$WORK/input" \
    --target "$WORK/pred" --checkpoint "$CKPT" --up_ratio 4
scripts/eval_pu1k.sh "$WORK/mesh" "$WORK/pred" "$WORK/gt" "$WORK/results"
cat "$WORK/results/evaluation.csv"
