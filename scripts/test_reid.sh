#!/usr/bin/env bash
# Epoch-sweep testing (rebuild of /root/reference/scripts/test_reid.sh):
# evaluates model_epoch{1,11,21,...}.pkl snapshots in OUTPUT_DIR.
#   ./scripts/test_reid.sh --cfg <yaml> OUTPUT_DIR <dir> [MAX_EPOCH]
set -u

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"

OUTPUT_DIR="."
args=("$@")
for i in "${!args[@]}"; do
  if [[ "${args[$i]}" == "OUTPUT_DIR" ]]; then
    OUTPUT_DIR="${args[$((i+1))]}"
  fi
done

MAX_EPOCH="${MAX_EPOCH:-180}"
LOG="${OUTPUT_DIR}/test_$(date +'%Y-%m-%d_%H-%M-%S').log"
echo "Logging to ${LOG}"
{
  for ep in $(seq 1 10 "${MAX_EPOCH}"); do
    ckpt="${OUTPUT_DIR}/model_epoch${ep}.pkl"
    if [[ -f "${ckpt}" ]]; then
      echo "=== Testing ${ckpt} ==="
      python tools/test_net.py "$@" TEST.WEIGHTS "${ckpt}"
    fi
  done
} 2>&1 | tee "${LOG}"
