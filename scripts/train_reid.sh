#!/usr/bin/env bash
# Train + test wrapper (rebuild of /root/reference/scripts/train_reid.sh):
# tees all output to a timestamped log under OUTPUT_DIR and plots
# loss-vs-mAP afterwards.
#   ./scripts/train_reid.sh --cfg configs/market1501/pps_crm_triplet_R-50_1x.yaml OUTPUT_DIR <dir>
set -u

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${ROOT}"

# find OUTPUT_DIR value in the args for the log location
OUTPUT_DIR="."
args=("$@")
for i in "${!args[@]}"; do
  if [[ "${args[$i]}" == "OUTPUT_DIR" ]]; then
    OUTPUT_DIR="${args[$((i+1))]}"
  fi
done
mkdir -p "${OUTPUT_DIR}"

LOG="${OUTPUT_DIR}/train_$(date +'%Y-%m-%d_%H-%M-%S').log"
echo "Logging to ${LOG}"
{
  echo "git status:"; git log --oneline -1 2>/dev/null || true
  python tools/train_net.py "$@"
  python tools/loss_vs_map.py --output-dir "${OUTPUT_DIR}" || true
} 2>&1 | tee "${LOG}"
