#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh used
# torch.distributed.run; JAX uses one process per HOST, with all local
# TPU chips driven by that process).
#
# Single host (all local chips):            bash tools/dist_train.sh CFG
# Multi host (run on every host):
#   COORDINATOR_ADDRESS=host0:1234 NUM_PROCESSES=4 PROCESS_ID=<rank> \
#       bash tools/dist_train.sh CFG [extra args]
set -euo pipefail
CONFIG=$1
shift || true
if [[ -n "${COORDINATOR_ADDRESS:-}" ]]; then
  exec python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
else
  exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
fi
