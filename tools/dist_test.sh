#!/usr/bin/env bash
# Multi-host eval launcher; see dist_train.sh for the env contract.
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2 || true
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
