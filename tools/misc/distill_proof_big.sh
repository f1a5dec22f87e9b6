#!/usr/bin/env bash
# Big-tier token-branch distillation proof chain (ROADMAP
# "Token-branch distillation", VERDICT r4 missing #2).
#
# Runs the four regimes sequentially on the one TPU chip:
#   1. two-stage stage 1  (decoder-only + EMA)        -> converge_big_s1
#   2. two-stage stage 2  (balanced distill, 0.6x lr) -> converge_big_s2
#   3. token-only control (capacity ceiling)          -> converge_big_token_only
#   4. onestage balanced-distill control              -> converge_big_onestage
#
# latest_interval=25 throttles the full-opt-state crash-recovery
# checkpoint: on this 1-core host its serialization (~40 s) dominates
# the 6 s epochs.  det_best + the final latest still always save.
set -u
cd "$(dirname "$0")/../.."

if [ ! -f /tmp/synth_converge_big/instances.json ]; then
  python tools/make_synth_data.py --root /tmp/synth_converge_big \
      --n-train 512 --n-val 64
fi

OPTS="latest_interval=25"

run() {  # name config extra-args...
  local name=$1 cfg=$2; shift 2
  echo "=== $name : $cfg $* ==="
  timeout 5400 python tools/train.py "$cfg" \
      --work-dir "work_dir/$name" --cfg-options $OPTS "$@" \
      > "work_dir/${name}.out" 2>&1
  echo "=== $name rc=$? ==="
  tail -2 "work_dir/${name}.out" || true
}

run converge_big_s1 configs/smoke/converge_synth_big_stage1.py --auto-resume
run converge_big_s2 configs/smoke/converge_synth_big_stage2.py \
    --load-from work_dir/converge_big_s1/latest
run converge_big_token_only configs/smoke/converge_synth_big_token_only.py
run converge_big_onestage configs/smoke/converge_synth_big.py

echo "=== chain done ==="
