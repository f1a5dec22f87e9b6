#!/usr/bin/env bash
# Released-weight parity gate (BASELINE.md "within 0.3 of the model
# zoo", reference README.md:182-245).  Fails fast with the list of
# missing assets; when everything is mounted it runs the full gate:
#   1. sentencepiece golden cross-check against the real beit3.spm
#   2. torch .pth -> orbax conversion (both interpolation paths)
#   3. tools/test.py multi-split eval from the converted checkpoint
#
# Environment overrides:
#   SIMVG_CKPT   released SimVG checkpoint (.pth)         [pretrain_weights/simvg_refcoco_db.pth]
#   SPM          beit3 sentencepiece model                [pretrain_weights/beit3.spm]
#   ANNS         RefCOCO-unc instances.json               [data/annotations/refcoco-unc/instances.json]
#   IMGS         COCO train2014 image dir                 [data/images/mscoco/train2014]
#   CONFIG       eval config                              [configs/single/ViT-base/refcoco/refcoco_onestage.py]
#   EXPECT       published val Prec@0.5 to compare against [90.51]
set -euo pipefail
cd "$(dirname "$0")/.."

SIMVG_CKPT=${SIMVG_CKPT:-pretrain_weights/simvg_refcoco_db.pth}
SPM=${SPM:-pretrain_weights/beit3.spm}
ANNS=${ANNS:-data/annotations/refcoco-unc/instances.json}
IMGS=${IMGS:-data/images/mscoco/train2014}
CONFIG=${CONFIG:-configs/single/ViT-base/refcoco/refcoco_onestage.py}
EXPECT=${EXPECT:-90.51}

missing=()
[ -f "$SIMVG_CKPT" ] || missing+=("$SIMVG_CKPT (released SimVG .pth — reference README model zoo)")
[ -f "$SPM" ] || missing+=("$SPM (beit3 sentencepiece model)")
[ -f "$ANNS" ] || missing+=("$ANNS (SimVG-format annotations)")
[ -d "$IMGS" ] || missing+=("$IMGS (COCO train2014 images)")
if [ ${#missing[@]} -gt 0 ]; then
    echo "parity gate BLOCKED — assets missing:" >&2
    printf '  - %s\n' "${missing[@]}" >&2
    echo "Mount them (or set SIMVG_CKPT/SPM/ANNS/IMGS) and re-run 'make parity'." >&2
    exit 2
fi

echo "== 1/3 sentencepiece golden cross-check (real beit3.spm)"
python -m pytest tests/test_spm_tokenizer.py -q

echo "== 2/3 convert $SIMVG_CKPT -> orbax"
out=work_dir/parity/converted
python tools/convert_checkpoint.py "$SIMVG_CKPT" "$out" \
    --img-size 640 --patch-size 32 --platform cpu

echo "== 3/3 evaluate $CONFIG from the converted checkpoint"
python tools/test.py "$CONFIG" "$out" \
    --cfg-options "data.val.annsfile=$ANNS" "data.val.imgsfile=$IMGS" \
    | tee work_dir/parity/eval.log

if [ "${PRUNE_SWEEP:-0}" = "1" ]; then
    echo "== optional: token-prune accuracy-envelope sweep on real weights"
    python tools/misc/prune_envelope.py "$CONFIG" "$out" \
        --cfg-options "data.val.annsfile=$ANNS" "data.val.imgsfile=$IMGS" \
        --out work_dir/parity/prune_envelope.json
fi

acc=$(grep -oE "det_acc[^0-9]*[0-9]+\.[0-9]+" work_dir/parity/eval.log \
      | tail -1 | grep -oE "[0-9]+\.[0-9]+")
echo "val Prec@0.5 = $acc (published $EXPECT, gate |diff| <= 0.3)"
python - "$acc" "$EXPECT" << 'EOF'
import sys
acc, expect = float(sys.argv[1]), float(sys.argv[2])
diff = abs(acc - expect)
print(f"parity gate {'PASS' if diff <= 0.3 else 'FAIL'}: |{acc} - {expect}| = {diff:.2f}")
sys.exit(0 if diff <= 0.3 else 1)
EOF
