#!/usr/bin/env bash
# Launch evaluation (counterpart of core/gdrn_modeling/test_gdrn.sh).
# Usage: ./test.sh configs/lm13.py output/lm13/ckpt lm_13_test [dets.json]
set -euo pipefail
CFG=${1:?usage: ./test.sh CONFIG CKPT_DIR SPLIT [DETS]}
CKPT=${2:?ckpt dir}
SPLIT=${3:?split}
DETS=${4:-}
exec python tools/eval_split.py --config-file "$CFG" --ckpt-dir "$CKPT" \
    --split "$SPLIT" ${DETS:+--dets "$DETS"}
