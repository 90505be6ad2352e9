#!/usr/bin/env bash
# Launch training (counterpart of core/gdrn_modeling/train_gdrn.sh).
# Usage: ./train.sh configs/lm13.py [extra opts...]
set -euo pipefail
CFG=${1:?usage: ./train.sh CONFIG [opts...]}
shift || true
exec python -m rdpn6d_tpu.main --config-file "$CFG" ${@:+--opts "$@"}
