#!/bin/sh
# Real-weights parity runbook: download base OPERA ckpts (HF evelyn0414/OPERA),
# convert, extract on the shipped audio lists, diff against the shipped
# feature caches. Degrades to explicit SKIPs where artifacts are missing
# (offline env / no raw WAVs). See scripts/parity_real_weights.py for the
# expected tolerances.
set -e
cd "$(dirname "$0")/.."
PYTHONPATH="$(pwd):$PYTHONPATH" exec python scripts/parity_real_weights.py "$@"
