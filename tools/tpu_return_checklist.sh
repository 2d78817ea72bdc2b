#!/bin/sh
# Run when the TPU tunnel comes back after an outage: re-warms the
# persistent compile cache (new executor signatures compile through
# the remote compile service at ~30-90 s each, so the driver's
# round-end bench must find them warm), re-runs the real-hardware
# parity lane, and records fresh benchmark numbers.
#
# One TPU process at a time -- do not run anything else on the chip
# while this is going.
set -e
cd "$(dirname "$0")/.."

echo "== 1. probe =="
timeout 60 python -c "import jax; print(jax.devices())"

echo "== 2. on-TPU parity lane =="
sh tools/tpu_tests.sh

echo "== 3. bench: 1M tier (warms signatures incl. pair-head) =="
python bench.py --docs 1000000 --vocab 200000 --mean-len 40 --verbose

echo "== 3b. padding-knob A/B (plan-stats model says T0=1024 halves"
echo "        sort lanes at the 8.8M mix; confirm on hardware) =="
NXS_WINDOW_T=1024 NXS_QS_MIN=2 \
    python bench.py --docs 1000000 --vocab 200000 --mean-len 40 --verbose
NXS_WINDOW_T=2048 \
    python bench.py --docs 1000000 --vocab 200000 --mean-len 40 --verbose
NXS_ROW_GRID15=1 \
    python bench.py --docs 1000000 --vocab 200000 --mean-len 40 --verbose

echo "== 4. bench: north-star 8.8M tier =="
python bench.py --verbose

echo "== 5. mixed trace (boolean + fuzzy) =="
python bench.py --mixed --verbose

echo "== 5b. masked dense hybrid A/B (vs blockdense fallback) =="
NXS_MASKED_HYBRID=1 python bench.py --mixed --verbose
