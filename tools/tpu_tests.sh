#!/bin/sh
# On-TPU test lane: re-run the numeric parity subset on the real chip.
#
# The CI suite runs on a virtual CPU mesh with interpret-mode Pallas
# (tests/conftest.py), which cannot catch real-hardware numerics --
# e.g. the denormal flush that returned doc 0 for every hit (commit
# 7711628) shipped green through the whole CPU suite.  This lane runs
# the routed parity fixtures and the kernel tests against actual
# Mosaic lowering and TPU arithmetic.  Run after any kernel or
# executor change, before calling a release done.
#
# Usage: tools/tpu_tests.sh [extra pytest args]
# Requires exclusive use of the chip (do not run concurrently with a
# benchmark; the device time-slices and both measurements are garbage).
set -e
cd "$(dirname "$0")/.."
NXS_TEST_PLATFORM=tpu exec python -m pytest \
    tests/test_search.py tests/test_sliced.py tests/test_batch.py \
    tests/test_blockdense.py tests/test_fuzzy.py \
    tests/test_incremental.py \
    -q "$@"
