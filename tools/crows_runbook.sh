#!/bin/bash
# Queued v5e measurement pass for the [C, rows] entry block
# (ops/crows_block.py). Run when the chip is free:
#   1. TPU-gated crows kernel tests (compiled Mosaic paths)
#   2. tools/bench_crows.py — first-block microbench vs the unfused pair
#   3. bench.py full-step A/B: DCASE_BENCH_CROWS=1 vs default
# If crows wins both: flip ModelConfig.entry_block_crows to default True,
# re-run bench.py + tools/profile_step.py --crows, update docs/PERF.md.
set -u
cd "$(dirname "$0")/.."

echo "=== 1/3 TPU-gated crows kernel tests ==="
DCASE_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_crows_block.py -q \
  2>&1 | tail -2

echo "=== 2/3 crows microbench ==="
timeout 1800 python tools/bench_crows.py 2>&1 | grep -v WARNING

echo "=== 3/3 full-step bench A/B ==="
DCASE_BENCH_CROWS=1 timeout 1800 python bench.py --skip_feed 2>/dev/null | tail -1
timeout 1800 python bench.py --skip_feed 2>/dev/null | tail -1
