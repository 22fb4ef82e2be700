#!/bin/bash
# Queued TPU work for when the axon tunnel returns (it went down mid-round-2;
# docs/PERF.md "Measurement status"). Waits for the backend, then runs:
#   1. TPU-gated kernel tests (compiled Mosaic paths incl. the new
#      entry-conv / merged-entry-block kernels)
#   2. tools/bench_entry_block.py — merged first block vs unfused pair
#   3. bench.py A/B — DCASE_BENCH_ENTRY_BLOCK=1 vs default
# If the merged kernel wins both, flip ModelConfig.entry_block_pallas to
# default True and re-run bench.py + tools/profile_step.py --entry_block.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  if timeout 240 python -c "import jax; print(jax.devices()[0].device_kind)" \
      > /tmp/tunnel_kind.txt 2>/dev/null; then
    echo "TUNNEL UP at $(date +%H:%M:%S): $(cat /tmp/tunnel_kind.txt)"
    break
  fi
  echo "probe $i: tunnel still down $(date +%H:%M:%S)"
  sleep 180
done
grep -q . /tmp/tunnel_kind.txt 2>/dev/null || { echo "tunnel never came back"; exit 1; }

echo "=== 1/3 TPU-gated kernel tests ==="
DCASE_TPU_TESTS=1 timeout 2400 python -m pytest \
  tests/test_fused_block.py tests/test_packed_conv.py tests/test_fused_mel.py \
  tests/test_fused_entry_block.py tests/test_entry_conv.py -q \
  > /tmp/tpu_gated_tests.log 2>&1
echo "tpu-gated tests exit=$? : $(tail -1 /tmp/tpu_gated_tests.log)"

echo "=== 2/3 entry-block microbench ==="
timeout 1800 python tools/bench_entry_block.py > /tmp/bench_entry_block.log 2>&1
echo "microbench exit=$?"
cat /tmp/bench_entry_block.log

echo "=== 3/3 full-step bench A/B ==="
timeout 1800 python bench.py > /tmp/bench_default.log 2>&1
echo "bench default exit=$?"; tail -2 /tmp/bench_default.log
DCASE_BENCH_ENTRY_BLOCK=1 timeout 1800 python bench.py > /tmp/bench_entryblock.log 2>&1
echo "bench entry-block exit=$?"; tail -2 /tmp/bench_entryblock.log
