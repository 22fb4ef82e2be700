#!/bin/bash
# Queued TPU work (run whenever the axon tunnel is up and the chip is free).
# Safe to re-run: every step is resumable / idempotent.
#   1. Reference-step-scale SSL ablation (RESULTS.md round 4c): mt / mt_cc0 /
#      supervised at 1000 epochs ~= 16k MT steps. ablate_ssl.py writes the
#      out-file after every completed arm-run and skips runs already
#      recorded, so interrupted invocations resume for free. Add seeds with
#      --seed_base for a disjoint batch.
#   2. bench.py refresh at BOTH configs (BENCH_r*.json source numbers; the
#      scaled config picked up the full-unroll GRU win this round).
#   3. TPU-gated Mosaic kernel tests (re-verify compiled paths on hardware
#      after any kernel change).
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

SEEDS=${SEEDS:-2}
echo "=== 1/3 SSL ablation at reference step scale (1000 epochs, seeds 0..$((SEEDS-1))) ==="
DCASE_SCALER_CACHE=/tmp/scaler_cache timeout 28000 \
  python tools/ablate_ssl.py --epochs 1000 --eval_every 25 --seeds "$SEEDS" \
  --arms supervised,mt,mt_cc0 \
  --out ABLATION_ssl_refscale.json --store /tmp/ablate_refscale \
  > /tmp/ablate.log 2>&1
echo "ablation exit=$?"; tail -6 /tmp/ablate.log

echo "=== 2/3 full-step bench (flagship + scaled) ==="
timeout 1800 python bench.py > /tmp/bench_default.log 2>&1
echo "bench exit=$?"; tail -2 /tmp/bench_default.log
timeout 1800 python bench.py --scaled > /tmp/bench_scaled.log 2>&1
echo "bench --scaled exit=$?"; tail -2 /tmp/bench_scaled.log

echo "=== 3/3 TPU-gated kernel tests ==="
DCASE_TPU_TESTS=1 timeout 2400 python -m pytest \
  tests/test_fused_block.py tests/test_packed_conv.py tests/test_fused_mel.py \
  tests/test_fused_entry_block.py tests/test_entry_conv.py \
  tests/test_crows_block.py tests/test_export.py -q \
  > /tmp/tpu_gated_tests.log 2>&1
echo "tpu-gated tests exit=$? : $(tail -1 /tmp/tpu_gated_tests.log)"
