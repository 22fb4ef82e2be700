#!/bin/bash
# Queued TPU work (run whenever the axon tunnel is up and the chip is free).
# Safe to re-run: every step is resumable / idempotent.
#   1. SSL value ablation (VERDICT r2 item 3): supervised vs Mean-Teacher vs
#      consistency-weight-0 at equal labeled budget. ablate_ssl.py writes
#      ABLATION_ssl.json after every completed arm and skips arm-runs already
#      recorded there, so interrupted invocations resume for free. Add seeds
#      by bumping SEEDS (or --seed_base for a disjoint batch).
#   2. bench.py refresh (BENCH_r*.json source number).
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

SEEDS=${SEEDS:-4}
echo "=== 1/3 SSL ablation (round-4 rescaled: 250 epochs ≈ 4000 MT steps," \
     "unlabeled 5:1, variability 1.0, seeds 0..$((SEEDS-1))) ==="
DCASE_SCALER_CACHE=/tmp/scaler_cache timeout 14000 \
  python tools/ablate_ssl.py --seeds "$SEEDS" \
  --out ABLATION_ssl_r4.json --store /tmp/ablate_r4 \
  > /tmp/ablate.log 2>&1
echo "ablation exit=$?"; tail -6 /tmp/ablate.log

echo "=== 2/3 full-step bench ==="
timeout 1800 python bench.py > /tmp/bench_default.log 2>&1
echo "bench exit=$?"; tail -2 /tmp/bench_default.log

echo "=== 3/3 TPU-gated kernel tests ==="
DCASE_TPU_TESTS=1 timeout 2400 python -m pytest \
  tests/test_fused_block.py tests/test_packed_conv.py tests/test_fused_mel.py \
  tests/test_fused_entry_block.py tests/test_entry_conv.py \
  tests/test_crows_block.py tests/test_export.py -q \
  > /tmp/tpu_gated_tests.log 2>&1
echo "tpu-gated tests exit=$? : $(tail -1 /tmp/tpu_gated_tests.log)"
