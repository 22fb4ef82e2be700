#!/bin/bash
# Queued TPU work (run whenever the axon tunnel is up and the chip is free).
# Safe to re-run: every step is resumable / idempotent. ALL steps were
# executed in round 5 (results in ABLATION_ssl_shift*.json,
# DIAG_invariance*.json, RESULTS.md round 5) — re-running is only needed
# after code changes or to add seeds (--seed_base for a disjoint batch).
#   1.  Nuisance-shift SSL ablation (labeled streams confined to the
#       0.4-0.6 nuisance quantile band, unlabeled + validation full band,
#       reference step scale). ablate_ssl.py writes the out-file after
#       every completed arm-run and skips runs already recorded, so
#       interrupted invocations resume for free.
#   1b. Paired-teacher-view arm (mt_nv) — the consistency gradient's
#       measured positive regime (+0.199 event F1 over mt_cc0, 4/4 seeds).
#   2.  bench.py refresh at BOTH configs (both wall-clocked in round 5;
#       re-run after any kernel-default change).
#   3.  TPU-gated Mosaic kernel tests incl. the round-5 A/B knobs
#       (DCASE_DROPOUT_PACK packed dropout bits, DCASE_FUSED_MEL_ONEDOT
#       fused-basis DFT — both measured dead ends, docs/PERF.md round 5).
# After step 1/1b, tools/diag_invariance.py measures each arm checkpoint's
# prediction dispersion across nuisance renders (the mechanism evidence —
# see DIAG_invariance.json for the exact invocation shape).
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
echo "=== 1/3 nuisance-shift SSL ablation (reference step scale, seeds 0..$((SEEDS-1))) ==="
DCASE_SCALER_CACHE=/tmp/scaler_cache timeout 28000 \
  python tools/ablate_ssl.py --epochs 1000 --eval_every 25 --seeds "$SEEDS" \
  --arms supervised,mt,mt_cc0 --nuisance_shift 0.4,0.6 \
  --out ABLATION_ssl_shift.json --store /tmp/ablate_shift \
  > /tmp/ablate_shift.log 2>&1
echo "ablation exit=$?"; tail -6 /tmp/ablate_shift.log
echo "=== 1b/3 paired-teacher-view arm (mt_nv; separate out-file) ==="
DCASE_SCALER_CACHE=/tmp/scaler_cache timeout 14000 \
  python tools/ablate_ssl.py --epochs 1000 --eval_every 25 --seeds "$SEEDS" \
  --arms mt_nv --nuisance_shift 0.4,0.6 \
  --out ABLATION_ssl_shift_nv.json --store /tmp/ablate_shift_nv \
  > /tmp/ablate_shift_nv.log 2>&1
echo "mt_nv exit=$?"; tail -4 /tmp/ablate_shift_nv.log

echo "=== 2/3 full-step bench (flagship + scaled) ==="
timeout 1800 python bench.py > /tmp/bench_default.log 2>&1
echo "bench exit=$?"; tail -2 /tmp/bench_default.log
timeout 1800 python bench.py --scaled > /tmp/bench_scaled.log 2>&1
echo "bench --scaled exit=$?"; tail -2 /tmp/bench_scaled.log

echo "=== 3/3 TPU-gated kernel tests (incl. round-5 knob variants) ==="
DCASE_TPU_TESTS=1 timeout 2400 python -m pytest \
  tests/test_fused_block.py tests/test_packed_conv.py tests/test_fused_mel.py \
  tests/test_fused_entry_block.py tests/test_entry_conv.py \
  tests/test_crows_block.py tests/test_export.py -q \
  > /tmp/tpu_gated_tests.log 2>&1
echo "tpu-gated tests exit=$? : $(tail -1 /tmp/tpu_gated_tests.log)"
DCASE_TPU_TESTS=1 DCASE_DROPOUT_PACK=1 timeout 1800 python -m pytest \
  tests/test_fused_block.py -q >> /tmp/tpu_gated_tests.log 2>&1
echo "pack variant exit=$?"
DCASE_TPU_TESTS=1 DCASE_FUSED_MEL_ONEDOT=1 timeout 1200 python -m pytest \
  tests/test_fused_mel.py -q >> /tmp/tpu_gated_tests.log 2>&1
echo "onedot variant exit=$?"
