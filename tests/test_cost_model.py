"""Sanity checks for the analytic step cost model behind bench.py's
mfu_pct / hbm_util_pct fields (utils/cost_model.py). These pin structural
properties (linearity, breakdown consistency, variant ordering) and the
cross-checks against docs/PERF.md's measured per-kernel numbers — not
exact values, which are a model by construction."""

from dcase2019_task4_tpu.config import Config, ModelConfig, scaled_config
from dcase2019_task4_tpu.utils.cost_model import (
    V5E_PEAK_FLOPS_BF16,
    hbm_bytes,
    model_flops,
    step_utilization,
)

CFG = Config(model=ModelConfig(compute_dtype="bfloat16"))


def test_breakdowns_sum_to_total():
    fl = model_flops(CFG, 96)
    assert fl["total"] == (fl["frontend"] + fl["student_fwd_bwd"]
                           + fl["teacher_fwd"])
    assert fl["student_fwd_bwd"] == 3 * (fl["conv_fwd"] + fl["glu_fwd"]
                                         + fl["gru_fwd"] + fl["heads_fwd"])
    by = hbm_bytes(CFG, 96)
    assert by["total"] == sum(v for k, v in by.items() if k != "total")


def test_linear_in_batch():
    f1, f2 = model_flops(CFG, 48)["total"], model_flops(CFG, 96)["total"]
    assert f2 == 2 * f1
    b1, b2 = hbm_bytes(CFG, 48)["total"], hbm_bytes(CFG, 96)["total"]
    # small_allowance has a batch-independent params term; near-linear
    assert 1.9 * b1 < b2 <= 2 * b1


def test_flagship_magnitudes_match_perf_doc():
    """Cross-checks against docs/PERF.md measured numbers (B=96, bf16)."""
    fl = model_flops(CFG, 96)
    # fused STFT→mel kernel measured 4.2 ms at ~70% of its 3.5 ms bf16 MXU
    # roofline → the DFT+mel flop model must put the roofline at 3.3-3.9 ms
    roofline_ms = 1000 * fl["frontend"] / V5E_PEAK_FLOPS_BF16
    assert 3.3 < roofline_ms < 3.9
    by = hbm_bytes(CFG, 96)
    # the entry-conv patch tensor is the documented 680 MB lane-padded
    # write+read plus the conv activation write, per model
    assert 3.5e9 < by["entry_conv_fwd"] < 4.5e9
    # whole step lands in the single-digit-GB range the profile implies
    assert 8e9 < by["total"] < 20e9


def test_recompute_variant_saves_dy_partial_roundtrip():
    default = hbm_bytes(CFG, 96, bwd_recompute=False)["total"]
    recomp = hbm_bytes(CFG, 96, bwd_recompute=True)["total"]
    # dy_partial is ~680 MB written+read at block 1 (plus interior blocks)
    assert default - recomp > 1.2e9


def test_supervised_cheaper_than_mean_teacher():
    assert model_flops(CFG, 96, mean_teacher=False)["total"] < \
        model_flops(CFG, 96, mean_teacher=True)["total"]
    assert hbm_bytes(CFG, 96, mean_teacher=False)["total"] < \
        hbm_bytes(CFG, 96, mean_teacher=True)["total"]


def test_scaled_config_costs_more():
    s = scaled_config()
    assert model_flops(s, 96)["total"] > 3 * model_flops(CFG, 96)["total"]
    assert hbm_bytes(s, 96)["total"] > 2 * hbm_bytes(CFG, 96)["total"]


def test_utilization_fields():
    u = step_utilization(CFG, 96, step_seconds=0.037)
    assert 5 < u["mfu_pct"] < 60
    assert 10 < u["hbm_util_pct"] < 100
    # halving the step time doubles both utilizations
    u2 = step_utilization(CFG, 96, step_seconds=0.0185)
    assert abs(u2["mfu_pct"] - 2 * u["mfu_pct"]) < 0.05
