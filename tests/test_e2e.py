"""End-to-end integration: the `--subpart_data`-style tiny run the reference
uses as its de-facto integration test (SURVEY.md §4.1), on fabricated
class-consistent audio: manifests → streams → device featurize → train →
decode → score → checkpoint → evaluate CLI."""

import os

import numpy as np
import pytest

from dcase2019_task4_tpu.config import Config, DSPConfig, ModelConfig, TrainConfig
from dcase2019_task4_tpu.train.experiment import Experiment

TINY_CFG = Config(
    dsp=DSPConfig(max_len_seconds=1.0),
    model=ModelConfig(nclass=10, nb_filters=(16, 16, 16), n_rnn_cell=16, dropout=0.3),
    train=TrainConfig(batch_size=8, n_epoch=1, num_prefetch=1),
)


@pytest.fixture(scope="module")
def tiny_exp():
    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True, seed=0
    )
    exp.build()
    return exp


def test_build_stream_composition(tiny_exp):
    # [weak ¼ | unlabeled ½ | synthetic ¼] of batch 8 (main.py:238-247)
    assert [s.name for s in tiny_exp.pipeline.streams] == ["weak", "unlabeled", "synthetic"]
    assert tiny_exp.pipeline.sampler.batch_sizes == [2, 4, 2]
    assert tiny_exp.weak_slice == slice(0, 2)
    assert tiny_exp.strong_slice == slice(6, 8)


def test_scaler_fitted(tiny_exp):
    assert tiny_exp.scaler.mean_ is not None
    assert tiny_exp.scaler.mean_.shape == (64,)
    assert (tiny_exp.scaler.std_ > 0).all()


def test_train_epoch_and_validate(tiny_exp):
    meters = tiny_exp.train_epoch(0)
    assert "loss" in meters.meters
    assert np.isfinite(meters.meters["loss"].avg)
    metrics = tiny_exp.validate(0)
    assert 0.0 <= metrics["event_macro_f1"] <= 1.0
    assert 0.0 <= metrics["weak_macro_f1"] <= 1.0


def test_predictions_dataframe_schema(tiny_exp):
    df = tiny_exp.predict_dataframe(tiny_exp.valid_synth_stream)
    assert list(df.columns) == ["event_label", "onset", "offset", "filename"]
    if len(df):
        assert df.onset.min() >= 0
        assert set(df.event_label) <= set(tiny_exp.classes)


def test_full_run_with_checkpoints(tmp_path, tiny_exp):
    store = str(tmp_path / "run")
    tiny_exp.run(store_dir=store, n_epoch=1)
    model_dir = os.path.join(store, "model")
    assert os.path.exists(os.path.join(model_dir, "baseline_epoch_0"))
    assert os.path.exists(os.path.join(model_dir, "baseline_best"))


def test_checkpoint_evaluator_roundtrip(tmp_path, tiny_exp):
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    store = str(tmp_path / "run2")
    tiny_exp.run(store_dir=store, n_epoch=1)
    best = os.path.join(store, "model", "baseline_best")
    ev = CheckpointEvaluator(best, synthetic_audio=True)
    res = ev.test_model(
        tiny_exp.cfg.paths.validation, subpart=6,
        save_predictions_fname=str(tmp_path / "preds.tsv"),
    )
    assert 0.0 <= res["event_macro_f1"] <= 1.0
    assert os.path.exists(tmp_path / "preds.tsv")

    # --data_parallel evaluation: sharded inference over the 8-device mesh
    # must reproduce the unsharded metrics exactly (batch 8 % 8 == 0)
    import jax

    if len(jax.devices()) >= 8:
        from dcase2019_task4_tpu.parallel.mesh import make_mesh

        ev8 = CheckpointEvaluator(best, synthetic_audio=True, mesh=make_mesh())
        res8 = ev8.test_model(tiny_exp.cfg.paths.validation, subpart=6)
        assert res8["event_macro_f1"] == pytest.approx(res["event_macro_f1"], abs=1e-9)
        assert res8["weak_macro_f1"] == pytest.approx(res["weak_macro_f1"], abs=1e-9)


def test_no_synthetic_mode_composition():
    # main.py -n: [weak ¼ | unlabeled ¾], no strong loss (main.py:242-245)
    exp = Experiment(
        TINY_CFG, mean_teacher=True, no_synthetic=True, subpart_data=12,
        synthetic_audio=True, seed=1,
    )
    exp.build()
    assert [s.name for s in exp.pipeline.streams] == ["weak", "unlabeled"]
    assert exp.pipeline.sampler.batch_sizes == [2, 6]
    assert exp.weak_slice == slice(0, 2)
    assert exp.strong_slice is None


def test_simple_crnn_mode_composition():
    # main_simple_CRNN.py default: [weak ½ | synthetic ½]
    exp = Experiment(
        TINY_CFG, mean_teacher=False, subpart_data=12, synthetic_audio=True, seed=1
    )
    exp.build()
    assert [s.name for s in exp.pipeline.streams] == ["weak", "synthetic"]
    assert exp.weak_slice == slice(0, 4)
    assert exp.strong_slice == slice(4, 8)


def test_synthetic_only_mode_composition():
    # main_simple_CRNN.py -n: synthetic only, no weak loss
    exp = Experiment(
        TINY_CFG, mean_teacher=False, no_weak=True, subpart_data=12,
        synthetic_audio=True, seed=1,
    )
    exp.build()
    assert [s.name for s in exp.pipeline.streams] == ["synthetic"]
    assert exp.weak_slice is None
    assert exp.strong_slice == slice(0, 8)


def test_resume_roundtrip(tmp_path, tiny_exp):
    store = str(tmp_path / "resume_run")
    tiny_exp.run(store_dir=store, n_epoch=1)
    ck = os.path.join(store, "model", "baseline_epoch_0")
    meta = tiny_exp.restore(ck)
    assert meta["epoch"] == 0
    # continuing from epoch+1 trains at least one more epoch
    res = tiny_exp.run(store_dir=store, n_epoch=2, resume_from=ck)
    assert "event_macro_f1" in res


def test_ramped_adam_smoke():
    """--ramped_adam: the scheduled optimizer (train/schedules.py) trains a
    step end to end and the loss stays finite."""
    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True,
        seed=1, ramped_adam=True,
    )
    exp.build()
    meters = exp.train_epoch(0)
    assert np.isfinite(meters.meters["loss"].avg)


def test_simple_crnn_trainset_metrics_logged(caplog):
    """main_simple_CRNN.py:236-252 parity: the supervised recipe reports
    per-epoch TRAIN synthetic strong metrics and TRAIN weak tagging F1."""
    import logging

    exp = Experiment(
        TINY_CFG, mean_teacher=False, subpart_data=10, synthetic_audio=True, seed=2
    )
    exp.build()
    logger = exp.log
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    logger.addHandler(h)
    try:
        exp.validate(0)
    finally:
        logger.removeHandler(h)
    joined = "\n".join(records)
    assert "Training synthetic metric:" in joined
    assert "Training weak metric:" in joined
    assert "### Valid synthetic metric ###" in joined


def test_evaluate_tune_thresholds(tmp_path, tiny_exp):
    """evaluate --tune_thresholds: per-class grid search reported."""
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    path = str(tmp_path / "ckpt_tune")
    ckpt.save_checkpoint(path, tiny_exp.state, tiny_exp.checkpoint_metadata(0, {}))
    ev = CheckpointEvaluator(path, synthetic_audio=True)
    res = ev.test_model(tiny_exp.cfg.paths.validation, subpart=6, tune_thresholds=True)
    assert "tuned_thresholds" in res and len(res["tuned_thresholds"]) == 10
    assert 0.0 <= res["tuned_weak_macro_f1"] <= 1.0
    # tuned per-class F1 can never be worse than the fixed-0.5 threshold F1
    assert res["tuned_weak_macro_f1"] >= res["weak_macro_f1"] - 1e-9


def test_data_parallel_experiment_epoch_and_validate():
    """Full Experiment on the 8-device mesh: train_epoch runs the shard_map
    step, validate() runs the SHARDED eval path (batch 8 % 8 == 0 activates
    it) — the whole per-epoch loop scales over the mesh, not just the
    train step."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from dcase2019_task4_tpu.parallel.mesh import make_mesh

    # subpart 40: the global batch is the per-device [2|4|2] layout tiled
    # 8× = [16|32|16], so every stream needs enough files for one batch
    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=40, synthetic_audio=True,
        seed=0, mesh=make_mesh(),
    )
    exp.build()
    # the divisibility gate must have picked the sharded eval path
    assert exp.pipeline.batch_size % 8 == 0
    assert len(exp.pipeline) >= 1
    meters = exp.train_epoch(0)
    assert np.isfinite(meters.meters["loss"].avg)
    metrics = exp.validate(0)
    assert 0.0 <= metrics["event_macro_f1"] <= 1.0
    assert 0.0 <= metrics["weak_macro_f1"] <= 1.0


def test_scaled_geometry_experiment_smoke():
    """--scaled composition at test scale: 128 mels through the frontend,
    128-ch convs (k=1 fused-kernel geometry), SpecAugment inside the jitted
    step — one full epoch + validation (scaled_config itself only changes
    sizes, exercised here at a CPU-feasible subpart)."""
    from dcase2019_task4_tpu.config import DSPConfig

    cfg = Config(
        dsp=DSPConfig(max_len_seconds=1.0, n_mels=128, f_max=22050.0),
        model=ModelConfig(nclass=10, nb_filters=(128, 128, 128), n_rnn_cell=16,
                          pooling=((2, 4), (2, 4), (2, 8)), dropout=0.3),
        train=TrainConfig(batch_size=8, n_epoch=1, num_prefetch=1,
                          spec_augment=True, sa_max_time_width=8,
                          sa_max_freq_width=8),
    )
    exp = Experiment(cfg, mean_teacher=True, subpart_data=12,
                     synthetic_audio=True, seed=0)
    exp.build()
    meters = exp.train_epoch(0)
    assert np.isfinite(meters.meters["loss"].avg)
    metrics = exp.validate(0)
    assert 0.0 <= metrics["event_macro_f1"] <= 1.0


def test_multihost_sharded_validation_merge_matches_single_host(monkeypatch):
    """Simulate 3 hosts: each Experiment (same seed → identical params)
    shards the validation manifests round-robin (shard_manifest via the
    patched process index), scores its own files, and the summed count
    vectors must rebuild exactly the single-host metrics."""
    import jax

    from dcase2019_task4_tpu.eval.sed_scores import (
        SedMetrics,
        event_based_metrics,
    )

    def build(pid, pcount):
        monkeypatch.setattr(jax, "process_index", lambda: pid)
        monkeypatch.setattr(jax, "process_count", lambda: pcount)
        exp = Experiment(
            TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True,
            seed=0,
        )
        exp.build()
        return exp

    full = build(0, 1)
    classes = list(full.classes)
    pred_full = full.predict_dataframe(full.valid_synth_stream)
    ev_full = event_based_metrics(full.valid_synth_df, pred_full)

    vec = np.zeros(3 * len(classes) + 7)
    seen_files = []
    for pid in range(3):
        host = build(pid, 3)
        assert host.process_count == 3
        seen_files.extend(host.valid_synth_stream.filenames)
        pred = host.predict_dataframe(host.valid_synth_stream)
        vec += event_based_metrics(host.valid_synth_df, pred).count_vector(classes)
    # the round-robin shards partition the full validation set
    assert sorted(seen_files) == sorted(full.valid_synth_stream.filenames)

    merged = SedMetrics.from_counts(classes, "Event-based", vec)
    assert merged.macro_f_measure() == pytest.approx(ev_full.macro_f_measure(), abs=1e-12)
    assert merged.results_overall_metrics() == ev_full.results_overall_metrics()


def test_data_parallel_resume_roundtrip(tmp_path):
    """--resume under --data_parallel: checkpoints save replicated mesh
    state as numpy and restore() must feed cleanly back into the shard_map
    step (jit re-commits the replicated spec)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from dcase2019_task4_tpu.parallel.mesh import make_mesh

    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=40, synthetic_audio=True,
        seed=0, mesh=make_mesh(),
    )
    exp.build()
    store = str(tmp_path / "dp_run")
    exp.run(store_dir=store, n_epoch=1)
    ck = os.path.join(store, "model", "baseline_epoch_0")

    exp2 = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=40, synthetic_audio=True,
        seed=0, mesh=make_mesh(),
    )
    exp2.build()
    res = exp2.run(store_dir=store, n_epoch=2, resume_from=ck)
    assert "event_macro_f1" in res


def test_predict_set_groundtruth_free(tmp_path, tiny_exp):
    """predict_set: serving surface — wav dir or TSV in, events TSV out,
    no labels needed; events equal the scored test_model run's TSV."""
    import pandas as pd

    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    path = str(tmp_path / "ckpt_pred")
    ckpt.save_checkpoint(path, tiny_exp.state, tiny_exp.checkpoint_metadata(0, {}))
    ev = CheckpointEvaluator(path, synthetic_audio=True)
    tsv = tiny_exp.cfg.paths.validation

    pred_tsv = str(tmp_path / "pred.tsv")
    weak_tsv = str(tmp_path / "weak.tsv")
    res = ev.predict_set(tsv, pred_tsv, subpart=6, weak_fname=weak_tsv)
    assert res["n_files"] == 6
    got = pd.read_csv(pred_tsv, sep="\t")
    assert list(got.columns) == ["event_label", "onset", "offset", "filename"]

    # same model scored through test_model must emit identical events
    scored = ev.test_model(tsv, subpart=6, save_predictions_fname=str(tmp_path / "ref.tsv"))
    pd.testing.assert_frame_equal(
        got, pd.read_csv(tmp_path / "ref.tsv", sep="\t"), check_dtype=False
    )

    # weak tag TSV is the reference weak schema (filename⇥event_labels)
    tags = pd.read_csv(weak_tsv, sep="\t")
    assert list(tags.columns) == ["filename", "event_labels"]
    assert len(tags) == 6

    # directory input: manifest built from the wav listing itself
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    names = sorted(pd.read_csv(tsv, sep="\t")["filename"].drop_duplicates())[:4]
    for n in names:
        (wav_dir / n).touch()  # contents unread under synthetic_audio
    res_dir = ev.predict_set(str(wav_dir), str(tmp_path / "pred_dir.tsv"))
    assert res_dir["n_files"] == 4
    got_dir = pd.read_csv(tmp_path / "pred_dir.tsv", sep="\t")
    assert set(got_dir["filename"]) <= set(names)


def test_predict_cli(tmp_path, tiny_exp):
    from dcase2019_task4_tpu import cli
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    path = str(tmp_path / "ckpt_cli")
    ckpt.save_checkpoint(path, tiny_exp.state, tiny_exp.checkpoint_metadata(0, {}))
    out = str(tmp_path / "cli_pred.tsv")
    res = cli.predict([
        "-m", path, "-i", tiny_exp.cfg.paths.validation, "-p", out,
        "-s", "4", "--synthetic_audio",
    ])
    assert res["n_files"] == 4
    assert os.path.exists(out)


def test_metrics_jsonl_history(tmp_path):
    """run() writes one structured JSONL record per epoch; --resume appends
    to the same file (utils/metrics_writer.py)."""
    from dcase2019_task4_tpu.utils.metrics_writer import read_metrics

    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True, seed=3
    )
    exp.build()
    store = str(tmp_path / "hist_run")
    exp.run(store_dir=store, n_epoch=1)
    path = os.path.join(store, "metrics.jsonl")
    recs = read_metrics(path)
    assert len(recs) == 1
    r = recs[0]
    assert r["epoch"] == 0
    for key in ("ts", "epoch_time_s", "loss", "event_macro_f1", "weak_macro_f1",
                "global_valid", "saved_best"):
        assert key in r, key
    assert r["global_valid"] == pytest.approx(
        r["event_macro_f1"] + r["weak_macro_f1"]
    )

    # resume appends epoch 1 to the same history
    exp2 = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True, seed=3
    )
    exp2.build()
    exp2.run(store_dir=store, n_epoch=2,
             resume_from=os.path.join(store, "model", "baseline_epoch_0"))
    recs = read_metrics(path)
    assert [r["epoch"] for r in recs] == [0, 1]


def test_early_stopping_patience(tmp_path, monkeypatch):
    """--early_stopping: run() breaks after `patience` non-improving epochs
    on the SaveBest criterion (the reference defines EarlyStopping,
    utils/utils.py:286-334, but never wires it)."""
    from dcase2019_task4_tpu.utils.metrics_writer import read_metrics

    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True, seed=4
    )
    exp.build()
    # pin validation so the criterion never improves after epoch 0
    monkeypatch.setattr(
        exp, "validate", lambda epoch: {"event_macro_f1": 0.0, "weak_macro_f1": 0.0}
    )
    store = str(tmp_path / "es_run")
    exp.run(store_dir=store, n_epoch=10, early_stopping=1)
    recs = read_metrics(os.path.join(store, "metrics.jsonl"))
    # epoch 0 sets best=0.0 (sup: 0.0 is not > 0.0, so even epoch 0 counts as
    # non-improving); patience 1 → stop at epoch 2
    assert [r["epoch"] for r in recs] == [0, 1, 2]


def test_load_thresholds_validation(tmp_path):
    """load_thresholds: dict keyed by class (order-independent), bare list,
    and the two failure modes."""
    import json
    import types

    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    labels = [f"c{i}" for i in range(4)]
    ns = types.SimpleNamespace(codec=types.SimpleNamespace(labels=labels))
    p = tmp_path / "th.json"

    p.write_text(json.dumps({"c2": 0.3, "c0": 0.1, "c1": 0.2, "c3": 0.4}))
    th = CheckpointEvaluator.load_thresholds(ns, str(p))
    assert th.tolist() == [0.1, 0.2, 0.3, 0.4]

    p.write_text(json.dumps([0.5, 0.6, 0.7, 0.8]))
    assert CheckpointEvaluator.load_thresholds(ns, str(p)).tolist() == [0.5, 0.6, 0.7, 0.8]

    p.write_text(json.dumps({"c0": 0.1}))
    with pytest.raises(ValueError, match="missing classes"):
        CheckpointEvaluator.load_thresholds(ns, str(p))
    p.write_text(json.dumps([0.5, 0.6]))
    with pytest.raises(ValueError, match="shape"):
        CheckpointEvaluator.load_thresholds(ns, str(p))


def test_tune_save_reuse_thresholds_cli(tmp_path, tiny_exp):
    """evaluate --tune_thresholds --save_thresholds writes {class: th} JSON;
    a second evaluate --thresholds_json consumes it for per-class decode."""
    import json

    from dcase2019_task4_tpu import cli
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    path = str(tmp_path / "ckpt_th")
    ckpt.save_checkpoint(path, tiny_exp.state, tiny_exp.checkpoint_metadata(0, {}))
    th_json = str(tmp_path / "tuned.json")
    tsv = tiny_exp.cfg.paths.validation
    cli.evaluate(["-m", path, "--synthetic_audio", "-s", "6", "--sets", tsv,
                  "--tune_thresholds", "--save_thresholds", th_json])
    tuned = json.load(open(th_json))
    assert sorted(tuned) == sorted(tiny_exp.classes)
    res = cli.evaluate(["-m", path, "--synthetic_audio", "-s", "6", "--sets", tsv,
                        "--thresholds_json", th_json])
    assert 0.0 <= res[tsv]["event_macro_f1"] <= 1.0


def test_merge_window_events():
    import pandas as pd

    from dcase2019_task4_tpu.eval.decode import merge_window_events

    df = pd.DataFrame(
        [
            # abutting fragments across a window boundary -> merged
            ("Dog", 8.0, 10.01, "a.wav"),
            ("Dog", 10.0, 12.0, "a.wav"),
            # gap 0.15 <= merge_gap 0.2 -> merged
            ("Dog", 14.0, 15.0, "a.wav"),
            ("Dog", 15.15, 16.0, "a.wav"),
            # gap 0.5 > merge_gap -> kept separate
            ("Dog", 20.0, 21.0, "a.wav"),
            # different class / file never merge
            ("Cat", 9.9, 10.0, "a.wav"),
            ("Dog", 9.9, 10.05, "b.wav"),
        ],
        columns=["event_label", "onset", "offset", "filename"],
    )
    out = merge_window_events(df, merge_gap=0.2)
    a_dog = out[(out.filename == "a.wav") & (out.event_label == "Dog")]
    assert [(round(r.onset, 2), round(r.offset, 2)) for r in a_dog.itertuples()] == [
        (8.0, 12.0), (14.0, 16.0), (20.0, 21.0)
    ]
    assert len(out[(out.filename == "a.wav") & (out.event_label == "Cat")]) == 1
    assert len(out[out.filename == "b.wav"]) == 1
    assert merge_window_events(df.iloc[:0]).empty


def test_predict_long_windows_and_stitch(tmp_path, tiny_exp):
    """--long: a 2.5-window wav is cut into 3 static windows; with an
    always-on threshold every class decodes to one stitched event spanning
    the full (clamped) duration — proving window offsets, boundary merge,
    and duration clamping."""
    from scipy.io import wavfile

    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    d = TINY_CFG.dsp  # max_len 1.0 s windows in the tiny config
    dur = 2.5 * d.max_len_seconds
    n = int(dur * d.sample_rate)
    t = np.arange(n) / d.sample_rate
    wav_dir = tmp_path / "long_wavs"
    wav_dir.mkdir()
    wavfile.write(
        str(wav_dir / "long.wav"), d.sample_rate,
        (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16),
    )

    path = str(tmp_path / "ckpt_long")
    ckpt.save_checkpoint(path, tiny_exp.state, tiny_exp.checkpoint_metadata(0, {}))
    ev = CheckpointEvaluator(path)
    out_tsv = str(tmp_path / "long_pred.tsv")
    res = ev.predict_long(str(wav_dir), out_tsv, threshold=-1.0)
    assert res["n_files"] == 1 and res["n_windows"] == 3
    pred = res["predictions"]
    # every class fires everywhere -> exactly one stitched event per class,
    # clamped to the true 2.5 s duration (not the 3-window 3 s span)
    assert len(pred) == len(tiny_exp.classes)
    assert (pred["onset"] == 0.0).all()
    assert pred["offset"].max() == pytest.approx(dur, abs=1e-6)
    assert (pred["offset"] > d.max_len_seconds).all()  # crosses window 1
    import pandas as pd

    on_disk = pd.read_csv(out_tsv, sep="\t")
    assert len(on_disk) == len(pred)


def test_predict_long_overlap_timeline(tmp_path, tiny_exp):
    """--long --overlap: half-window hop on the pooled-frame grid,
    probability-averaged timeline, single decode per file."""
    from scipy.io import wavfile

    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    d = TINY_CFG.dsp
    dur = 2.5 * d.max_len_seconds
    n = int(dur * d.sample_rate)
    t = np.arange(n) / d.sample_rate
    wav_dir = tmp_path / "ol_wavs"
    wav_dir.mkdir()
    wavfile.write(
        str(wav_dir / "ol.wav"), d.sample_rate,
        (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16),
    )
    path = str(tmp_path / "ckpt_ol")
    ckpt.save_checkpoint(path, tiny_exp.state, tiny_exp.checkpoint_metadata(0, {}))
    ev = CheckpointEvaluator(path)
    res = ev.predict_long(str(wav_dir), str(tmp_path / "ol.tsv"),
                          threshold=-1.0, overlap=True)
    # half-window hop covers 2.5 windows with more windows than the
    # non-overlapping cut (which uses 3)
    assert res["n_windows"] > 3
    pred = res["predictions"]
    # always-on threshold -> one timeline event per class over the clamped file
    assert len(pred) == len(tiny_exp.classes)
    assert (pred["onset"] == 0.0).all()
    assert pred["offset"].max() == pytest.approx(dur, abs=1e-6)


def test_scaler_cache_memoizes_fit(tmp_path, monkeypatch):
    """DCASE_SCALER_CACHE memoizes the moment pass keyed by stream contents
    + DSP config: a second identical build loads the cached stats without
    touching the device, and a different stream layout gets its own key."""
    import dcase2019_task4_tpu.train.steps as steps_mod

    cache_dir = tmp_path / "scaler_cache"
    monkeypatch.setenv("DCASE_SCALER_CACHE", str(cache_dir))

    exp1 = Experiment(TINY_CFG, mean_teacher=True, subpart_data=12,
                      synthetic_audio=True, seed=0)
    exp1.build()
    files = sorted(os.listdir(cache_dir))
    assert len(files) == 1

    # identical config -> cache hit; poison the device pass to prove it
    def boom(*a, **k):
        raise AssertionError("scaler refit despite warm cache")

    monkeypatch.setattr(steps_mod, "make_scaler_stats", boom)
    exp2 = Experiment(TINY_CFG, mean_teacher=True, subpart_data=12,
                      synthetic_audio=True, seed=0)
    exp2.build()
    np.testing.assert_allclose(exp2.scaler.mean_, exp1.scaler.mean_)
    np.testing.assert_allclose(exp2.scaler.std_, exp1.scaler.std_)
    monkeypatch.undo()
    monkeypatch.setenv("DCASE_SCALER_CACHE", str(cache_dir))

    # different stream layout (supervised: no unlabeled stream) -> new key
    exp3 = Experiment(TINY_CFG, mean_teacher=False, subpart_data=12,
                      synthetic_audio=True, seed=0)
    exp3.build()
    assert len(sorted(os.listdir(cache_dir))) == 2
