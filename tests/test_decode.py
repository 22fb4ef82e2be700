"""Decode path tests: threshold → median → run-length → seconds → TSV
(reference get_predictions, evaluation_measures.py:203-231)."""

import numpy as np
import pandas as pd

import jax.numpy as jnp

from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.eval.decode import (
    binarize_and_median,
    decode_batch,
    grids_to_dataframe,
    predictions_to_tsv,
)

CLASSES = ["Cat", "Dog", "Speech"]
SCALE = 8 / (44100 / 511)  # pooled frame → seconds


def test_binarize_threshold_strict():
    probs = jnp.asarray(np.full((1, 108, 3), 0.5, np.float32))
    out = np.asarray(binarize_and_median(probs))
    assert out.sum() == 0  # strictly greater than threshold


def test_median_removes_blips():
    probs = np.zeros((1, 108, 3), np.float32)
    probs[0, 50, 0] = 0.9  # single-frame blip
    probs[0, 10:30, 1] = 0.9  # solid event
    out = np.asarray(binarize_and_median(jnp.asarray(probs)))
    assert out[0, :, 0].sum() == 0
    assert out[0, 10:30, 1].all()


def test_decode_batch_to_seconds():
    codec = LabelCodec(CLASSES, n_frames=108)
    probs = np.zeros((2, 108, 3), np.float32)
    probs[0, 10:30, 1] = 0.9  # Dog event frames [10, 30)
    probs[1, 0:108, 2] = 0.7  # Speech full clip
    df = decode_batch(probs, ["a.wav", "b.wav"], codec)
    assert list(df.columns) == ["event_label", "onset", "offset", "filename"]
    dog = df[df.filename == "a.wav"].iloc[0]
    assert dog.event_label == "Dog"
    np.testing.assert_allclose(dog.onset, 10 * SCALE)
    np.testing.assert_allclose(dog.offset, 30 * SCALE)
    speech = df[df.filename == "b.wav"].iloc[0]
    np.testing.assert_allclose(speech.offset, 108 * SCALE)  # ≈ 10.01 s


def test_no_events_empty_dataframe():
    codec = LabelCodec(CLASSES, n_frames=108)
    df = decode_batch(np.zeros((1, 108, 3), np.float32), ["x.wav"], codec)
    assert df.empty


def test_tsv_roundtrip(tmp_path):
    codec = LabelCodec(CLASSES, n_frames=108)
    probs = np.zeros((1, 108, 3), np.float32)
    probs[0, 40:80, 0] = 1.0
    df = decode_batch(probs, ["y.wav"], codec)
    p = tmp_path / "pred.tsv"
    predictions_to_tsv(df, str(p))
    back = pd.read_csv(p, sep="\t")
    assert list(back.columns) == ["event_label", "onset", "offset", "filename"]
    np.testing.assert_allclose(back.onset[0], df.onset.iloc[0])


def test_grids_to_dataframe_multiple_events():
    codec = LabelCodec(CLASSES, n_frames=20)
    grid = np.zeros((1, 20, 3), np.float32)
    grid[0, 2:5, 0] = 1
    grid[0, 8:12, 0] = 1
    df = grids_to_dataframe(grid, ["z.wav"], codec, 44100, 511, 8)
    assert len(df) == 2
    np.testing.assert_allclose(sorted(df.onset), [2 * SCALE, 8 * SCALE])


def test_per_class_thresholds_in_decode():
    probs = np.zeros((1, 108, 3), np.float32)
    probs[0, 10:30, 0] = 0.4  # below global 0.5, above class threshold 0.3
    probs[0, 10:30, 1] = 0.4
    out = np.asarray(binarize_and_median(jnp.asarray(probs), np.array([0.3, 0.5, 0.5])))
    assert out[0, 15, 0] == 1.0 and out[0, 15, 1] == 0.0


def test_tune_weak_thresholds():
    from dcase2019_task4_tpu.eval.thresholds import tune_weak_thresholds

    rng = np.random.default_rng(0)
    n = 400
    y = (rng.random((n, 2)) > 0.5).astype(np.int32)
    # class 0 separable around 0.3, class 1 around 0.7
    probs = np.zeros((n, 2), np.float32)
    probs[:, 0] = np.where(y[:, 0] == 1, 0.35, 0.25) + rng.normal(0, 0.01, n)
    probs[:, 1] = np.where(y[:, 1] == 1, 0.75, 0.65) + rng.normal(0, 0.01, n)
    th, f1 = tune_weak_thresholds(probs, y)
    assert 0.25 < th[0] < 0.35 and 0.65 < th[1] < 0.75
    assert (f1 > 0.95).all()


def test_decode_events_per_class_matches_decode_batch():
    """Scalar threshold/window: the host scipy decode twin used by the event
    tuner must equal the production jax decode path row for row."""
    from dcase2019_task4_tpu.eval.thresholds import decode_events_per_class

    rng = np.random.default_rng(3)
    probs = rng.random((4, 54, 3)).astype(np.float32)
    codec = LabelCodec(CLASSES, n_frames=54)
    names = [f"f{i}.wav" for i in range(4)]
    a = decode_batch(probs, names, codec, threshold=0.5, median_window=5)
    b = decode_events_per_class(probs, names, codec, 44100, 511, 8, 0.5, 5)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def _tuner_fixture():
    """3 classes engineered so per-class tuning must diverge from 0.5/5:
      * Cat: clean margin (0.7 in-event / 0.3 outside) — default already
        perfect, tuning must not hurt;
      * Dog: weak detector (0.45 in-event) — invisible at 0.5, perfectly
        recoverable below it;
      * Speech: one event with a 2-frame dropout — window 3 splits it
        (fragment offsets blow the collar), window >=5 heals it.
    Groundtruth is produced by decoding the CLEAN binary grids through the
    same grids_to_dataframe, so frame→second conventions cancel."""
    T = 54
    probs = np.zeros((3, T, 3), np.float32)
    truth = np.zeros((3, T, 3), np.float32)
    for b in range(3):
        truth[b, 10:21, 0] = 1
        probs[b, :, 0] = 0.3
        probs[b, 10:21, 0] = 0.7
        truth[b, 30:41, 1] = 1
        probs[b, :, 1] = 0.05
        probs[b, 30:41, 1] = 0.45
        truth[b, 10:31, 2] = 1
        probs[b, 10:31, 2] = 0.8
        # hard 2-frame dropout: no threshold can bridge it (0.0 clears no
        # grid point), only a window >=5 median heals it
        probs[b, 19:21, 2] = 0.0
    codec = LabelCodec(CLASSES, n_frames=T)
    names = [f"f{i}.wav" for i in range(3)]
    gt = grids_to_dataframe(truth, names, codec, 44100, 511, 8)
    return probs, names, gt, codec


def test_tune_event_thresholds_recovers_per_class_operating_points():
    from dcase2019_task4_tpu.eval.thresholds import tune_event_thresholds

    probs, names, gt, codec = _tuner_fixture()
    res = tune_event_thresholds(
        probs, names, gt, codec, median_windows=(3, 5, 7)
    )
    th, win, f1 = res["thresholds"], res["windows"], res["f1"]
    # Cat: already perfect at default; tuned must stay perfect
    assert f1[0] == 1.0
    # Dog: the whole point — sub-0.5 threshold recovers the class from 0
    assert res["default_f1"][1] == 0.0
    assert th[1] < 0.45 and f1[1] == 1.0
    # Speech: needs the median window to heal the 2-frame dropout
    assert win[2] >= 5 and f1[2] == 1.0
    # the macro of the applied per-class vector equals the per-class bests
    # (class channels are independent through the decode chain)
    assert res["macro_f1"] == np.mean(f1)
    assert res["macro_f1"] > res["default_macro_f1"]


def test_tune_event_thresholds_reported_macro_is_applied_not_theoretical():
    """macro_f1 must come from a real re-decode with the tuned vectors, so
    tuning on one set and applying elsewhere has an honest reference point."""
    from dcase2019_task4_tpu.eval.thresholds import (
        decode_events_per_class,
        tune_event_thresholds,
    )
    from dcase2019_task4_tpu.eval.sed_scores import event_based_metrics

    probs, names, gt, codec = _tuner_fixture()
    res = tune_event_thresholds(probs, names, gt, codec, median_windows=(3, 5))
    df = decode_events_per_class(
        probs, names, codec, 44100, 511, 8, res["thresholds"], res["windows"]
    )
    m = event_based_metrics(gt, df)
    macro = np.mean([
        m.counts[c].f_measure if c in m.counts else 0.0 for c in codec.labels
    ])
    assert res["macro_f1"] == macro


def test_per_class_median_windows_match_scalar_columns():
    """A per-class window vector equals column-wise scalar-window decodes
    (and equals scipy's median_filter per column) — the consumption path
    for tune_event_thresholds' persisted windows."""
    from scipy.ndimage import median_filter

    rng = np.random.default_rng(11)
    probs = rng.uniform(size=(3, 40, 4)).astype(np.float32)
    th = np.asarray([0.3, 0.5, 0.6, 0.4])
    wins = np.asarray([3, 5, 7, 5])
    out = np.asarray(binarize_and_median(jnp.asarray(probs), th, wins))
    for c, w in enumerate(wins):
        scalar = np.asarray(
            binarize_and_median(jnp.asarray(probs), th, int(w))
        )[..., c]
        np.testing.assert_array_equal(out[..., c], scalar)
        ref = median_filter(
            (probs[..., c] > th[c]).astype(np.float32), size=(1, int(w))
        )
        np.testing.assert_array_equal(out[..., c], ref)


def test_per_class_median_windows_validation():
    import pytest

    probs = jnp.zeros((1, 8, 2))
    with pytest.raises(AssertionError, match="odd"):
        binarize_and_median(probs, 0.5, np.asarray([3, 4]))
    with pytest.raises(AssertionError, match="classes"):
        binarize_and_median(probs, 0.5, np.asarray([3, 5, 7]))
