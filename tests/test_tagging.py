"""Weak tagging F1 tests (reference evaluation_measures.py:19-102,185-200,
259-294)."""

import numpy as np
import pandas as pd

from dcase2019_task4_tpu.eval.tagging import (
    TaggingF1,
    audio_tagging_results,
    binarize,
    confusion_counts,
    macro_f_measure,
)


def test_confusion_counts():
    ref = np.array([[1, 0, 1], [0, 1, 0]])
    est = np.array([[1, 1, 0], [0, 1, 0]])
    tp, fp, fn, tn = confusion_counts(ref, est)
    np.testing.assert_array_equal(tp, [1, 1, 0])
    np.testing.assert_array_equal(fp, [0, 1, 0])
    np.testing.assert_array_equal(fn, [0, 0, 1])
    np.testing.assert_array_equal(tn, [1, 0, 1])


def test_macro_f_zero_when_no_support():
    f = macro_f_measure(np.zeros(3), np.zeros(3), np.zeros(3))
    np.testing.assert_array_equal(f, np.zeros(3))


def test_binarize_per_class_thresholds():
    p = np.array([[0.4, 0.6]])
    np.testing.assert_array_equal(binarize(p, [0.3, 0.7]), [[1, 0]])


def test_tagging_f1_streaming():
    acc = TaggingF1(2)
    acc.update(np.array([[0.9, 0.1]]), np.array([[1, 0]]))
    acc.update(np.array([[0.2, 0.8]]), np.array([[1, 1]]))
    # class 0: tp=1, fn=1 → F=2/3; class 1: tp=1 → F=1
    np.testing.assert_allclose(acc.per_class_f1(), [2 / 3, 1.0])


def test_tagging_update_from_strong_grid_targets():
    acc = TaggingF1(2)
    target = np.zeros((1, 4, 2))
    target[0, 2, 0] = 1.0  # active anywhere in time → weak positive
    acc.update(np.array([[0.9, 0.1]]), target)
    np.testing.assert_allclose(acc.per_class_f1(), [1.0, 0.0])


def test_audio_tagging_results_df():
    ref = pd.DataFrame(
        [("a.wav", 0.0, 1.0, "Dog"), ("b.wav", 0.0, 1.0, "Cat")],
        columns=["filename", "onset", "offset", "event_label"],
    )
    est = pd.DataFrame(
        [("a.wav", 0.0, 1.0, "Dog")],
        columns=["filename", "onset", "offset", "event_label"],
    )
    res = audio_tagging_results(ref, est)
    assert res["Dog"] == 1.0
    assert res["Cat"] == 0.0
