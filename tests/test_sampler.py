"""Multi-stream batch sampler tests (reference MultiStreamBatchSampler,
DataLoad.py:539-577)."""

import numpy as np
import pytest

from dcase2019_task4_tpu.data.sampler import MultiStreamSampler


def test_epoch_length_min_over_streams():
    s = MultiStreamSampler([100, 200, 50], [6, 12, 6])
    # DataLoad.py:573-577: min(len_i // bs_i) = min(16, 16, 8)
    assert len(s) == 8


def test_batch_layout_static_slices():
    s = MultiStreamSampler([100, 200, 50], [6, 12, 6])
    sl = s.stream_slices()
    assert sl == [slice(0, 6), slice(6, 18), slice(18, 24)]
    batches = s.epoch_batches(epoch=0)
    assert batches.shape == (8, 24, 2)
    # stream ids fixed per column
    assert (batches[:, :6, 0] == 0).all()
    assert (batches[:, 6:18, 0] == 1).all()
    assert (batches[:, 18:, 0] == 2).all()


def test_no_repeats_within_epoch():
    s = MultiStreamSampler([100, 200, 50], [6, 12, 6])
    b = s.epoch_batches(epoch=3)
    for stream, lo, hi in [(0, 0, 6), (1, 6, 18), (2, 18, 24)]:
        idx = b[:, lo:hi, 1].ravel()
        assert len(np.unique(idx)) == len(idx)
        assert idx.max() < s.stream_sizes[stream]


def test_deterministic_across_calls_but_differs_by_epoch():
    s = MultiStreamSampler([100, 200, 50], [6, 12, 6], seed=7)
    np.testing.assert_array_equal(s.epoch_batches(0), s.epoch_batches(0))
    assert not np.array_equal(s.epoch_batches(0), s.epoch_batches(1))


def test_mismatched_streams_raises():
    with pytest.raises(AssertionError):
        MultiStreamSampler([10, 10], [4])
