"""Label codec unit tests: weak/strong encode, decode round trips, frame math.

Golden values follow the reference semantics of ManyHotEncoder
(utils/utils.py:22-172) and the sec↔frame arithmetic of main.py:227-228 /
evaluation_measures.py:226-227.
"""

import numpy as np
import pytest

from dcase2019_task4_tpu.data.encoder import (
    LabelCodec,
    events_to_frames,
    frames_to_seconds,
)

CLASSES = ["Cat", "Dog", "Speech"]


def test_encode_weak_khot():
    c = LabelCodec(CLASSES)
    np.testing.assert_array_equal(c.encode_weak(["Dog", "Cat"]), [1, 1, 0])
    np.testing.assert_array_equal(c.encode_weak([]), [0, 0, 0])


def test_encode_weak_empty_sentinel():
    c = LabelCodec(CLASSES)
    np.testing.assert_array_equal(c.encode_weak("empty"), [-1, -1, -1])


def test_encode_strong_events():
    c = LabelCodec(CLASSES, n_frames=10)
    y = c.encode_strong([("Dog", 2, 5), ("Speech", 0, 10)])
    assert y.shape == (10, 3)
    np.testing.assert_array_equal(y[:, 0], np.zeros(10))
    np.testing.assert_array_equal(y[:, 1], [0, 0, 1, 1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(y[:, 2], np.ones(10))


def test_encode_strong_weak_as_strong():
    # weak labels via the strong encoder activate every frame (utils.py:108-113)
    c = LabelCodec(CLASSES, n_frames=4)
    y = c.encode_strong(["Cat"])
    np.testing.assert_array_equal(y[:, 0], np.ones(4))
    np.testing.assert_array_equal(y[:, 1:], np.zeros((4, 2)))


def test_encode_strong_empty_sentinel():
    c = LabelCodec(CLASSES, n_frames=4)
    np.testing.assert_array_equal(c.encode_strong("empty"), np.full((4, 3), -1.0))


def test_decode_strong_roundtrip():
    c = LabelCodec(CLASSES, n_frames=12)
    events = [("Cat", 0, 3), ("Cat", 6, 9), ("Dog", 2, 12)]
    decoded = c.decode_strong(c.encode_strong(events))
    assert decoded == events


def test_decode_strong_batch_matches_single():
    rng = np.random.default_rng(0)
    c = LabelCodec(CLASSES, n_frames=20)
    grids = (rng.random((7, 20, 3)) > 0.6).astype(np.float32)
    batched = c.decode_strong_batch(grids)
    for b in range(7):
        assert batched[b] == c.decode_strong(grids[b])


def test_events_to_frames_reference_arithmetic():
    # main.py:227-228: onset * 44100 // 511 // 8
    on, off = events_to_frames([1.0], [2.5], 44100, 511, 8)
    assert on[0] == int(1.0 * 44100 // 511 // 8)
    assert off[0] == int(2.5 * 44100 // 511 // 8)


def test_frames_to_seconds_reference_arithmetic():
    # evaluation_measures.py:226-227: frames * 8 / (44100/511)
    sec = frames_to_seconds([10], 44100, 511, 8)
    assert sec[0] == pytest.approx(10 * 8 / (44100 / 511))


def test_state_dict_roundtrip():
    c = LabelCodec(CLASSES, n_frames=108)
    c2 = LabelCodec.load_state_dict(c.state_dict())
    assert c2.labels == c.labels and c2.n_frames == 108
