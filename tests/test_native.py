"""Native C++ audio batcher tests: parity with the Python reference path
(scipy wav read + ops/mel.host_reflect_pad + int16 quantize)."""

import numpy as np
import pytest

from dcase2019_task4_tpu.data.audio_io import write_wav
from dcase2019_task4_tpu.data.pipeline import quantize_audio_int16
from dcase2019_task4_tpu.ops.mel import host_reflect_pad
from dcase2019_task4_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")

SR, NFFT, HOP = 44100, 2048, 511


def _make_wavs(tmp_path, lengths, stereo=False, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i, n in enumerate(lengths):
        a = (rng.standard_normal((n, 2) if stereo else n) * 0.1).astype(np.float32)
        p = str(tmp_path / f"clip{i}.wav")
        write_wav(p, a, SR)
        paths.append(p)
    return paths


def test_decode_matches_scipy(tmp_path):
    [p] = _make_wavs(tmp_path, [5000])
    samples, sr, err = native.decode_wav(p, SR)
    assert err == "" and sr == SR and len(samples) == 5000
    from scipy.io import wavfile

    _, ref = wavfile.read(p)
    np.testing.assert_array_equal(samples, ref)


def test_decode_stereo_mono_mix(tmp_path):
    [p] = _make_wavs(tmp_path, [1000], stereo=True)
    samples, sr, err = native.decode_wav(p, SR)
    assert err == ""
    from scipy.io import wavfile

    _, ref = wavfile.read(p)
    # float mean + round-half-even, like the Python float mono-mix
    mix = np.round(ref.astype(np.float64).mean(axis=1)).astype(np.int16)
    np.testing.assert_array_equal(samples, mix)


def test_pack_batch_matches_python_path(tmp_path):
    max_samples = 44100
    lengths = [44100, 20000, 44100 + 7000]  # exact, short, long
    paths = _make_wavs(tmp_path, lengths, seed=1)
    audio, frames, errors = native.pack_batch(paths, max_samples, NFFT, HOP, SR)
    assert errors == ["", "", ""]
    # python reference path
    from scipy.io import wavfile

    clips = []
    for p in paths:
        _, d = wavfile.read(p)
        clips.append(d.astype(np.float32) / 32768.0)
    ref_padded, ref_frames = host_reflect_pad(clips, max_samples, NFFT, HOP, 1 + max_samples // HOP)
    ref_audio = quantize_audio_int16(ref_padded)
    np.testing.assert_array_equal(frames, ref_frames)
    np.testing.assert_array_equal(audio, ref_audio)


def test_pack_batch_missing_file(tmp_path):
    paths = _make_wavs(tmp_path, [1000]) + [str(tmp_path / "missing.wav")]
    audio, frames, errors = native.pack_batch(paths, 44100, NFFT, HOP, SR)
    assert errors[0] == "" and errors[1] != ""
    assert (audio[1] == 0).all() and frames[1] == 0


def test_pack_batch_rejects_wrong_rate(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "wrong_sr.wav")
    write_wav(p, rng.standard_normal(1000).astype(np.float32) * 0.1, 16000)
    _, _, errors = native.pack_batch([p], 44100, NFFT, HOP, SR)
    assert "sample rate mismatch" in errors[0]


def test_batch_pipeline_uses_native_and_matches_python(tmp_path):
    from dcase2019_task4_tpu.config import Config, DSPConfig
    from dcase2019_task4_tpu.data.encoder import LabelCodec
    from dcase2019_task4_tpu.data.manifests import manifest_from_df
    from dcase2019_task4_tpu.data.pipeline import BatchPipeline, Stream
    from dcase2019_task4_tpu.data.audio_io import WavAudioSource
    import pandas as pd

    cfg = Config(dsp=DSPConfig(max_len_seconds=1.0))
    d = cfg.dsp
    paths = _make_wavs(tmp_path, [d.max_samples, d.max_samples // 2, d.max_samples], seed=3)
    names = [p.split("/")[-1] for p in paths]
    df = pd.DataFrame({"filename": names})
    m = manifest_from_df(df)
    codec = LabelCodec(cfg.classes, n_frames=d.max_frames // 8)
    src = WavAudioSource(str(tmp_path), d.sample_rate)
    stream = Stream("w", m, src, codec, d.sample_rate, d.hop_length, 8)
    bp = BatchPipeline([stream], [3], d.max_samples, d.n_window, d.hop_length, d.max_frames)
    pairs = np.array([[0, 0], [0, 1], [0, 2]])
    batch_native = bp.assemble(pairs)
    # force python path
    bp2 = BatchPipeline([stream], [3], d.max_samples, d.n_window, d.hop_length, d.max_frames)
    bp2._native_paths = lambda pairs: None
    batch_py = bp2.assemble(pairs)
    np.testing.assert_array_equal(batch_native["audio"], batch_py["audio"])
    np.testing.assert_array_equal(batch_native["frames"], batch_py["frames"])
