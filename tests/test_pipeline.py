"""Pipeline tests: int16 quantization, device prefetch, eval batching,
stream packing."""

import numpy as np

from dcase2019_task4_tpu.config import Config, DSPConfig, ModelConfig, TrainConfig
from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.data.manifests import load_manifest, subpart_manifest
from dcase2019_task4_tpu.data.audio_io import SyntheticAudioSource, synth_clip
from dcase2019_task4_tpu.data.pipeline import (
    BatchPipeline,
    Stream,
    device_prefetch,
    iter_eval_batches,
    quantize_audio_int16,
)

CFG = Config(dsp=DSPConfig(max_len_seconds=1.0))
D = CFG.dsp


def test_quantize_roundtrip_pcm16_exact():
    # values that originated as 16-bit PCM round-trip exactly
    pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
    f = pcm.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(quantize_audio_int16(f), pcm)


def test_quantize_clips_overrange():
    q = quantize_audio_int16(np.array([1.5, -1.5], np.float32))
    np.testing.assert_array_equal(q, [32767, -32768])


def test_device_prefetch_order_and_completeness():
    batches = [{"x": np.full((2,), i, np.float32)} for i in range(7)]
    out = [int(np.asarray(b["x"])[0]) for b in device_prefetch(iter(batches), depth=3)]
    assert out == list(range(7))


def test_device_prefetch_short_iterator():
    batches = [{"x": np.zeros(1)}]
    assert len(list(device_prefetch(iter(batches), depth=4))) == 1


def _stream(n=5):
    m = subpart_manifest(load_manifest(CFG.paths.synthetic), n)
    src = SyntheticAudioSource(m, CFG.classes, D.sample_rate, D.max_len_seconds)
    codec = LabelCodec(CFG.classes, n_frames=D.max_frames // 8)
    return Stream("s", m, src, codec, D.sample_rate, D.hop_length, 8, cache_audio=True)


def test_eval_batches_pad_last():
    s = _stream(5)
    batches = list(iter_eval_batches(s, 4, D.max_samples, D.n_window, D.hop_length, D.max_frames))
    assert len(batches) == 2
    assert batches[0]["n_valid"] == 4 and batches[1]["n_valid"] == 1
    assert batches[1]["audio"].shape[0] == 4  # fixed shape, repeated tail
    assert len(batches[1]["filenames"]) == 1
    assert batches[0]["audio"].dtype == np.int16


def test_batch_pipeline_layout_and_dtype():
    s1, s2 = _stream(6), _stream(6)
    bp = BatchPipeline([s1, s2], [2, 2], D.max_samples, D.n_window, D.hop_length, D.max_frames)
    batch = next(bp.iter_epoch(0, prefetch=0))
    assert batch["audio"].shape == (4, D.max_samples + D.n_window)
    assert batch["audio"].dtype == np.int16
    assert batch["target"].shape[0] == 4
    assert batch["frames"].max() <= D.max_frames


def test_synth_clip_deterministic_and_class_dependent():
    a1 = synth_clip("f.wav", [(0, 0.1, 0.5)], 1.0, 8000)
    a2 = synth_clip("f.wav", [(0, 0.1, 0.5)], 1.0, 8000)
    b = synth_clip("f.wav", [(3, 0.1, 0.5)], 1.0, 8000)
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b)
    assert len(a1) == 8000


def test_synth_clip_variability_zero_is_bit_identical():
    """variability=0 must not perturb the round-3 deterministic source at
    all (the golden-pinned tests and the round-3 ablation record depend on
    it) — every nuisance RNG draw is gated."""
    a = synth_clip("g.wav", [(2, 0.2, 0.8)], 1.0, 8000)
    a0 = synth_clip("g.wav", [(2, 0.2, 0.8)], 1.0, 8000, variability=0.0)
    np.testing.assert_array_equal(a, a0)


def test_synth_clip_variability_adds_nuisance_not_label_drift():
    """With variability>0: per-clip renders stay deterministic, different
    clips of the SAME class differ in gain/noise floor/timbre (the nuisance
    the consistency term must smooth over), and the event's labeled span
    still carries the energy (ground truth untouched)."""
    evs = [(4, 0.25, 0.75)]
    a1 = synth_clip("v1.wav", evs, 1.0, 8000, variability=1.0)
    a1b = synth_clip("v1.wav", evs, 1.0, 8000, variability=1.0)
    a2 = synth_clip("v2.wav", evs, 1.0, 8000, variability=1.0)
    np.testing.assert_array_equal(a1, a1b)  # deterministic per filename
    # nuisance spread: same class+span, different clips → different render
    # statistics (noise floor measured outside the event span)
    floor1 = np.std(a1[:int(0.2 * 8000)])
    floor2 = np.std(a2[:int(0.2 * 8000)])
    assert abs(np.log(floor1 / floor2)) > 0.05
    # the labeled event span still carries clearly more energy than the
    # background across clips (individual clips may draw a low gain or a
    # high noise floor — that's the nuisance — but on average the label
    # stays learnable)
    ratios = []
    for name in ("v1.wav", "v2.wav", "v3.wav", "v4.wav"):
        a = synth_clip(name, evs, 1.0, 8000, variability=1.0)
        ev_rms = np.sqrt(np.mean(a[2000:6000] ** 2))
        bg_rms = np.sqrt(np.mean(a[:2000] ** 2))
        ratios.append(ev_rms / bg_rms)
    assert np.mean(ratios) > 1.5, ratios


def test_synthetic_source_variability_plumbed():
    m = subpart_manifest(load_manifest(CFG.paths.synthetic), 3)
    s0 = SyntheticAudioSource(m, CFG.classes, 8000, 1.0)
    sv = SyntheticAudioSource(m, CFG.classes, 8000, 1.0, variability=1.0)
    f = m.filenames[0]
    assert not np.allclose(s0.get_audio(f), sv.get_audio(f))
    np.testing.assert_array_equal(sv.get_audio(f), sv.get_audio(f))


def test_multihost_shards_reassemble_global_batch_bitwise():
    """Two simulated hosts, each running its own BatchPipeline with the
    shared seed, must together reproduce the single-host shard-major global
    batch BIT-FOR-BIT when their shards are concatenated in process order —
    the invariant the --multihost path relies on (every host samples
    identically and materializes only its cut; parallel/multihost.py)."""
    streams = [_stream(8), _stream(8)]
    kw = dict(
        max_samples=D.max_samples, n_fft=D.n_window, hop_length=D.hop_length,
        max_frames=D.max_frames, seed=3, n_shards=4,
    )
    global_bp = BatchPipeline(streams, [2, 2], **kw)
    host_bps = [
        BatchPipeline(streams, [2, 2], process_index=p, process_count=2, **kw)
        for p in range(2)
    ]
    for epoch in range(2):
        g_iter = global_bp.iter_epoch(epoch, prefetch=0)
        h_iters = [bp.iter_epoch(epoch, prefetch=0) for bp in host_bps]
        for gb in g_iter:
            hbs = [next(it) for it in h_iters]
            for k in ("audio", "frames", "target"):
                np.testing.assert_array_equal(
                    np.concatenate([hb[k] for hb in hbs]), gb[k], err_msg=k
                )
        for it in h_iters:
            try:
                next(it)
                raise AssertionError("host iterator longer than global")
            except StopIteration:
                pass


def test_multihost_requires_divisible_devices():
    import pytest

    with pytest.raises(AssertionError):
        BatchPipeline(
            [_stream(4)], [2], D.max_samples, D.n_window, D.hop_length,
            D.max_frames, n_shards=4, process_count=3,
        )


def test_synth_clip_nuisance_band_identity_and_restriction():
    """nuisance_band (audio_io.synth_clip): None and the full (0,1) band are
    BIT-identical to the unbanded render; narrow bands change the waveform
    but stay draw-aligned (same RNG consumption) and leave event support
    untouched; disjoint narrow bands give distinct renders (the shift the
    nuisance-shift ablation relies on)."""
    evs = [(1, 0.2, 0.6), (4, 0.5, 0.9)]
    full = synth_clip("nb.wav", evs, 1.0, 8000, variability=1.0)
    assert np.array_equal(
        full, synth_clip("nb.wav", evs, 1.0, 8000, variability=1.0,
                         nuisance_band=(0.0, 1.0)))
    lo = synth_clip("nb.wav", evs, 1.0, 8000, variability=1.0,
                    nuisance_band=(0.0, 0.2))
    mid = synth_clip("nb.wav", evs, 1.0, 8000, variability=1.0,
                     nuisance_band=(0.4, 0.6))
    hi = synth_clip("nb.wav", evs, 1.0, 8000, variability=1.0,
                    nuisance_band=(0.8, 1.0))
    assert not np.array_equal(lo, mid) and not np.array_equal(mid, hi)
    # event support is identical in every band — nuisance never moves
    # labels (events always add energy over the same clip's noise floor;
    # the MARGIN shrinks in high bands where clip_noise ~ exp(z) outgrows
    # clip_gain ~ exp(z/2), so assert energy increase, not a fixed SNR)
    for band_clip in (lo, mid, hi):
        silent = band_clip[: int(0.15 * 8000)]
        active = band_clip[int(0.25 * 8000) : int(0.55 * 8000)]
        assert np.std(active) > 1.2 * np.std(silent)
    # the quantile ordering survives the render: the hi band's noise floor
    # (clip_noise = base·exp(v·z), z banded) is louder than the lo band's
    assert np.std(hi[: int(0.15 * 8000)]) > np.std(lo[: int(0.15 * 8000)])


def test_synth_clip_nuisance_band_validation():
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        synth_clip("x.wav", [], 1.0, 8000, variability=1.0,
                   nuisance_band=(0.7, 0.3))


def test_experiment_synthetic_bands_plumbed_per_stream():
    """Labeled train streams get the band, unlabeled + validation streams
    keep the full band (the nuisance-shift layout)."""
    from dcase2019_task4_tpu.train.experiment import Experiment

    tiny = Config(
        dsp=DSPConfig(max_len_seconds=1.0),
        model=ModelConfig(nclass=10, nb_filters=(16, 16, 16), n_rnn_cell=16),
        train=TrainConfig(batch_size=8, n_epoch=1, num_prefetch=1),
    )
    exp = Experiment(
        tiny, mean_teacher=True, subpart_data=12, synthetic_audio=True,
        synthetic_variability=1.0,
        synthetic_bands={"weak": (0.4, 0.6), "synthetic": (0.4, 0.6)},
    ).build()
    bands = {s.name: s.source.nuisance_band for s in exp.pipeline.streams}
    assert bands["weak"] == (0.4, 0.6)
    assert bands["synthetic"] == (0.4, 0.6)
    assert bands["unlabeled"] is None
    assert exp.valid_synth_stream.source.nuisance_band is None
    assert exp.valid_weak_stream.source.nuisance_band is None


def _paired_stream(n=5, name="s"):
    m = subpart_manifest(load_manifest(CFG.paths.synthetic), n)
    kw = dict(sample_rate=D.sample_rate, duration=D.max_len_seconds,
              variability=1.0)
    src = SyntheticAudioSource(m, CFG.classes, **kw)
    src2 = SyntheticAudioSource(m, CFG.classes, seed_salt="desed-synth/v2", **kw)
    codec = LabelCodec(CFG.classes, n_frames=D.max_frames // 8)
    return Stream(name, m, src, codec, D.sample_rate, D.hop_length, 8,
                  cache_audio=True, source2=src2)


def test_paired_view_batches_and_device_cache_rows():
    """Paired-teacher-view mode: batches carry an "audio2" second view —
    same shape/frames, different waveform (independent nuisance render of
    the SAME events) — and the device-resident store's gathered rows equal
    the streamed pack bit-exactly for both views."""
    from dcase2019_task4_tpu.data.pipeline import DeviceResidentData

    s = _paired_stream(6)
    bp = BatchPipeline([s], [4], D.max_samples, D.n_window, D.hop_length, D.max_frames)
    assert bp.paired_views
    batch = next(bp.iter_epoch(0, prefetch=0))
    assert batch["audio2"].shape == batch["audio"].shape
    assert batch["audio2"].dtype == np.int16
    assert np.any(batch["audio2"] != batch["audio"])  # a distinct render
    # same labels → same targets; view-2 length == view-1 length → frames eq
    a2 = s.source2.get_audio(s.filenames[0])
    a1 = s.source.get_audio(s.filenames[0])
    assert a1.shape == a2.shape and np.any(a1 != a2)

    drd = DeviceResidentData(bp)
    assert "audio2" in drd.data
    idx = drd.epoch_indices(bp.sampler, 0)
    np.testing.assert_array_equal(np.asarray(drd.data["audio"])[idx[0]], batch["audio"])
    np.testing.assert_array_equal(np.asarray(drd.data["audio2"])[idx[0]], batch["audio2"])
    np.testing.assert_array_equal(np.asarray(drd.data["target"])[idx[0]], batch["target"])


def test_paired_view_all_or_none():
    s1 = _paired_stream(4, "a")
    m = subpart_manifest(load_manifest(CFG.paths.synthetic), 4)
    src = SyntheticAudioSource(m, CFG.classes, D.sample_rate, D.max_len_seconds)
    codec = LabelCodec(CFG.classes, n_frames=D.max_frames // 8)
    s2 = Stream("b", m, src, codec, D.sample_rate, D.hop_length, 8)
    import pytest

    with pytest.raises(AssertionError, match="all-streams-or-none"):
        BatchPipeline([s1, s2], [2, 2], D.max_samples, D.n_window, D.hop_length,
                      D.max_frames)


def test_log_mel_pair_teacher_view_swaps_audio():
    """With noise_std=0 the paired-view teacher features equal log_mel of
    the second view exactly, and the student's stay on the first."""
    import jax
    import jax.numpy as jnp

    from dcase2019_task4_tpu.ops.mel import MelFrontend

    fe = MelFrontend(sample_rate=16000, n_window=32, hop_length=12, n_mels=8,
                     f_min=0.0, f_max=8000.0, max_frames=8, stft_mode="chunked")
    rng = np.random.default_rng(3)
    a1 = jnp.asarray((rng.standard_normal((2, 150)) * 9000).astype(np.int16))
    a2 = jnp.asarray((rng.standard_normal((2, 150)) * 9000).astype(np.int16))
    frames = jnp.asarray([8, 6])
    st, te = fe.log_mel_pair(a1, frames, jax.random.PRNGKey(0), 0.0,
                             teacher_padded=a2)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(fe.log_mel(a1, frames)))
    np.testing.assert_array_equal(np.asarray(te), np.asarray(fe.log_mel(a2, frames)))
    assert np.any(np.asarray(st) != np.asarray(te))
