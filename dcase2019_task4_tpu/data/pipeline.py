"""Host→device data pipeline: packed streams, batch assembly, prefetch.

Replaces the reference's DataLoadDf + transforms + torch DataLoader chain
(DataLoad.py:25-154,157-380) with an explicit design for TPUs:

  * labels for each stream are packed ONCE into a dense [N, T', C] array
    (Manifest.encode_targets) — the hot path is pure array gathers;
  * audio is reflect-padded on the host into fixed [B, L+n_fft] buffers
    (exact librosa center-pad semantics per clip) and featurized on device
    inside the jitted step — no .npy cache, no per-sample Python transforms;
  * a double-buffered background thread overlaps host assembly with device
    compute.

An LRU-less in-memory audio cache is optional (`cache_audio=True`): the
DESED training set at 44.1 kHz f32 is ~32 GB so the default streams from
the source; synthetic runs and subpart runs fit easily.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.data.manifests import Manifest
from dcase2019_task4_tpu.data.sampler import MultiStreamSampler
from dcase2019_task4_tpu.ops.mel import host_reflect_pad


def quantize_audio_int16(audio: np.ndarray) -> np.ndarray:
    """f32 [-1, 1] → int16 PCM for the host→device link (half the bytes;
    bit-exact round trip for audio that originated as 16-bit wav)."""
    return np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)


def device_prefetch(batch_iter, depth: int = 2, sharding=None, put_fn=None):
    """Asynchronously jax.device_put `depth` batches ahead so host→device
    transfer overlaps device compute (the TPU analogue of the reference's
    DataLoader worker prefetch — which it configures but never enables,
    SURVEY.md §2.3 'num_workers defined but not passed'). With `sharding`,
    batches land pre-sharded over the mesh; `put_fn` overrides the transfer
    entirely (multi-host: parallel.multihost.make_global_batch assembles
    per-host shards into global arrays)."""
    import collections

    import jax

    def put(b):
        if put_fn is not None:
            return put_fn(b)
        return jax.device_put(b, sharding) if sharding is not None else jax.device_put(b)

    buf = collections.deque()
    it = iter(batch_iter)
    try:
        while len(buf) < depth:
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class Stream:
    """One data stream (weak / unlabeled / synthetic): filenames, packed
    targets, audio source."""

    def __init__(self, name: str, manifest: Manifest, source, codec: LabelCodec,
                 sample_rate: int, hop_length: int, pooling_time_ratio: int,
                 cache_audio: bool = False, source2=None):
        self.name = name
        self.manifest = manifest
        self.filenames = list(manifest.filenames)
        self.source = source
        # optional second VIEW of every clip (same labels, independent
        # nuisance render) — the paired-teacher-view consistency mode
        self.source2 = source2
        self.targets = manifest.encode_targets(codec, sample_rate, hop_length, pooling_time_ratio)
        self._cache: Optional[dict] = {} if cache_audio else None
        self._cache2: Optional[dict] = {} if cache_audio else None

    def __len__(self):
        return len(self.filenames)

    def get_audio(self, idx: int) -> np.ndarray:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        a = self.source.get_audio(self.filenames[idx])
        if self._cache is not None:
            self._cache[idx] = a
        return a

    def get_audio2(self, idx: int) -> np.ndarray:
        assert self.source2 is not None, f"stream {self.name} has no view-2 source"
        if self._cache2 is not None and idx in self._cache2:
            return self._cache2[idx]
        a = self.source2.get_audio(self.filenames[idx])
        if self._cache2 is not None:
            self._cache2[idx] = a
        return a


class BatchPipeline:
    """Assembles [weak | unlabeled | synthetic] batches for the jitted step.

    Batch layout follows the reference's MultiStreamBatchSampler composition
    (main.py:238-247): contiguous per-stream sub-batches so loss masks are
    static slices.
    """

    def __init__(
        self,
        streams: Sequence[Stream],
        batch_sizes: Sequence[int],
        max_samples: int,
        n_fft: int,
        hop_length: int,
        max_frames: int,
        seed: int = 0,
        n_shards: int = 1,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """`batch_sizes` are PER-SHARD sub-batch sizes; the global batch is
        that layout tiled `n_shards` times and reordered shard-major (each
        contiguous 1/n_shards chunk is a full [weak | unlabeled | synthetic]
        per-device layout) so a leading-axis sharding over the mesh gives
        every device the same stream mix and the shard-local loss slices from
        `stream_slices()` line up (parallel.mesh.interleave_for_sharding).

        Multi-host: with `process_count > 1`, every host runs the SAME
        sampler (shared seed — zero coordination traffic) but `assemble`
        materializes only this host's contiguous 1/process_count cut of the
        shard-major global batch (parallel.multihost.host_shard_pairs);
        the concatenation of all hosts' batches in process order is
        bit-identical to the single-host global batch. `n_shards` stays the
        GLOBAL device count."""
        self.streams = list(streams)
        self.per_shard_sizes = list(batch_sizes)
        self.n_shards = n_shards
        self.process_index = process_index
        self.process_count = process_count
        assert n_shards % process_count == 0, (
            f"global device count {n_shards} not divisible by {process_count} hosts"
        )
        self.sampler = MultiStreamSampler(
            [len(s) for s in streams], [b * n_shards for b in batch_sizes], seed
        )
        self.max_samples = max_samples
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.max_frames = max_frames
        # paired-teacher-view mode: every training stream carries a second
        # independently-rendered view; batches gain an "audio2" array the
        # step's teacher pass featurizes instead of the student's audio
        self.paired_views = all(s.source2 is not None for s in self.streams) \
            and len(self.streams) > 0
        assert self.paired_views or not any(
            s.source2 is not None for s in self.streams
        ), "paired views must be all-streams-or-none (mixed batches would " \
           "silently hand some teacher rows the student view)"

    def __len__(self):
        return len(self.sampler)

    @property
    def batch_size(self):
        return self.sampler.batch_size

    def stream_slices(self):
        """PER-SHARD stream slices (== global slices when n_shards == 1)."""
        slices, start = [], 0
        for b in self.per_shard_sizes:
            slices.append(slice(start, start + b))
            start += b
        return slices

    def assemble(self, pairs: np.ndarray) -> Dict[str, np.ndarray]:
        """pairs: [batch, 2] of (stream_id, idx) → batch dict (int16 audio).

        Uses the C++ batch packer (native/wavpack.cpp) when every clip is a
        plain wav file; files it can't handle (resampling, exotic codecs)
        fall back to the Python path row by row."""
        if self.n_shards > 1:
            from dcase2019_task4_tpu.parallel.mesh import interleave_for_sharding

            pairs = interleave_for_sharding(pairs, self.per_shard_sizes, self.n_shards)
        if self.process_count > 1:
            from dcase2019_task4_tpu.parallel.multihost import host_shard_pairs

            pairs = host_shard_pairs(pairs, self.process_index, self.process_count)
        audio, frames = self._pack_audio(pairs)
        targets = np.stack([self.streams[s].targets[i] for s, i in pairs])
        batch = {"audio": audio, "frames": frames, "target": targets}
        if self.paired_views:
            clips = [self.streams[s].get_audio2(i) for s, i in pairs]
            padded, _ = host_reflect_pad(
                clips, self.max_samples, self.n_fft, self.hop_length,
                self.max_frames,
            )
            batch["audio2"] = quantize_audio_int16(padded)
        return batch

    def _pack_audio(self, pairs):
        native_paths = self._native_paths(pairs)
        if native_paths is not None:
            from dcase2019_task4_tpu import native

            audio, frames, errors = native.pack_batch(
                native_paths, self.max_samples, self.n_fft, self.hop_length, 44100
            )
            audio = np.array(audio)  # writable (frombuffer is read-only)
            bad = [k for k, e in enumerate(errors) if e]
            if bad:
                clips = [self.streams[pairs[k][0]].get_audio(pairs[k][1]) for k in bad]
                padded, f2 = host_reflect_pad(
                    clips, self.max_samples, self.n_fft, self.hop_length, self.max_frames
                )
                audio[bad] = quantize_audio_int16(padded)
                frames = np.array(frames)
                frames[bad] = f2
            return audio, frames
        audio_list = [self.streams[s].get_audio(i) for s, i in pairs]
        padded, frames = host_reflect_pad(
            audio_list, self.max_samples, self.n_fft, self.hop_length, self.max_frames
        )
        return quantize_audio_int16(padded), frames

    def _native_paths(self, pairs):
        try:
            from dcase2019_task4_tpu import native

            if not native.available():
                return None
        except Exception:
            return None
        paths = []
        for s, i in pairs:
            src = self.streams[s].source
            if not hasattr(src, "path_for"):
                return None
            paths.append(src.path_for(self.streams[s].filenames[i]))
        return paths

    def iter_epoch(self, epoch: int, prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        """Background-thread prefetch of assembled batches."""
        batches = self.sampler.epoch_batches(epoch)
        if prefetch <= 0:
            for b in batches:
                yield self.assemble(b)
            return
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self.assemble(b))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class DeviceResidentData:
    """The whole (small) training set pinned in device memory.

    The reference streams features from an .npy disk cache every step
    (DataLoad.py:25-154); the TPU-native default streams packed audio over
    the host↔device link. For SMALL datasets — subpart runs, ablations,
    synthetic experiments — the entire set fits in HBM (int16 audio +
    encoded targets; the flagship 792-clip ablation set is ~0.7 GB against
    16 GB on v5e), and pinning it there removes the per-step host transfer
    and dispatch entirely: train_epoch becomes ONE lax.scan dispatch over
    the sampler's index array (train.steps.make_device_epoch), with batches
    gathered on device. Batches are bit-identical to the streamed path's
    (tests/test_device_cache.py; trajectories then agree to Adam-amplified
    fp-fusion noise between the two compiled programs).

    Guarded by `max_bytes` (default 8 GB): the full DESED train set at
    44.1 kHz (~18k clips, ~16 GB int16) does NOT fit alongside the model —
    callers get a loud error, not an OOM.
    """

    def __init__(self, pipeline: "BatchPipeline", max_bytes: int = 8 << 30,
                 mesh=None):
        """With `mesh`, the row store is device_put REPLICATED over the mesh
        and epoch_indices emits the shard-major global batch layout, so the
        sharded epoch scan (make_device_epoch(..., mesh=...)) gathers each
        device's contiguous chunk locally. Replication keeps the per-device
        HBM cost identical to the single-device mode (the size guard is
        per-device either way); sharding the ROWS instead is impossible
        statically — the sampler's per-epoch permutations land any row on
        any device. Multi-process stays unsupported (per-host pinning would
        need a global-array assembly pass)."""
        import jax

        assert pipeline.process_count == 1, (
            "device-resident data is single-process (multi-host runs "
            "stream per-host batches through the shard_map step instead)"
        )
        assert pipeline.n_shards == 1 or mesh is not None, (
            "a sharded pipeline needs the mesh to replicate the row store"
        )
        self._n_shards = pipeline.n_shards
        self._per_shard_sizes = list(pipeline.per_shard_sizes)
        sizes = [len(s) for s in pipeline.streams]
        n_total = sum(sizes)
        self.offsets = np.cumsum([0] + sizes[:-1]).astype(np.int32)
        pad_len = pipeline.max_samples + pipeline.n_fft  # host_reflect_pad layout
        t_shape = pipeline.streams[0].targets.shape[1:]
        est = n_total * (pad_len * 2 * (2 if pipeline.paired_views else 1)
                         + 4 + int(np.prod(t_shape)) * 4)
        if est > max_bytes:
            raise ValueError(
                f"device-resident dataset would need ~{est / 2**30:.1f} GiB "
                f"(> {max_bytes / 2**30:.1f} GiB cap) for {n_total} clips — "
                "use the streamed pipeline (or raise max_bytes)"
            )
        audio_rows, audio2_rows, frame_rows, target_rows = [], [], [], []
        chunk = 64  # bound host-side f32 staging memory
        for s in pipeline.streams:
            for lo in range(0, len(s), chunk):
                hi = min(lo + chunk, len(s))
                clips = [s.get_audio(i) for i in range(lo, hi)]
                padded, frames = host_reflect_pad(
                    clips, pipeline.max_samples, pipeline.n_fft,
                    pipeline.hop_length, pipeline.max_frames,
                )
                audio_rows.append(quantize_audio_int16(padded))
                frame_rows.append(frames)
                if pipeline.paired_views:
                    clips2 = [s.get_audio2(i) for i in range(lo, hi)]
                    padded2, _ = host_reflect_pad(
                        clips2, pipeline.max_samples, pipeline.n_fft,
                        pipeline.hop_length, pipeline.max_frames,
                    )
                    audio2_rows.append(quantize_audio_int16(padded2))
            target_rows.append(s.targets)
        audio = np.concatenate(audio_rows)
        frames = np.concatenate(frame_rows)
        targets = np.concatenate(target_rows).astype(np.float32)
        # pad rows to a multiple of the batch size (repeat the last row) so
        # fixed-size chunk views need no boundary handling on device: the
        # scaler fit scans [K, B] reshapes, masking the tail by n_real; the
        # sampler never emits indices >= n_real so epoch gathers are
        # unaffected. Eager device-side slicing/concat here would compile
        # one fused program PER OP through the tunnel (CLAUDE.md) — all
        # shaping happens host-side, then one device_put per array.
        self.n_real = n_total
        B = max(pipeline.sampler.batch_size, 8)
        pad = (-n_total) % B
        audio2 = np.concatenate(audio2_rows) if audio2_rows else None
        if pad:
            audio = np.concatenate([audio, np.repeat(audio[-1:], pad, 0)])
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
            targets = np.concatenate([targets, np.repeat(targets[-1:], pad, 0)])
            if audio2 is not None:
                audio2 = np.concatenate([audio2, np.repeat(audio2[-1:], pad, 0)])
        if mesh is not None:
            from dcase2019_task4_tpu.parallel.mesh import replicated

            sharding = replicated(mesh)
            put = lambda x: jax.device_put(x, sharding)  # noqa: E731
        else:
            put = jax.device_put
        self.data = {
            "audio": put(audio),
            "frames": put(frames),
            "target": put(targets),
        }
        if audio2 is not None:
            self.data["audio2"] = put(audio2)
        self.nbytes = est

    def epoch_indices(self, sampler: MultiStreamSampler, epoch: int) -> np.ndarray:
        """[steps, B] global row indices for one epoch — the sampler's
        (stream_id, within-stream idx) pairs mapped through the stream
        offsets. The only per-epoch host→device payload. Sharded pipelines
        get the shard-major reorder the streamed path applies in assemble(),
        so per-device contiguous chunks carry the per-device stream layout."""
        pairs = sampler.epoch_batches(epoch)  # [steps, B, 2]
        if self._n_shards > 1:
            from dcase2019_task4_tpu.parallel.mesh import interleave_for_sharding

            pairs = np.stack([
                interleave_for_sharding(p, self._per_shard_sizes, self._n_shards)
                for p in pairs
            ])
        return (self.offsets[pairs[..., 0]] + pairs[..., 1]).astype(np.int32)


def iter_eval_batches(
    stream: Stream,
    batch_size: int,
    max_samples: int,
    n_fft: int,
    hop_length: int,
    max_frames: int,
) -> Iterator[Dict]:
    """Fixed-size batches over an eval stream (last batch padded by
    repeating the final clip; callers slice by `n_valid`). Replaces the
    reference's per-clip batch-1 inference loop
    (evaluation_measures.py:203-231). Uses the C++ batcher when the stream
    reads plain wav files."""
    pipeline = BatchPipeline([stream], [batch_size], max_samples, n_fft, hop_length, max_frames)
    n = len(stream)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        n_valid = len(idx)
        while len(idx) < batch_size:
            idx.append(idx[-1])
        pairs = np.stack([np.zeros(batch_size, np.int64), np.asarray(idx)], axis=1)
        audio, frames = pipeline._pack_audio(pairs)
        yield {
            "audio": audio,
            "frames": frames,
            "target": np.stack([stream.targets[i] for i in idx]),
            "filenames": [stream.filenames[i] for i in idx[:n_valid]],
            "n_valid": n_valid,
        }
