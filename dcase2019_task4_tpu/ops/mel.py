"""Fused on-device log-mel frontend.

Replaces the reference's host-side librosa pipeline
(DatasetDcase2019Task4.calculate_mel_spec, DatasetDcase2019Task4.py:197-231 +
the ApplyLog transform, DataLoad.py:189-207) with batched XLA ops that run
inside the jitted training step, so features never touch disk:

    audio [B, L] → reflect pad → frame (hop 511, win 2048)
        → Hamming window → rFFT magnitude (or DFT-as-matmul on the MXU)
        → Slaney mel filterbank matmul (htk=False, norm=None)
        → amplitude_to_db (20·log10, per-clip top_db 80 clamp)
        → pad/trunc to max_frames with zeros (PadOrTrunc, DataLoad.py:210-259)
        → per-mel-bin standardization (utils/Scaler.py:99-105)

Numerical conventions match librosa exactly where the reference relies on
them: symmetric `np.hamming` window, center=True + reflect padding, Slaney
mel scale with no filter normalization, amplitude_to_db with amin=1e-5,
ref=1, top_db=80 where the max is taken per clip (the reference applies it
per sample on the host).

Three STFT execution paths:
  * "chunked" (default) — gather-free framing: the audio is viewed as
    hop-sized rows (a pure reshape) and the frame matrix is assembled from
    shifted row-slices (vectorized strided copies instead of XLA's gather,
    which alone cost ~3.5 ms/step at B=96 on v5e), then the windowed DFT
    runs as the same two MXU matmuls as "matmul" mode.
  * "matmul" — windowed DFT as two real matmuls on explicit gathered frames.
  * "fft" — jnp.fft.rfft on the framed signal. NB: XLA:CPU code-generates
    per-FFT (compile time scales with the 864-frame batch — minutes), so
    this path is only practical on TPU or for small frame counts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Filterbank / window construction (host-side, once)
# --------------------------------------------------------------------------

def hz_to_mel_slaney(f):
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: float,
) -> np.ndarray:
    """Triangular Slaney-scale mel filterbank, **no normalization**
    (the reference's `htk=False, norm=None`,
    DatasetDcase2019Task4.py:220-225). Returns [n_bins, n_mels] so the
    on-device apply is a plain `spec @ fb` matmul."""
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = mel_to_hz_slaney(
        np.linspace(hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


def hamming_window(n: int) -> np.ndarray:
    """Symmetric Hamming window, the reference's `np.hamming(n_window)`
    (DatasetDcase2019Task4.py:209)."""
    k = np.arange(n, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


def dft_bases(n_fft: int, window: np.ndarray) -> tuple:
    """Windowed real-DFT bases folded into two [n_fft, n_bins] matrices so the
    STFT becomes frames @ cos_basis / frames @ sin_basis on the MXU."""
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(ang) * window[:, None].astype(np.float64)).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None].astype(np.float64)).astype(np.float32)
    return cos_b, sin_b




# --------------------------------------------------------------------------
# Batched device ops
# --------------------------------------------------------------------------

def num_frames(length, hop_length: int):
    """librosa center=True frame count: 1 + length // hop."""
    return 1 + length // hop_length


def reflect_pad_audio(audio: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Center padding for full-length clips: reflect n_fft//2 at both ends
    (librosa stft center=True, pad_mode='reflect'). For variable-length clips
    use `host_reflect_pad` so the reflection happens around the true signal
    boundary, not the zero-padded buffer."""
    p = n_fft // 2
    return jnp.pad(audio, ((0, 0), (p, p)), mode="reflect")


def host_reflect_pad(audio_list, max_samples: int, n_fft: int, hop_length: int, max_frames: int) -> tuple:
    """Host-side packing of variable-length clips.

    Each clip is reflect-padded by n_fft//2 around its own boundaries and
    written into a [B, max_samples + n_fft] zero buffer; returns
    (padded [B, L+n_fft], n_valid_frames [B]). Frame t of clip b then reads
    padded[b, t*hop : t*hop + n_fft] exactly as librosa would."""
    p = n_fft // 2
    B = len(audio_list)
    out = np.zeros((B, max_samples + 2 * p), dtype=np.float32)
    frames = np.zeros(B, dtype=np.int32)
    for b, a in enumerate(audio_list):
        a = np.asarray(a, dtype=np.float32)
        frames[b] = min(max_frames, 1 + a.shape[0] // hop_length)
        if a.shape[0] > max_samples + p:  # enough tail for the last frame
            a = a[: max_samples + p]
        padded = np.pad(a, (p, p), mode="reflect")
        out[b, : min(padded.shape[0], out.shape[1])] = padded[: out.shape[1]]
    return out, frames


def frame_signal(padded: jnp.ndarray, n_frames: int, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, Lp] → [B, n_frames, n_fft] via a gather with static indices."""
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return padded[:, idx]


class MelFrontend:
    """Holds the device-resident constants (window, mel matrix, DFT bases)
    and exposes jit-compiled batched featurization.

    Args mirror DSPConfig; `stft_mode` picks "fft" (XLA FFT) or "matmul"
    (MXU DFT)."""

    def __init__(
        self,
        sample_rate: int = 44100,
        n_window: int = 2048,
        hop_length: int = 511,
        n_mels: int = 64,
        f_min: float = 0.0,
        f_max: float = 22050.0,
        max_frames: int = 864,
        amin: float = 1e-5,
        top_db: float = 80.0,
        stft_mode: str = "auto",
        compute_dtype=jnp.float32,
        pallas_interpret: bool = False,
    ):
        self.sample_rate = sample_rate
        self.n_window = n_window
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.max_frames = max_frames
        self.amin = amin
        self.top_db = top_db
        self.compute_dtype = compute_dtype
        self.pallas_interpret = pallas_interpret

        window = hamming_window(n_window)
        self.window = jnp.asarray(window)
        fb = mel_filterbank(sample_rate, n_window, n_mels, f_min, f_max)
        self.mel_fb = jnp.asarray(fb)

        # "auto": the fully-fused Pallas STFT→mel kernel on TPU (no frame /
        # magnitude tensors in HBM, ops/fused_mel.py), the XLA chunked path
        # elsewhere. pallas_interpret forces the kernel in interpret mode
        # (CPU correctness tests).
        explicit_pallas = stft_mode == "pallas"
        if stft_mode == "auto":
            if pallas_interpret or jax.default_backend() == "tpu":
                stft_mode = "pallas"
            else:
                stft_mode = "chunked"
        if stft_mode == "pallas":
            if explicit_pallas and not pallas_interpret and jax.default_backend() != "tpu":
                # fail at construction, not at the first traced call with an
                # opaque Mosaic lowering error
                raise ValueError(
                    'stft_mode="pallas" needs a TPU backend (or pallas_interpret=True); '
                    f"current backend is {jax.default_backend()!r}"
                )
            from dcase2019_task4_tpu.ops import fused_mel as _fm

            tt = _fm.pick_tile(max_frames, n_window, hop_length)
            if tt == 0:
                # no legal frame tile for these params
                if explicit_pallas:
                    import warnings

                    warnings.warn(
                        f'explicit stft_mode="pallas" downgraded to "chunked": no legal '
                        f"frame tile for max_frames={max_frames}, n_window={n_window}, "
                        f"hop={hop_length}",
                        stacklevel=2,
                    )
                stft_mode = "chunked"
            else:
                self._fused_tt = tt
        self.stft_mode = stft_mode

        if stft_mode in ("matmul", "chunked", "pallas"):
            cos_b, sin_b = dft_bases(n_window, window)
            self.cos_basis = jnp.asarray(cos_b)
            self.sin_basis = jnp.asarray(sin_b)
        if stft_mode == "pallas":
            # DCASE_FUSED_MEL_ONEDOT=1: cos‖sin-fused DFT-basis variant
            # (fused_mel.ONEDOT A/B note) — same trimmed bins, same outputs
            # to float tolerance (the contraction is reassociated)
            if _fm.ONEDOT:
                self._fused_bases = _fm.build_onedot_bases(
                    cos_b, sin_b, fb, hop_length, jnp.dtype(compute_dtype)
                )
            else:
                self._fused_bases = _fm.build_bases(
                    cos_b, sin_b, fb, hop_length, jnp.dtype(compute_dtype)
                )

    # ----------------------------------------------------------- pieces
    # (each public method is jitted with `self` static: instances hash by
    # DSP parameters, so equivalent frontends share compile caches, and no
    # stage ever runs through the slow eager op-chain path)

    @functools.partial(jax.jit, static_argnums=0)
    def stft_magnitude(self, padded: jnp.ndarray) -> jnp.ndarray:
        """[B, Lp] (already reflect-padded) → |STFT| [B, T, n_bins].
        Accepts int16 PCM (dequantized on device; the chunked path reshapes
        the int16 first — half the relayout bytes)."""
        if self.stft_mode in ("chunked", "pallas"):
            return self._stft_magnitude_chunked(padded)
        if padded.dtype == jnp.int16:
            padded = padded.astype(jnp.float32) * (1.0 / 32768.0)
        frames = frame_signal(padded, self.max_frames, self.n_window, self.hop_length)
        if self.stft_mode == "matmul":
            f = frames.astype(self.compute_dtype)
            re = jnp.einsum("btn,nk->btk", f, self.cos_basis.astype(self.compute_dtype),
                            preferred_element_type=jnp.float32)
            im = jnp.einsum("btn,nk->btk", f, self.sin_basis.astype(self.compute_dtype),
                            preferred_element_type=jnp.float32)
            return jnp.sqrt(re * re + im * im)
        spec = jnp.fft.rfft(frames * self.window, n=self.n_window, axis=-1)
        return jnp.abs(spec).astype(jnp.float32)

    def _hop_chunks(self, padded: jnp.ndarray, min_rows: int = 0) -> jnp.ndarray:
        """[B, Lp] → hop-row view [B, max(T + n_splits − 1, min_rows), hop]
        in the original dtype (pure reshape plus zero-fill to the row
        boundary)."""
        B = padded.shape[0]
        hop, nfft, T = self.hop_length, self.n_window, self.max_frames
        n_splits = -(-nfft // hop)
        rows_needed = max(T + n_splits - 1, min_rows)
        need = rows_needed * hop
        if padded.shape[1] < need:
            padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        return padded[:, :need].reshape(B, rows_needed, hop)

    def _stft_magnitude_chunked(self, padded: jnp.ndarray) -> jnp.ndarray:
        """Gather-free STFT: view the audio as hop-sized rows (pure reshape),
        assemble the [B, T, n_fft] frame matrix from shifted row-slices of
        the chunk view (vectorized strided copies — XLA's gather framing
        costs ~3.5 ms/step at B=96, this concat ~1 ms), then the usual
        windowed-DFT matmuls. Accumulating per-chunk matmuls instead would
        stream the [B, T, n_bins] f32 accumulator once per chunk (~8 ms)."""
        hop, nfft, T = self.hop_length, self.n_window, self.max_frames
        n_splits = -(-nfft // hop)
        chunks = self._hop_chunks(padded)
        if chunks.dtype == jnp.int16:  # dequantize AFTER the relayout
            chunks = chunks.astype(self.compute_dtype) * (1.0 / 32768.0)
        else:
            chunks = chunks.astype(self.compute_dtype)
        parts = [chunks[:, j: j + T, :] for j in range(n_splits - 1)]
        tail = nfft - (n_splits - 1) * hop
        parts.append(chunks[:, n_splits - 1: n_splits - 1 + T, :tail])
        frames = jnp.concatenate(parts, axis=-1)  # [B, T, n_fft]
        re = jnp.einsum("btn,nk->btk", frames, self.cos_basis.astype(self.compute_dtype),
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btn,nk->btk", frames, self.sin_basis.astype(self.compute_dtype),
                        preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im)

    @functools.partial(jax.jit, static_argnums=0)
    def linear_mel(self, padded: jnp.ndarray) -> jnp.ndarray:
        """|STFT| → linear mel [B, T, n_mels] (matmul on the MXU). In
        "pallas" mode the whole STFT→magnitude→mel chain runs as one fused
        kernel (ops/fused_mel.py) — no frame or spectrogram tensor in HBM."""
        if self.stft_mode == "pallas":
            from dcase2019_task4_tpu.ops.fused_mel import fused_stft_mel, padded_extra_rows

            return fused_stft_mel(
                self._hop_chunks(
                    padded,
                    min_rows=self.max_frames
                    + padded_extra_rows(self.n_window, self.hop_length),
                ),
                self._fused_bases,
                n_fft=self.n_window,
                hop=self.hop_length,
                T=self.max_frames,
                tt=self._fused_tt,
                compute_dtype=jnp.dtype(self.compute_dtype),
                interpret=self.pallas_interpret,
            )
        mag = self.stft_magnitude(padded)
        return jnp.einsum("btk,km->btm", mag, self.mel_fb,
                          preferred_element_type=jnp.float32)

    def amplitude_to_db(self, mel: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """librosa amplitude_to_db with ref=1: 20·log10(max(amin, x)), then
        clamp at per-clip max − top_db. The reference applies it per clip on
        the host (ApplyLog, DataLoad.py:189-207), so the top_db max here is
        per clip over *valid* frames only."""
        db = 20.0 * jnp.log10(jnp.maximum(self.amin, mel))
        if frame_mask is not None:
            masked = jnp.where(frame_mask[..., None], db, -jnp.inf)
        else:
            masked = db
        peak = jnp.max(masked, axis=(-2, -1), keepdims=True)
        return jnp.maximum(db, peak - self.top_db)

    def frame_mask(self, n_valid_frames: jnp.ndarray) -> jnp.ndarray:
        """[B] valid frame counts → [B, T] bool mask."""
        t = jnp.arange(self.max_frames)[None, :]
        return t < n_valid_frames[:, None]

    # ----------------------------------------------------------- fused

    @functools.partial(jax.jit, static_argnums=0)
    def log_mel(self, padded: jnp.ndarray, n_valid_frames: jnp.ndarray) -> jnp.ndarray:
        """Fused featurization: padded audio [B, Lp] → log-mel [B, T, M] with
        zeroed padding frames (PadOrTrunc pads zeros *after* the log in the
        reference transform order, utils/utils.py:404-408)."""
        mel = self.linear_mel(padded)
        mask = self.frame_mask(n_valid_frames)
        db = self.amplitude_to_db(mel, mask)
        return jnp.where(mask[..., None], db, 0.0)

    @functools.partial(jax.jit, static_argnums=0)
    def log_mel_pair(
        self,
        padded: jnp.ndarray,
        n_valid_frames: jnp.ndarray,
        rng: jax.Array,
        noise_std: float = 0.25,
        teacher_padded: jnp.ndarray | None = None,
    ) -> tuple:
        """(student, teacher) features for the Mean-Teacher loop.

        The reference's AugmentGaussianNoise (DataLoad.py:283-287) adds
        |N(0, 0.25)| to the *linear* mel and hands the clean tensor to the
        student, the noisy one to the teacher (main.py:73 unpack order); the
        log / pad / normalize stages then run on both.

        `teacher_padded` (paired-teacher-view mode): the teacher's linear
        mel comes from this second audio view instead of sharing the
        student's — the gaussian noise still applies on top, so the view
        swap is the only change to the recipe."""
        mel = self.linear_mel(padded)
        mask = self.frame_mask(n_valid_frames)
        noise = jnp.abs(noise_std * jax.random.normal(rng, mel.shape, dtype=mel.dtype))
        student = jnp.where(mask[..., None], self.amplitude_to_db(mel, mask), 0.0)
        t_mel = mel if teacher_padded is None else self.linear_mel(teacher_padded)
        teacher_mel = t_mel + noise
        teacher = jnp.where(mask[..., None], self.amplitude_to_db(teacher_mel, mask), 0.0)
        return student, teacher

    def __hash__(self):
        return hash((self.sample_rate, self.n_window, self.hop_length, self.n_mels,
                     self.max_frames, self.amin, self.top_db, self.stft_mode,
                     str(self.compute_dtype), self.pallas_interpret))

    def __eq__(self, other):
        return isinstance(other, MelFrontend) and hash(self) == hash(other)


def median_filter_binary(x: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Median filter over the time axis with reflected edges, matching
    scipy.ndimage.median_filter(size=(window, 1)) as used in decoding
    (evaluation_measures.py:214).

    Input [..., T, C] is binary (post-threshold), so the median over an
    odd window is just `sum > window // 2` — a vectorized reduce instead of
    a sort. scipy's default boundary mode is 'reflect' ((b a | a b c d):
    reflection about the array edge, edge value duplicated), replicated
    here."""
    half = window // 2
    pad_lo = x[..., :half, :][..., ::-1, :]
    pad_hi = x[..., -half:, :][..., ::-1, :]
    xp = jnp.concatenate([pad_lo, x, pad_hi], axis=-2)
    windows = sum(xp[..., i : i + x.shape[-2], :] for i in range(window))
    return (windows > half).astype(x.dtype)
