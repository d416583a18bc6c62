"""Spectral primitives: framing, STFT, mel filterbank, DCT.

Replaces the essentia/librosa spectral plumbing under the reference's
`AudioFeatures` (`/root/reference/preprocess/features.py:36-503`). All
transforms are batched matmul/FFT XLA ops; filterbanks are compile-time
constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None, htk: bool = True,
                   norm: str | None = None) -> np.ndarray:
    """(n_mels, n_fft // 2 + 1) triangular mel filterbank."""
    fmax = fmax or sr / 2
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk),
                          n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    fb = np.zeros((n_mels, len(fft_freqs)))
    for m in range(n_mels):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(c - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - c, 1e-9)
        fb[m] = np.maximum(0, np.minimum(up, down))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


def dct_matrix(n_out: int, n_in: int, ortho: bool = True,
               htk: bool = False) -> np.ndarray:
    """DCT-II matrix (n_out, n_in).

    `ortho` is the orthonormal scaling (librosa.filters.dct: row 0 =
    1/sqrt(N), rows >= 1 scaled sqrt(2/N)). `htk=True` is the HTK book's
    convention (eq. 5.11): UNIFORM sqrt(2/N) on every row including C0 —
    what essentia's 'MFCC the HTK way' recipe computes
    (`features.py:461` dctType=3); C0 is sqrt(2) larger than ortho's."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    M = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    if htk:
        M *= np.sqrt(2.0 / n_in)
    elif ortho:
        M *= np.sqrt(2.0 / n_in)
        M[0] *= 1.0 / np.sqrt(2.0)
    return M.astype(np.float32)


#: waveforms are zero-padded to a multiple of this many samples before
#: the jitted transforms, so a corpus compiles O(few) distinct shapes
#: instead of one per song (~47 s at 44.1 kHz). Exact: all framing paths
#: use constant(zero) padding, and callers crop to the true frame count.
SHAPE_BUCKET_SAMPLES = 2 ** 21


def bucket_pad_signal(y: np.ndarray, multiple: int = SHAPE_BUCKET_SAMPLES):
    """(padded float32 signal, true length)."""
    y = np.ascontiguousarray(y, dtype=np.float32).ravel()
    L = y.size
    pad_to = max(-(-L // multiple) * multiple, multiple)
    out = np.zeros(pad_to, dtype=np.float32)
    out[:L] = y
    return out, L


def n_frames_centered(L: int, hop_length: int) -> int:
    return 1 + L // hop_length


def n_frames_uncentered(L: int, frame_length: int, hop_length: int) -> int:
    return max(1 + (L - frame_length) // hop_length, 0)


def frame_signal(y: jax.Array, frame_length: int, hop_length: int,
                 center: bool = True, pad_mode: str = "constant"):
    """(T,) -> (n_frames, frame_length)."""
    if center:
        y = jnp.pad(y, (frame_length // 2, frame_length // 2),
                    mode=pad_mode)
    n_frames = 1 + (y.shape[0] - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return y[idx]


@functools.partial(jax.jit, static_argnames=(
    "n_fft", "hop_length", "win_length", "center", "window"))
def stft(y: jax.Array, n_fft: int = 2048, hop_length: int = 512,
         win_length: int | None = None, center: bool = True,
         window: str = "hann") -> jax.Array:
    """Complex STFT, (n_frames, n_fft // 2 + 1)."""
    win_length = win_length or n_fft
    if window == "hann":
        w = np.hanning(win_length + 1)[:-1]  # periodic hann like librosa
    elif window == "blackmanharris62":
        # essentia's 62 dB Blackman-Harris (used for HPCP frames)
        n = np.arange(win_length) / win_length
        w = (0.44959 - 0.49364 * np.cos(2 * np.pi * n)
             + 0.05677 * np.cos(4 * np.pi * n))
    elif window == "ones":
        w = np.ones(win_length)
    else:
        raise ValueError(window)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
        frames = frame_signal(y, n_fft, hop_length, center)
    else:
        frames = frame_signal(y, win_length, hop_length, center)
    w = jnp.asarray(w.astype(np.float32))
    return jnp.fft.rfft(frames * w[None, :], n=n_fft, axis=-1)


def magnitude_spectrogram(y, n_fft=2048, hop_length=512, power=1.0, **kw):
    S = jnp.abs(stft(y, n_fft, hop_length, **kw))
    return S if power == 1.0 else S ** power
