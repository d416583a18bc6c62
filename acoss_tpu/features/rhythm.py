"""Rhythm features: local autocorrelation tempogram.

Replaces `librosa.feature.tempogram` as used by the reference
(`Tempogram.py:47`, `StrucFTM2D.py:74`, `StrucLaplacian.py:73`): hop-1
sliding Hann-windowed frames of the onset envelope, per-frame FFT
autocorrelation, per-frame infinity-norm normalization. Computed as one
batched FFT on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("win_length",))
def _tempogram_jax(oenv: jax.Array, win_length: int) -> jax.Array:
    L = oenv.shape[-1]
    half = win_length // 2
    # librosa pads with a linear ramp down to 0 at the edges.
    padded = jnp.concatenate([
        jnp.linspace(0.0, 1.0, half, endpoint=False) * oenv[0],
        oenv,
        jnp.linspace(1.0, 0.0, half + 1)[1:] * oenv[-1],
    ])
    idx = jnp.arange(L)[:, None] + jnp.arange(win_length)[None, :]
    frames = padded[idx]                                   # (L, win)
    window = jnp.asarray(np.hanning(win_length).astype(np.float32))
    frames = frames * window[None, :]
    n_fft = 2 * win_length
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft, axis=-1)
    ac = jnp.real(ac[:, :win_length])
    peak = jnp.max(jnp.abs(ac), axis=-1, keepdims=True)
    ac = ac / jnp.where(peak == 0, 1.0, peak)
    return ac.T                                            # (win, L)


def tempogram(onset_envelope: np.ndarray, win_length: int = 384,
              sr: int = 44100, hop_length: int = 512) -> np.ndarray:
    """Local autocorrelation tempogram, (win_length, n_frames).

    sr/hop_length are accepted for signature parity with librosa; the
    autocorrelation itself only depends on the envelope and win_length.
    """
    oenv = np.ascontiguousarray(onset_envelope, dtype=np.float32).ravel()
    return np.asarray(_tempogram_jax(oenv, win_length))
