"""Audio fingerprinting (the Chromaprinter slot).

The reference binds essentia's Chromaprinter (the AcoustID chromaprint
library, `features.py:531-545`), which is unavailable in this image. This
is a self-contained chromaprint-STYLE fingerprint: chroma frames ->
temporal delta signs per bin quantized into one uint32 per frame ->
base64 string. It serves the same role (compact near-duplicate audio
identification); the bitstream is NOT AcoustID-compatible (documented).
"""

from __future__ import annotations

import base64

import numpy as np

from acoss_tpu.features.chroma import chroma_stft


def fingerprint_from_chroma(chroma: np.ndarray,
                            smooth: int = 8) -> np.ndarray:
    """uint32 hash per frame: 12 delta-sign bits x 2 lags + 8 energy
    quantile bits."""
    c = np.asarray(chroma, dtype=np.float64)
    if smooth > 1 and c.shape[0] > smooth:
        kernel = np.ones(smooth) / smooth
        c = np.apply_along_axis(
            lambda x: np.convolve(x, kernel, mode="same"), 0, c)
    d1 = np.sign(np.diff(c, axis=0, prepend=c[:1]))
    d2 = np.sign(c - np.roll(c, 1, axis=1))
    bits1 = (d1 > 0).astype(np.uint32)
    bits2 = (d2 > 0).astype(np.uint32)
    h = np.zeros(c.shape[0], dtype=np.uint32)
    for b in range(12):
        h |= bits1[:, b] << np.uint32(b)
        h |= bits2[:, b] << np.uint32(b + 12)
    energy = c.sum(axis=1)
    q = np.clip((energy / max(energy.max(), 1e-12) * 255), 0,
                255).astype(np.uint32)
    return h | (q << np.uint32(24))


def chromaprint(y: np.ndarray, sr: int = 44100, analysis_time: float = 30,
                hop_length: int = 512) -> str:
    """Base64 fingerprint string of the first `analysis_time` seconds
    (`features.py:531-545` signature parity)."""
    n = min(len(y), int(analysis_time * sr))
    C = chroma_stft(np.asarray(y[:n], dtype=np.float32), sr,
                    hop_length=hop_length)
    h = fingerprint_from_chroma(C)
    return base64.b64encode(h.astype("<u4").tobytes()).decode()
