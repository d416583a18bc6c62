"""MFCC block-SSM scattering descriptors (Serra09 / EarlySNF).

Parity target: `get_ssm_sequence` (`/root/reference/benchmarking/
Serra09.py:31-71`): slide a window of m * downsample_fac frames over the
full-rate MFCCs with hop = downsample_fac; per block: moving-average smooth
(width downsample_fac / 2, via cumsum), Z-normalize (subtract column means,
unit row norms), Euclidean SSM, anti-aliased resize to RES x RES, 2D
scattering (J=2, L=8), flatten.

The reference loops blocks one at a time in numpy + kymatio
(`Serra09.py:50-70`); here all blocks of a song are stacked and pushed
through ONE batched jitted pipeline (chunked to bound the n_blocks x win^2
SSM working set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acoss_tpu.ops.resize import resize
from acoss_tpu.ops.scattering import Scattering2D

_SCATTERING_CACHE: dict = {}


def get_scattering2d(res: int, J: int = 2, L: int = 8) -> Scattering2D:
    key = (res, J, L)
    if key not in _SCATTERING_CACHE:
        _SCATTERING_CACHE[key] = Scattering2D((res, res), J=J, L=L)
    return _SCATTERING_CACHE[key]


def scatter_dim(res: int, J: int = 2, L: int = 8) -> int:
    n_ch = 1 + J * L + L * L * (J * (J - 1)) // 2
    return n_ch * (res // 2 ** J) ** 2


@functools.partial(jax.jit, static_argnames=("win", "res", "J", "L"))
def _blocks_to_scatter(blocks: jax.Array, win: int, res: int,
                       J: int, L: int) -> jax.Array:
    """(B, block_len, d) MFCC blocks -> (B, scatter_dim) descriptors."""
    x = jnp.cumsum(blocks, axis=1)
    x = x[:, win:, :] - x[:, :-win, :]          # moving-window sums
    x = x - jnp.mean(x, axis=1, keepdims=True)  # Z-normalize columns
    norm = jnp.sqrt(jnp.sum(x * x, axis=2, keepdims=True))
    x = x / jnp.where(norm == 0, 1.0, norm)
    sq = jnp.sum(x * x, axis=2)
    D2 = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum(
        "bik,bjk->bij", x, x, precision="highest")
    D = jnp.sqrt(jnp.maximum(D2, 0.0))
    D = resize(D, (res, res))
    S = get_scattering2d(res, J, L)._scatter(D)
    return S.reshape(S.shape[0], -1)


def get_ssm_scatter_sequence(
    mfcc: np.ndarray,
    downsample_fac: int = 40,
    m: int = 18,
    res: int = 64,
    J: int = 2,
    L: int = 8,
    chunk: int = 32,
) -> np.ndarray:
    """Sequence of scattered block-SSM descriptors for one song.

    Args:
      mfcc: (L_frames, d) full-rate MFCCs (frames-first).
      downsample_fac: hop between blocks AND 2x the smoothing width.
      m: delays; block length = m * downsample_fac (`Serra09.py:51`).

    Returns (n_blocks, scatter_dim) float32 (possibly 0 blocks).
    """
    # Construct (and cache) the scattering filters OUTSIDE any jit trace —
    # building them inside `_blocks_to_scatter`'s trace would leak tracers.
    get_scattering2d(res, J, L)
    span = m * downsample_fac
    win = downsample_fac // 2
    L_frames = mfcc.shape[0]
    starts = list(range(0, max(L_frames - span, 0) + 1, downsample_fac))
    if L_frames < span or not starts:
        return np.zeros((0, scatter_dim(res, J, L)), dtype=np.float32)
    outs = []
    for c0 in range(0, len(starts), chunk):
        cs = starts[c0:c0 + chunk]
        blocks = np.zeros((chunk, span, mfcc.shape[1]), dtype=np.float32)
        for k, s0 in enumerate(cs):
            blocks[k] = mfcc[s0:s0 + span]
        # fixed chunk shape -> one compile; surplus rows are cropped
        outs.append(np.asarray(
            _blocks_to_scatter(blocks, win, res, J, L))[:len(cs)])
    return np.concatenate(outs, axis=0)


def length_match(ssms: np.ndarray, M: int, dim: int) -> np.ndarray:
    """Pad (repeating the last row) or truncate to exactly M rows
    (`Serra09.py:146-152`); all-zero if there were no blocks."""
    if ssms.shape[0] == 0:
        return np.zeros((M, dim), dtype=np.float32)
    if ssms.shape[0] < M:
        pad = np.repeat(ssms[-1:], M - ssms.shape[0], axis=0)
        ssms = np.concatenate([ssms, pad], axis=0)
    return ssms[:M]
