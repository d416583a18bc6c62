"""Anti-aliased image resize (the reference uses skimage.transform.resize
with anti_aliasing=True at `Serra09.py:66` and `StrucScattering.py:131`).

Gaussian pre-smoothing (sigma = (1/scale - 1) / 2 per axis, skimage's
default) followed by bilinear sampling. Pure JAX; images here are small
(<= ~1k square) descriptor intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel1d(sigma: float) -> np.ndarray:
    if sigma <= 0:
        return np.ones(1, dtype=np.float32)
    radius = max(1, int(np.ceil(3 * sigma)))
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_axis(x: jax.Array, kernel: np.ndarray, axis: int) -> jax.Array:
    if kernel.size == 1:
        return x
    r = kernel.size // 2
    x = jnp.moveaxis(x, axis, -1)
    # reflect padding like scipy.ndimage's default ('reflect'/'mirror'
    # differences are negligible at descriptor level; use edge-reflect).
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r, r)], mode="reflect")
    k = jnp.asarray(kernel)
    out = sum(xp[..., i:i + x.shape[-1]] * k[i] for i in range(kernel.size))
    return jnp.moveaxis(out, -1, axis)


def _lin_coords(n_out: int, n_in: int):
    """skimage/scipy zoom-style sample coordinates (edge-aligned)."""
    scale = n_in / n_out
    x = (np.arange(n_out) + 0.5) * scale - 0.5
    x = np.clip(x, 0, n_in - 1)
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (x - lo).astype(np.float32)
    return lo, hi, w


def _interp_axis(x: jax.Array, n_out: int, axis: int) -> jax.Array:
    n_in = x.shape[axis]
    lo, hi, w = _lin_coords(n_out, n_in)
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = n_out
    wj = jnp.asarray(w).reshape(shape)
    return xlo * (1.0 - wj) + xhi * wj


@functools.partial(jax.jit, static_argnames=("out_shape", "anti_aliasing"))
def resize(img: jax.Array, out_shape: tuple[int, int],
           anti_aliasing: bool = True) -> jax.Array:
    """Resize the last two axes of `img` to `out_shape` with optional
    Gaussian anti-aliasing on downscale."""
    h_in, w_in = img.shape[-2], img.shape[-1]
    h_out, w_out = out_shape
    if anti_aliasing:
        sh = max(0.0, (h_in / h_out - 1) / 2)
        sw = max(0.0, (w_in / w_out - 1) / 2)
        img = _blur_axis(img, _gauss_kernel1d(sh), -2)
        img = _blur_axis(img, _gauss_kernel1d(sw), -1)
    img = _interp_axis(img, h_out, -2)
    img = _interp_axis(img, w_out, -1)
    return img
