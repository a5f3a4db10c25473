"""Basic image ops: separable Gaussian blur, Sobel gradients, pyramids,
bilinear sampling.  All are fixed-shape jnp programs that XLA fuses.

Separable small-kernel filters are formulated as **banded-matrix MXU
matmuls** (out = K_rows @ img @ K_cols^T) instead of lax.conv:

- the TPU conv emitter picks a batch-in-lanes output layout
  ({0,1,3,2:T(1,128)}), and any Mosaic custom call consuming the result
  demands the default {2,1,0:T(8,128)} layout — XLA inserts a relayout
  copy measured at ~13 ms per frame pair, 6x the whole describe stage;
- the conv's default accumulation loses ~3 decimal digits (0.8 absolute
  on a 0..255 image vs a float64 oracle); the banded matmul in HIGHEST
  precision is exact to 3e-5 and costs ~0.9 GFLOP per 480x752 image —
  noise for the MXU.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


def _gaussian_taps(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    return jnp.asarray(_gaussian_taps(sigma, radius), jnp.float32)


@functools.lru_cache(maxsize=None)
def _band_matrix(taps: tuple, n: int) -> np.ndarray:
    """(n, n) banded filter matrix with edge-replicated boundaries:
    out[i] = sum_j taps[j] * in[clip(i + j - r, 0, n-1)]."""
    k = np.asarray(taps, np.float64)
    r = (len(k) - 1) // 2
    M = np.zeros((n, n), np.float64)
    rows = np.repeat(np.arange(n), len(k))
    cols = np.clip(np.add.outer(np.arange(n), np.arange(len(k)) - r),
                   0, n - 1).ravel()
    np.add.at(M, (rows, cols), np.tile(k, n))
    return M.astype(np.float32)


def _sep_filter(img: jax.Array, row_taps: tuple, col_taps: tuple) -> jax.Array:
    H, W = img.shape
    KY = jnp.asarray(_band_matrix(row_taps, H), img.dtype)
    KXT = jnp.asarray(_band_matrix(col_taps, W).T, img.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jax.lax.dot(jax.lax.dot(KY, img, precision=hi), KXT, precision=hi)


def blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of (H, W) image, edge-replicated."""
    taps = tuple(_gaussian_taps(sigma))
    return _sep_filter(img, taps, taps)


_SOBEL_SMOOTH = (1.0, 2.0, 1.0)
_SOBEL_DIFF = (-1.0, 0.0, 1.0)


def sobel(img: jax.Array):
    """(gx, gy) Sobel gradients with replicate padding."""
    gx = _sep_filter(img, _SOBEL_SMOOTH, _SOBEL_DIFF)
    gy = _sep_filter(img, _SOBEL_DIFF, _SOBEL_SMOOTH)
    return gx, gy


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) matrix reproducing jax.image.resize 'bilinear'
    (antialiased triangle kernel, half-pixel centers, row-normalized
    borders) — agrees with it to f32 summation noise (<0.007 on a 0..255
    image)."""
    s = n_out / n_in
    scale = min(s, 1.0)
    x_in = (np.arange(n_out) + 0.5) / s - 0.5
    t = (np.arange(n_in)[None, :] - x_in[:, None]) * scale
    M = np.maximum(0.0, 1.0 - np.abs(t))
    M /= M.sum(1, keepdims=True)
    return M.astype(np.float32)


def resize_bilinear(img: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Bilinear (antialiased) resize as two MXU matmuls.

    jax.image.resize lowers to scattered gathers on this TPU runtime
    (measured ~3.3 ms for the 2x4-level pyramid build vs ~1.7 ms as
    banded matmuls); out = RY @ img @ RX^T keeps it on the MXU."""
    H, W = img.shape
    h, w = shape
    if (h, w) == (H, W):
        return img
    RY = jnp.asarray(_resize_matrix(h, H), img.dtype)
    RXT = jnp.asarray(_resize_matrix(w, W).T, img.dtype)
    hi = jax.lax.Precision.HIGHEST
    return jax.lax.dot(jax.lax.dot(RY, img, precision=hi), RXT, precision=hi)


def build_pyramid(img: jax.Array, n_levels: int, scale_factor: float):
    """List of n_levels images; level i has size /scale_factor^i (ORB
    pyramid semantics, Config::orbScaleFactor=1.2, orbNLevels=4)."""
    H, W = img.shape
    levels = [img]
    for i in range(1, n_levels):
        s = scale_factor ** i
        levels.append(resize_bilinear(img, (int(round(H / s)), int(round(W / s)))))
    return levels


def bilinear_sample(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample (H, W) image at (..., 2) float (x, y) pixel coords with
    clamped borders."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def remap(img: jax.Array, map_x: jax.Array, map_y: jax.Array) -> jax.Array:
    """cv2.remap equivalent: out[i, j] = bilinear(img, map_x[i,j], map_y[i,j]).

    Used for on-device stereo rectification with host-precomputed maps
    (pinholeStereoCamera.cpp rectifyImagesLR :200 semantics).
    """
    return bilinear_sample(img, jnp.stack([map_x, map_y], axis=-1))
