"""Basic image ops: separable Gaussian blur, Sobel gradients, pyramids,
bilinear sampling.  All are fixed-shape jnp programs that XLA fuses; the
convolutions lower to TPU conv/matmul units.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of (H, W) image, edge-replicated."""
    k = gaussian_kernel1d(sigma).astype(img.dtype)
    r = (k.shape[0] - 1) // 2
    padded = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    v = jax.lax.conv_general_dilated(
        padded[None, None], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    padded = jnp.pad(v, ((0, 0), (r, r)), mode="edge")
    h = jax.lax.conv_general_dilated(
        padded[None, None], k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    return h


def sobel(img: jax.Array):
    """(gx, gy) Sobel gradients with replicate padding."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], img.dtype)
    ky = kx.T
    p = jnp.pad(img, 1, mode="edge")

    def conv(k):
        return jax.lax.conv_general_dilated(
            p[None, None], k[None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    return conv(kx), conv(ky)


def resize_bilinear(img: jax.Array, shape: tuple[int, int]) -> jax.Array:
    return jax.image.resize(img, shape, method="bilinear")


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
