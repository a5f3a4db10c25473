"""Oriented BRIEF (ORB-style) descriptors, batched.

Replaces OpenCV ORB::detectAndCompute's describe stage
(stereoFrame.cpp:113-116).  Design choices for TPU:

- orientation by intensity centroid, computed as two dense 31x31
  convolutions (dx- and dy-weighted disc kernels) over the blurred image —
  one MXU-friendly pass — then sampled at the keypoints;
- steered BRIEF: a fixed 256-pair sampling pattern (deterministic seeded
  Gaussian, as in the original BRIEF construction — descriptors only need
  to be internally consistent, not OpenCV bit-compatible), rotated by the
  keypoint angle and bilinearly gathered in one batch;
- output packed uint32[8] for the popcount-matmul matcher.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .descriptors import pack_bits
from .image import bilinear_sample, blur

PATCH_R = 15          # Config::orbPatchSize=31 -> radius 15
N_PAIRS = 256


def _disc_offsets(radius: int) -> np.ndarray:
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    m = xs**2 + ys**2 <= radius**2
    return np.stack([xs[m], ys[m]], axis=-1)


def _brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 2, 2) sampling pairs ~ N(0, (patch/5)^2), clipped to the patch
    (the original BRIEF G-II construction)."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_R * 2 / 5.0
    pat = rng.normal(0.0, sigma, size=(N_PAIRS, 2, 2))
    return np.clip(pat, -PATCH_R, PATCH_R)


_DISC = _disc_offsets(PATCH_R)
_PATTERN = _brief_pattern()


def orientation_maps(img: jax.Array):
    """Dense (m10, m01) intensity-centroid maps via disc convolutions."""
    r = PATCH_R
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    m = (xs**2 + ys**2 <= r**2).astype(np.float32)
    kx = jnp.asarray(xs * m, img.dtype)
    ky = jnp.asarray(ys * m, img.dtype)
    p = jnp.pad(img, r, mode="edge")

    def conv(k):
        return jax.lax.conv_general_dilated(
            p[None, None], k[None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    return conv(kx), conv(ky)


def keypoint_angles(img: jax.Array, xy: jax.Array):
    """Orientation angle per keypoint from the centroid maps."""
    m10, m01 = orientation_maps(img)
    a10 = bilinear_sample(m10, xy)
    a01 = bilinear_sample(m01, xy)
    return jnp.arctan2(a01, a10)


def describe(img: jax.Array, xy: jax.Array, valid: jax.Array,
             blur_sigma: float = 2.0):
    """(K, 8) uint32 packed rotated-BRIEF descriptors + (K,) angles.

    img: full-resolution grayscale (float); xy: (K, 2) keypoint coords.
    """
    smoothed = blur(img, blur_sigma)
    theta = keypoint_angles(smoothed, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotation applied to the fixed pattern: (K, 256, 2, 2)
    pat = jnp.asarray(_PATTERN, img.dtype)  # (256, 2, 2)
    px, py = pat[..., 0], pat[..., 1]       # (256, 2)
    rx = c[:, None, None] * px[None] - s[:, None, None] * py[None]
    ry = s[:, None, None] * px[None] + c[:, None, None] * py[None]
    # nearest-neighbor sampling on the blurred image (OpenCV ORB rounds to
    # integer positions too); one gather instead of four bilinear taps —
    # the descriptor gather is the VO hot spot on TPU.
    H, W = smoothed.shape
    xi = jnp.clip(jnp.round(xy[:, None, None, 0] + rx), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(xy[:, None, None, 1] + ry), 0, H - 1).astype(jnp.int32)
    vals = smoothed[yi, xi]  # (K, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # (K, 256)
    desc = pack_bits(bits)
    desc = jnp.where(valid[:, None], desc, 0)
    return desc, theta
