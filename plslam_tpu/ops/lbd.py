"""Line Band Descriptor (LBD), batched.

Replaces the vendored BinaryDescriptor (3rdparty/line_descriptor,
binary_descriptor_custom.cpp:836-848: band-based statistics over a line
support region, binarized to 256 bits).

TPU formulation: for each segment, a fixed (BANDS x BAND_W x SAMPLES) grid
of points in line-aligned coordinates is bilinearly gathered from the
Sobel gradient images; gradients are rotated into the line frame; each
band contributes mean/std statistics of the 4 half-wave components
(positive/negative parallel and normal gradients — the classic LBD
features); the float feature vector is binarized by a fixed random-pair
comparison pattern into 256 bits, matching the binary-matcher interface.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .descriptors import pack_bits
from .image import bilinear_sample, blur, sobel

BANDS = 9          # classic LBD: m = 9 bands
BAND_W = 7         # band width in px
SAMPLES = 32       # samples along the line per band row
FEAT_DIM = BANDS * 8  # mean+std of 4 half-wave components per band


def _pair_pattern(seed: int = 4321) -> np.ndarray:
    """(256, 2) index pairs over the feature vector for binarization."""
    rng = np.random.default_rng(seed)
    pairs = rng.integers(0, FEAT_DIM, size=(256, 2))
    # avoid degenerate identical pairs
    same = pairs[:, 0] == pairs[:, 1]
    pairs[same, 1] = (pairs[same, 1] + 7) % FEAT_DIM
    return pairs


_PAIRS = _pair_pattern()


def describe(img: jax.Array, sp: jax.Array, ep: jax.Array, valid: jax.Array):
    """(K, 8) uint32 packed LBD descriptors for segments (sp, ep)."""
    g = blur(img, 1.4)
    gx, gy = sobel(g)

    d = ep - sp
    length = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    dl = d / length                                   # line direction
    dn = jnp.stack([-dl[..., 1], dl[..., 0]], axis=-1)  # normal

    # sample grid: along in [0, 1] * length, across centered on the line
    t_along = jnp.linspace(0.05, 0.95, SAMPLES)
    half = (BANDS * BAND_W) / 2.0
    t_across = (jnp.arange(BANDS * BAND_W) + 0.5) - half  # px offsets

    # coords: (K, BANDS*BAND_W, SAMPLES, 2)
    along = sp[:, None, None, :] + t_along[None, None, :, None] * d[:, None, None, :]
    coords = along + t_across[None, :, None, None] * dn[:, None, None, :]

    # nearest-neighbor gradient sampling (one gather per image instead of
    # four bilinear taps; band statistics are robust to half-pixel jitter)
    H, W = gx.shape
    xi = jnp.clip(jnp.round(coords[..., 0]), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(coords[..., 1]), 0, H - 1).astype(jnp.int32)
    sx = gx[yi, xi]   # (K, B*W, S)
    sy = gy[yi, xi]
    g_par = sx * dl[:, None, None, 0] + sy * dl[:, None, None, 1]
    g_nrm = sx * dn[:, None, None, 0] + sy * dn[:, None, None, 1]

    # half-wave components
    feats = jnp.stack([
        jnp.maximum(g_par, 0.0), jnp.maximum(-g_par, 0.0),
        jnp.maximum(g_nrm, 0.0), jnp.maximum(-g_nrm, 0.0),
    ], axis=-1)  # (K, B*W, S, 4)

    K = sp.shape[0]
    feats = feats.reshape(K, BANDS, BAND_W * SAMPLES, 4)
    mean = jnp.mean(feats, axis=2)                       # (K, BANDS, 4)
    std = jnp.std(feats, axis=2)                         # (K, BANDS, 4)
    f = jnp.concatenate([mean, std], axis=-1).reshape(K, FEAT_DIM)
    # normalize (affine-light invariance)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-9)

    pairs = jnp.asarray(_PAIRS)
    bits = (f[:, pairs[:, 0]] > f[:, pairs[:, 1]]).astype(jnp.uint8)
    desc = pack_bits(bits)
    return jnp.where(valid[:, None], desc, 0)
