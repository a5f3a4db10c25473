"""Line Band Descriptor (LBD), batched, gather-free.

Replaces the vendored BinaryDescriptor (3rdparty/line_descriptor,
binary_descriptor_custom.cpp:836-848: band-based statistics over a line
support region, binarized to 256 bits).

TPU formulation: Q patches of (P x P) pixels are extracted at evenly
spaced centers along each segment with one-hot matmuls (ops/patches.py),
on a side-by-side stack of the Sobel gradient images so one extraction
pass serves both gx and gy.  Inside each patch a line-aligned
(BANDS*BAND_W across) x (S along) rotated grid is sampled via one-hot
contractions; gradients are rotated into the line frame; each band
contributes mean/std of the 4 half-wave components (positive/negative
parallel and normal gradients — the classic LBD features) pooled over all
patches; the float feature vector is binarized by a fixed random-pair
comparison pattern into 256 bits, matching the binary-matcher interface.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .descriptors import pack_bits
from .image import blur, sobel
from .patches import (apply_patch_onehots, apply_sample_onehots,
                      make_patch_onehots, make_sample_onehots)

BANDS = 9            # classic LBD: m = 9 bands
BAND_W = 5           # band width in px (45 across fits the patch radius)
Q_PATCHES = 6        # patches along the segment
S_ALONG = 6          # along-line samples per patch
PATCH = 48
CENTER = 23.0
FEAT_DIM = BANDS * 8  # mean+std of 4 half-wave components per band


def _pair_pattern(seed: int = 4321, max_band_gap: int = 2) -> np.ndarray:
    """(256, 2) index pairs over the feature vector for binarization.

    Pairs are drawn between features of NEARBY bands (|band gap| <=
    max_band_gap): local comparisons change less under viewpoint/photometric
    drift than long-range ones, which measurably lowers the wrong-match
    rate (scripts/line_match_quality.py)."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < 256:
        i = int(rng.integers(0, FEAT_DIM))
        j = int(rng.integers(0, FEAT_DIM))
        if i == j or abs(i // 8 - j // 8) > max_band_gap:
            continue
        out.append((i, j))
    return np.asarray(out, np.int64)


_PAIRS = _pair_pattern()


def _patch_centers(sp: jax.Array, ep: jax.Array) -> jax.Array:
    """(K, Q, 2) evenly spaced patch centers along each segment."""
    tq = (jnp.arange(Q_PATCHES, dtype=sp.dtype) + 0.5) / Q_PATCHES
    return sp[:, None, :] + tq[None, :, None] * (ep - sp)[:, None, :]


def describe(img: jax.Array, sp: jax.Array, ep: jax.Array, valid: jax.Array):
    """(K, 8) uint32 packed LBD descriptors for segments (sp, ep)."""
    g = blur(img, 1.4)
    gx, gy = sobel(g)
    H, W = gx.shape
    K = sp.shape[0]

    # one pair of selection matrices serves BOTH gradient images — the
    # one-hots are built once, each extraction is one big MXU matmul
    c2 = _patch_centers(sp, ep).reshape(K * Q_PATCHES, 2)
    OY, OX = make_patch_onehots(c2, PATCH, H, W, center_offset=CENTER)
    px = apply_patch_onehots(gx, OY, OX)                # (KQ, P, P)
    py = apply_patch_onehots(gy, OY, OX)
    return _describe_from_patches(px, py, sp, ep, valid)


def describe_batch(imgs: jax.Array, sp: jax.Array, ep: jax.Array,
                   valid: jax.Array):
    """Batched LBD on a (B, H, W) stack via the Pallas block-DMA patch
    gather: gx and gy of all images stack into one (2B, H, W) batch so a
    single kernel launch serves both gradient fields (bit-identical
    patches to the one-hot path).  sp/ep/valid carry leading (B,)."""
    from .pallas_patches import gather_patches_batch

    B, K = sp.shape[0], sp.shape[1]
    g = jax.vmap(lambda im: blur(im, 1.4))(imgs)
    gx, gy = jax.vmap(sobel)(g)                         # (B, H, W) each
    c2 = jax.vmap(_patch_centers)(sp, ep).reshape(B, K * Q_PATCHES, 2)
    y0 = jnp.floor(c2[..., 1] + 0.5).astype(jnp.int32) - int(CENTER)
    x0 = jnp.floor(c2[..., 0] + 0.5).astype(jnp.int32) - int(CENTER)
    pat = gather_patches_batch(
        jnp.concatenate([gx, gy], axis=0),
        jnp.concatenate([y0, y0], axis=0),
        jnp.concatenate([x0, x0], axis=0), PATCH)       # (2B, KQ, P, P)
    return jax.vmap(_describe_from_patches)(pat[:B], pat[B:], sp, ep, valid)


def _describe_from_patches(px: jax.Array, py: jax.Array, sp: jax.Array,
                           ep: jax.Array, valid: jax.Array):
    """Descriptor tail shared by the one-hot and block-DMA patch paths;
    px/py: (K*Q, P, P) gradient patches."""
    K = sp.shape[0]
    d = ep - sp
    length = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    dl = d / length                                     # line direction
    dn = jnp.stack([-dl[..., 1], dl[..., 0]], axis=-1)  # normal

    # line-aligned sample grid inside each patch
    half = (BANDS * BAND_W) / 2.0
    a_off = (jnp.arange(BANDS * BAND_W, dtype=sp.dtype) + 0.5) - half
    seg_span = jnp.minimum(length[:, 0] / Q_PATCHES, 2 * (CENTER - half / 2))
    s_off = ((jnp.arange(S_ALONG, dtype=sp.dtype) + 0.5) / S_ALONG - 0.5)
    # (K, A, S) offsets -> in-patch coords via line frame
    s_px = s_off[None, None, :] * seg_span[:, None, None]
    u = (CENTER + s_px * dl[:, None, None, 0]
         + a_off[None, :, None] * dn[:, None, None, 0])
    v = (CENTER + s_px * dl[:, None, None, 1]
         + a_off[None, :, None] * dn[:, None, None, 1])
    A = BANDS * BAND_W
    uv = jnp.stack([u, v], -1).reshape(K, A * S_ALONG, 2)
    uv_q = jnp.broadcast_to(uv[:, None], (K, Q_PATCHES, A * S_ALONG, 2)
                            ).reshape(K * Q_PATCHES, A * S_ALONG, 2)
    OV, OU = make_sample_onehots(uv_q, PATCH)
    sx = apply_sample_onehots(px, OV, OU).reshape(K, Q_PATCHES, A, S_ALONG)
    sy = apply_sample_onehots(py, OV, OU).reshape(K, Q_PATCHES, A, S_ALONG)

    g_par = (sx * dl[:, None, None, None, 0]
             + sy * dl[:, None, None, None, 1])
    g_nrm = (sx * dn[:, None, None, None, 0]
             + sy * dn[:, None, None, None, 1])

    # half-wave components, pooled per band over (BAND_W, S, Q)
    feats = jnp.stack([
        jnp.maximum(g_par, 0.0), jnp.maximum(-g_par, 0.0),
        jnp.maximum(g_nrm, 0.0), jnp.maximum(-g_nrm, 0.0),
    ], axis=-1)                                         # (K, Q, A, S, 4)
    feats = feats.transpose(0, 2, 1, 3, 4).reshape(
        K, BANDS, BAND_W * Q_PATCHES * S_ALONG, 4)
    mean = jnp.mean(feats, axis=2)                      # (K, BANDS, 4)
    std = jnp.std(feats, axis=2)                        # (K, BANDS, 4)
    f = jnp.concatenate([mean, std], axis=-1).reshape(K, FEAT_DIM)
    # normalize (affine-light invariance)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-9)

    pairs = jnp.asarray(_PAIRS)
    bits = (f[:, pairs[:, 0]] > f[:, pairs[:, 1]]).astype(jnp.uint8)
    desc = pack_bits(bits)
    return jnp.where(valid[:, None], desc, 0)
