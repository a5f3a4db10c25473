"""Pallas block-DMA patch gather vs exact zero-padded windows
(interpret mode off-TPU; the TPU path is exercised by scripts/roofline.py)."""

import numpy as np
import jax.numpy as jnp

from plslam_tpu.ops.pallas_patches import gather_patches_batch


def _exact(img, y0, x0, P):
    B, H, W = img.shape
    N = y0.shape[1]
    pad = np.zeros((B, H + 2 * P, W + 2 * P), np.float32)
    pad[:, P:P + H, P:P + W] = img
    return np.stack([
        np.stack([pad[b, y0[b, n] + P:y0[b, n] + 2 * P,
                      x0[b, n] + P:x0[b, n] + 2 * P] for n in range(N)])
        for b in range(B)])


def test_gather_patches_matches_exact_windows():
    rng = np.random.default_rng(0)
    B, H, W, N, P = 2, 120, 200, 37, 48          # N not a multiple of group
    img = rng.standard_normal((B, H, W)).astype(np.float32)
    # corners from fully outside (negative) to fully outside (past the edge)
    y0 = rng.integers(-P, H, size=(B, N)).astype(np.int32)
    x0 = rng.integers(-P, W, size=(B, N)).astype(np.int32)
    out = gather_patches_batch(jnp.asarray(img), jnp.asarray(y0),
                               jnp.asarray(x0), patch=P, group=8,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _exact(img, y0, x0, P))


def test_gather_patches_small_patch_and_group():
    rng = np.random.default_rng(1)
    B, H, W, N, P = 1, 64, 96, 16, 16
    img = rng.standard_normal((B, H, W)).astype(np.float32)
    y0 = rng.integers(0, H - P, size=(B, N)).astype(np.int32)
    x0 = rng.integers(0, W - P, size=(B, N)).astype(np.int32)
    out = gather_patches_batch(jnp.asarray(img), jnp.asarray(y0),
                               jnp.asarray(x0), patch=P, group=4,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _exact(img, y0, x0, P))


def test_describe_batch_matches_vmapped(monkeypatch):
    """orb/lbd describe_batch (block-DMA patches) == vmapped one-hot path."""
    import functools
    import jax

    from plslam_tpu.ops import lbd, orb
    from plslam_tpu.ops import pallas_patches as pp

    monkeypatch.setattr(pp, "gather_patches_batch",
                        functools.partial(pp.gather_patches_batch.__wrapped__,
                                          interpret=True))
    rng = np.random.default_rng(2)
    B, H, W, K = 2, 96, 128, 24
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(24, 70, (B, K, 2)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(B, K)) > 0.2)
    want_d, want_th = jax.vmap(orb.describe)(imgs, xy, valid)
    got_d, got_th = orb.describe_batch(imgs, xy, valid)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))
    np.testing.assert_allclose(np.asarray(got_th)[np.asarray(valid)],
                               np.asarray(want_th)[np.asarray(valid)],
                               rtol=1e-6)

    sp = jnp.asarray(rng.uniform(30, 60, (B, K, 2)).astype(np.float32))
    ep = sp + jnp.asarray(rng.uniform(-20, 20, (B, K, 2)).astype(np.float32))
    want = jax.vmap(lbd.describe)(imgs, sp, ep, valid)
    got = lbd.describe_batch(imgs, sp, ep, valid)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
