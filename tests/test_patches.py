"""One-hot-matmul patch extraction vs direct indexing oracles."""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.ops.patches import (extract_patches, sample_in_patches)


def test_extract_patches_matches_direct_indexing():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    xy = np.stack([rng.uniform(25, 70, 7), rng.uniform(25, 38, 7)], -1)
    P, off = 16, 7.5
    got = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(xy), P,
                                     center_offset=off,
                                     compute_dtype=jnp.float32))
    for k in range(7):
        x0 = int(round(xy[k, 0])) - 8
        y0 = int(round(xy[k, 1])) - 8
        want = img[y0:y0 + P, x0:x0 + P]
        np.testing.assert_allclose(got[k], want, rtol=1e-6)


def test_extract_patches_zero_pads_outside():
    img = jnp.ones((32, 32), jnp.float32)
    xy = jnp.asarray([[0.0, 0.0]])
    p = np.asarray(extract_patches(img, xy, 16, compute_dtype=jnp.float32))
    # center offset 7.5 -> rounds to 8; rows/cols with index <0 are zero
    assert p[0, 0, 0] == 0.0
    assert p[0, 15, 15] == 1.0


def test_sample_in_patches_nearest():
    rng = np.random.default_rng(1)
    patches = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    uv = np.stack([rng.uniform(0, 15, (3, 11)),
                   rng.uniform(0, 15, (3, 11))], -1)
    got = np.asarray(sample_in_patches(jnp.asarray(patches), jnp.asarray(uv),
                                       compute_dtype=jnp.float32))
    for k in range(3):
        for s in range(11):
            ui = int(round(uv[k, s, 0]))
            vi = int(round(uv[k, s, 1]))
            np.testing.assert_allclose(got[k, s], patches[k, vi, ui],
                                       rtol=1e-6)


def test_sample_in_patches_bf16_exact_for_8bit():
    rng = np.random.default_rng(2)
    patches = rng.integers(0, 256, (2, 16, 16)).astype(np.float32)
    uv = np.stack([rng.uniform(0, 15, (2, 9)),
                   rng.uniform(0, 15, (2, 9))], -1)
    got = np.asarray(sample_in_patches(jnp.asarray(patches), jnp.asarray(uv)))
    for k in range(2):
        for s in range(9):
            ui, vi = int(round(uv[k, s, 0])), int(round(uv[k, s, 1]))
            assert got[k, s] == patches[k, vi, ui]
