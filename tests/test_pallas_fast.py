"""Fused Pallas FAST score+NMS kernel vs the XLA reference formulation
(interpret mode off-TPU; the TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np

from plslam_tpu.ops import fast
from plslam_tpu.ops.pallas_fast import fast_score_nms_batch

BORDER = 19


def test_pallas_fast_matches_xla():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 480, 752)).astype(np.float32))
    raw_p, nms_p = fast_score_nms_batch(imgs, 20.0, interpret=True)
    for b in range(2):
        raw_j = fast.fast_score_map(imgs[b], 20.0)
        nms_j = fast.nms3x3(raw_j)
        sl = np.s_[BORDER:-BORDER, BORDER:-BORDER]
        np.testing.assert_array_equal(np.asarray(raw_p[b])[sl],
                                      np.asarray(raw_j)[sl])
        np.testing.assert_array_equal(np.asarray(nms_p[b])[sl],
                                      np.asarray(nms_j)[sl])


def test_pallas_fast_odd_sizes():
    """Pyramid levels have non-multiple-of-80 heights and odd widths."""
    rng = np.random.default_rng(1)
    for H, W in ((333, 522), (278, 435)):
        img = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
        raw_p, nms_p = fast_score_nms_batch(img, 15.0, interpret=True)
        raw_j = fast.fast_score_map(img[0], 15.0)
        nms_j = fast.nms3x3(raw_j)
        sl = np.s_[BORDER:-BORDER, BORDER:-BORDER]
        np.testing.assert_array_equal(np.asarray(raw_p[0])[sl],
                                      np.asarray(raw_j)[sl])
        np.testing.assert_array_equal(np.asarray(nms_p[0])[sl],
                                      np.asarray(nms_j)[sl])
