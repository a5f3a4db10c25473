"""Pallas TPU kernel: fused FAST-9 score map + 3x3 non-max suppression.

The XLA formulation (ops/fast.py) materializes 16 rolled image copies and
a (9, 16, H, W) windowed-min stack in HBM; this kernel keeps one padded
row-band of the image in VMEM and produces both the raw margin map and the
NMS'd map in a single pass — no HBM intermediates.

Tiling: the (B, H+8, W+6) zero-padded image stack stays in HBM; the grid
is (batch, row-band).  Each step DMAs an 88-row band (80 output rows +
score/NMS halos) into VMEM scratch, computes the 16 ring differences as
shifted static slices, the >=9-contiguous arc test as a windowed min over
the doubled ring axis, and the 3x3 NMS with -inf column halos.  Zero
padding creates junk scores in the 3-px frame, which the caller's border
mask (orb_edge_th=19) discards — same as the wraparound artifacts of the
jnp version.  (The batch lives in the grid because Pallas TPU requires
ANY-space operands to be passed whole, so vmap cannot batch them.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC, RING

_ROWS = 32          # output rows per grid step (VMEM budget)
_HALO = 4           # 3 ring + 1 nms
_BAND = _ROWS + 2 * _HALO


def _kernel(thr_ref, img_hbm, raw_ref, nms_ref, scratch, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    W = raw_ref.shape[1]
    dma = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * _ROWS, _BAND), :], scratch, sem)
    dma.start()
    dma.wait()

    thr = thr_ref[b]
    # scores for _ROWS + 2 rows (one NMS halo row each side); the center
    # pixel of score row tt sits at scratch[tt + 3, x + 3]
    SR = _ROWS + 2
    center = scratch[3:3 + SR, 3:3 + W]
    diffs = [scratch[3 + dy:3 + dy + SR, 3 + dx:3 + dx + W] - center
             for (dx, dy) in RING]

    def arc_margin(ds):
        d2 = ds + ds  # doubled ring axis (list concat)
        best = None
        for k in range(16):
            m = d2[k]
            for a in range(1, ARC):
                m = jnp.minimum(m, d2[k + a])
            best = m if best is None else jnp.maximum(best, m)
        return best

    margin = jnp.maximum(arc_margin(diffs),
                         arc_margin([-d for d in diffs]))
    score = jnp.where(margin > thr, margin, 0.0)     # (SR, W)

    raw_ref[:, :] = score[1:1 + _ROWS, :]

    # 3x3 NMS with -inf outside the image columns (SAME semantics)
    neg = jnp.full((SR, 1), -jnp.inf, score.dtype)
    sc = jnp.concatenate([neg, score, neg], axis=1)  # (SR, W+2)
    mx = score[1:1 + _ROWS, :]
    for dy in range(3):
        for dx in range(3):
            if dx == 1 and dy == 1:
                continue
            mx = jnp.maximum(mx, sc[dy:dy + _ROWS, dx:dx + W])
    out = score[1:1 + _ROWS, :]
    nms_ref[:, :] = jnp.where((out >= mx) & (out > 0.0), out, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_score_nms_batch(imgs: jax.Array, threshold,
                         interpret: bool = False):
    """(raw_margin, nms) maps of FAST-9 on a (B, H, W) image stack.

    Matches ops/fast.fast_score_map + nms3x3 away from the 3-px border.
    ``threshold`` is a scalar or a per-image (B,) vector (the adaptive-FAST
    batched-VO path tracks one threshold per sequence).
    """
    B, H, W = imgs.shape
    Hp = -(-H // _ROWS) * _ROWS
    # lane (last) dim of DMA slices must be 128-aligned on TPU
    Wp = -(-(W + 6) // 128) * 128
    padded = jnp.zeros((B, Hp + 2 * _HALO, Wp), imgs.dtype)
    padded = padded.at[:, _HALO:_HALO + H, 3:3 + W].set(imgs)
    thr = jnp.broadcast_to(jnp.asarray(threshold, imgs.dtype), (B,))

    grid = (B, Hp // _ROWS)
    raw, nms = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((None, _ROWS, W), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, _ROWS, W), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((_BAND, Wp), imgs.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, W), imgs.dtype),
            jax.ShapeDtypeStruct((B, Hp, W), imgs.dtype),
        ],
        interpret=interpret,
    )(thr, padded)
    return raw[:, :H], nms[:, :H]


def fast_score_nms(img: jax.Array, threshold, interpret: bool = False):
    """Single-image convenience wrapper."""
    raw, nms = fast_score_nms_batch(img[None], threshold,
                                    interpret=interpret)
    return raw[0], nms[0]
