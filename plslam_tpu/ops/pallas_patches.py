"""Pallas TPU kernel: batched patch extraction as block DMA.

The XLA formulation (ops/patches.py) expresses patch extraction as one-hot
matmuls because scattered element gathers lower to DMA-per-element on TPU.
The matmul form is MXU-friendly but pays dense-contraction FLOPs: the row
selection alone is (K*P, H) @ (H, W) — 42 GFLOP per ORB describe pass and
53 GFLOP per LBD pass at EuRoC scale, ~80% of the whole detect budget
(scripts/roofline.py).  A plain XLA row gather measures no better (2.6 vs
2.2 ms — still element-wise DMA).

A patch, however, IS a contiguous (P, P) block: the right hardware shape
is one async block DMA per patch.  This kernel stages G patches per grid
step: each DMAs a (P, 256)-wide, 128-lane-aligned band from the padded
image in HBM into VMEM, then slices the true column window out with an
in-register dynamic slice.  Zero padding of P px on every side reproduces
the one-hot path's zero fill for out-of-image reads bit-for-bit.

Bytes moved: N * P * 256 * 4 (e.g. ORB 1200 patches -> 59 MB, ~72 us of
HBM traffic) versus ~1 ms of MXU time for the matmul form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8         # f32 sublane tiling: DMA row starts must be 8-aligned
_XB = 2 * _LANE  # staging width: 128-aligned start + offset < 128 + P <= 128


def _issue(G, yblk_ref, xblk_ref, img_hbm, scratch, sems, b, j, slot):
    """Start the G async patch-band copies of group j into buffer `slot`."""
    copies = []
    for g in range(G):
        i = j * G + g
        # blk * tile keeps the DMA starts provably aligned for Mosaic
        # (sublane tiling 8 in rows, lane tiling 128 in columns)
        c = pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(yblk_ref[b, i] * _SUB, scratch.shape[2]),
                       pl.ds(xblk_ref[b, i] * _LANE, _XB)],
            scratch.at[slot, g], sems.at[slot, g])
        c.start()
        copies.append(c)
    return copies


def _kernel(G, P, nj, yblk_ref, xblk_ref, yoff_ref, xoff_ref, img_hbm,
            out_ref, scratch, sems):
    b = pl.program_id(0)
    j = pl.program_id(1)
    PB = P + _SUB
    slot = jax.lax.rem(j, jnp.int32(2))

    # double buffer: group 0 of each image issues its own copies; every
    # step prefetches group j+1 into the other slot so the DMAs of the
    # next group overlap this group's selection math
    @pl.when(j == 0)
    def _first():
        _issue(G, yblk_ref, xblk_ref, img_hbm, scratch, sems, b, 0, 0)

    @pl.when(j + 1 < nj)
    def _prefetch():
        _issue(G, yblk_ref, xblk_ref, img_hbm, scratch, sems, b, j + 1,
               1 - slot)

    for g in range(G):
        pltpu.make_async_copy(img_hbm.at[b, pl.ds(0, PB), pl.ds(0, _XB)],
                              scratch.at[slot, g], sems.at[slot, g]).wait()

    # Mosaic cannot dynamic-slice VMEM at arbitrary offsets (rows must be
    # 8-aligned, lanes 128-aligned), so the true (P, P) window is picked
    # with two one-hot contractions, batched over the G patches of the
    # group so Mosaic emits two MXU ops per step instead of 2*G
    lane = jax.lax.broadcasted_iota(jnp.int32, (_XB, P), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_XB, P), 1)
    rout = jax.lax.broadcasted_iota(jnp.int32, (P, PB), 0)
    rin = jax.lax.broadcasted_iota(jnp.int32, (P, PB), 1)
    colsel = jnp.stack([
        (lane == col + xoff_ref[b, j * G + g]).astype(jnp.float32)
        for g in range(G)])                              # (G, XB, P)
    rowsel = jnp.stack([
        (rin == rout + yoff_ref[b, j * G + g]).astype(jnp.float32)
        for g in range(G)])                              # (G, P, PB)
    cols = jax.lax.dot_general(
        scratch[slot], colsel,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, PB, P)
    out_ref[...] = jax.lax.dot_general(
        rowsel, cols, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (G, P, P)


@functools.partial(jax.jit,
                   static_argnames=("patch", "group", "interpret"))
def gather_patches_batch(imgs: jax.Array, y0: jax.Array, x0: jax.Array,
                         patch: int, group: int = 8,
                         interpret: bool = False) -> jax.Array:
    """(B, N, P, P) patches: patch[b, n, r, c] = imgs[b, y0+r, x0+c],
    zero outside the image — bit-identical to the one-hot-matmul path of
    ops/patches.py for integer top-left corners (y0, x0) with
    |overhang| <= P.

    imgs: (B, H, W) float32; y0, x0: (B, N) int32 top-left corners.
    """
    assert patch <= _LANE, "patch side must fit one staging lane block"
    B, H, W = imgs.shape
    N = y0.shape[1]
    P = patch
    G = group
    Np = -(-N // G) * G
    if Np != N:
        y0 = jnp.concatenate(
            [y0, jnp.zeros((B, Np - N), y0.dtype)], axis=1)
        x0 = jnp.concatenate(
            [x0, jnp.zeros((B, Np - N), x0.dtype)], axis=1)
    PB = P + _SUB
    Hp = -(-(H + 2 * P + _SUB) // _SUB) * _SUB
    Wp = -(-(W + 2 * P + _XB) // _LANE) * _LANE
    padded = jnp.zeros((B, Hp, Wp), imgs.dtype)
    padded = padded.at[:, P:P + H, P:P + W].set(imgs)
    y0p = jnp.clip(y0.astype(jnp.int32) + P, 0, Hp - PB)
    x0p = jnp.clip(x0.astype(jnp.int32) + P, 0, Wp - _XB)
    yblk = y0p // _SUB
    yoff = y0p - yblk * _SUB
    xblk = x0p // _LANE
    xoff = x0p - xblk * _LANE

    out = pl.pallas_call(
        functools.partial(_kernel, G, P, Np // G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Np // G),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((None, G, P, P),
                                   lambda b, j, *_: (b, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G, PB, _XB), imgs.dtype),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, P, P), imgs.dtype),
        interpret=interpret,
    )(yblk, xblk, yoff, xoff, padded)
    return out[:, :N]
