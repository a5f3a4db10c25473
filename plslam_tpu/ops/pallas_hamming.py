"""Pallas TPU kernel for the 256-bit Hamming distance matrix.

The matcher's hot op (reference: scalar popcount loop, matching.cpp:93-109).
Kernel strategy per /opt/skills/guides/pallas_guide.md:

- grid tiles of (TILE_N1 x TILE_N2) outputs;
- each program unpacks its (TILE, 8) uint32 descriptor blocks into
  (TILE, 256) +/-1 bf16 operands in VMEM (VPU shifts) and feeds one
  (TILE, 256) x (256, TILE) matmul to the MXU with f32 accumulation:
  popcount(a XOR b) = (256 - <a_pm, b_pm>) / 2, exact because the dot of
  two {-1,+1}^256 vectors is an even integer in [-256, 256];
- block specs keep everything in VMEM; tiles are 128-aligned.

Falls back to the jnp implementation (ops/descriptors.py) on non-TPU
backends; the jnp path is also the exactness oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .descriptors import DESC_BITS, DESC_WORDS, hamming_distance_matrix

TILE = 128


def _kernel(d1_ref, d2_ref, out_ref):
    shifts = jnp.arange(32, dtype=jnp.uint32)

    def unpack(block):  # (TILE, 8) uint32 -> (TILE, 256) bf16 in {-1, +1}
        bits = (block[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        bits = bits.reshape(block.shape[0], DESC_BITS)
        return (bits.astype(jnp.bfloat16) * 2.0 - 1.0)

    a = unpack(d1_ref[:])                      # (TILE, 256)
    b = unpack(d2_ref[:])                      # (TILE, 256)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[:] = ((DESC_BITS - dot) * 0.5).astype(jnp.int32)


def hamming_distance_matrix_pallas(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(N1, 8) x (N2, 8) uint32 -> (N1, N2) int32 Hamming distances.

    N1, N2 must be multiples of 128 (the matcher pads feature sets to
    lane-aligned capacities already).
    """
    n1, n2 = d1.shape[0], d2.shape[0]
    assert n1 % TILE == 0 and n2 % TILE == 0, (n1, n2)
    grid = (n1 // TILE, n2 // TILE)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, DESC_WORDS), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, DESC_WORDS), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n1 * n2 * DESC_BITS,
            bytes_accessed=(n1 + n2) * DESC_WORDS * 4 + n1 * n2 * 4,
            transcendentals=0,
        ),
    )(d1, d2)


def hamming_auto(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """Pallas on TPU when shapes are tile-aligned; jnp fallback otherwise."""
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and d1.shape[0] % TILE == 0 and d2.shape[0] % TILE == 0:
        return hamming_distance_matrix_pallas(d1, d2)
    return hamming_distance_matrix(d1, d2)
