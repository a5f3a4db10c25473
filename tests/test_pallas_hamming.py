"""Pallas Hamming kernel: exactness vs the jnp oracle (interpret mode on
CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.ops import pallas_hamming as PH
from plslam_tpu.ops.descriptors import hamming_distance_matrix


def test_pallas_kernel_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
    ref = np.asarray(jax.jit(hamming_distance_matrix)(d1, d2))

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PH.hamming_distance_matrix_pallas(d1, d2))
    np.testing.assert_array_equal(got, ref)


def test_auto_fallback_on_cpu():
    rng = np.random.default_rng(1)
    d1 = jnp.asarray(rng.integers(0, 2**32, (100, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (60, 8), dtype=np.uint32))
    got = np.asarray(PH.hamming_auto(d1, d2))
    ref = np.asarray(jax.jit(hamming_distance_matrix)(d1, d2))
    np.testing.assert_array_equal(got, ref)
