"""Numeric workarounds for backend quirks.

The XLA:CPU build in this environment evaluates ``cos`` on small (0-d /
few-element) float64 arrays through a float32-precision scalar path
(~3e-8 error), while ``sin`` is correctly rounded at every size.  All
math-core code therefore computes cosine through the exact identity

    cos(x) = 1 - 2 sin^2(x/2)

which restores full f64 precision (measured max err ~1e-14) at the cost of
one extra multiply.  On TPU (f32 compute) the difference is immaterial.
"""

import jax.numpy as jnp


def cos(x):
    s = jnp.sin(0.5 * x)
    return 1.0 - 2.0 * s * s
