"""Device-mesh helpers for the distributed solvers.

The SLAM-domain sharding map (SURVEY.md §2.4): landmarks ("lm" axis) are
the data-parallel dimension of bundle adjustment — every landmark block
carries its own observations, Hessian blocks, and Schur contributions, and
only the small reduced camera system is psum-reduced across devices.
Keyframe-sequence blocks use the same axis for the pose-graph solver.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "lm") -> Mesh:
    """Mesh over the backend that actually has enough devices: prefers the
    default backend, falls back to the forced-multi-device CPU platform
    (for the 8-virtual-device sharding tests)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        try:
            cpus = jax.local_devices(backend="cpu")
            if len(cpus) >= n:
                devs = cpus
        except RuntimeError:
            pass
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, x, axis: str = "lm"):
    """Place an array sharded along its leading dim over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
