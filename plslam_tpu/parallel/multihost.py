"""Multi-host (DCN x ICI) mesh story for the distributed solvers.

The reference has no distributed backend at all (threads only, SURVEY.md
§2.4); BASELINE config 5 calls for multi-host map-block-partitioned
global BA on long concatenated sequences.  This module documents and
exercises that path the only way this 1-chip environment allows: the
SAME shard_map programs (parallel/dist_ba.py landmark-sharded BA,
parallel/dist_gba.py kf-block GBA) run unchanged on a 2-axis
``(host, device)`` mesh — "dcn" is the slow cross-host axis, "ici" the
fast intra-host axis — with their reductions written as multi-axis
psums, which XLA lowers hierarchically (reduce over ICI within a host
first, then the already-reduced blocks over DCN).

On a real pod slice each process calls :func:`initialize_distributed`
once, then builds the mesh from ``jax.devices()`` (global devices across
hosts); in tests the virtual 8-CPU platform is reshaped host x device
(e.g. 2 x 4) so the collectives compile and execute with the exact axis
structure a pod run would use.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DCN_AXIS = "dcn"
ICI_AXIS = "ici"
AXES = (DCN_AXIS, ICI_AXIS)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime on a multi-host slice.

    On TPU pods the arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU clusters.  Call once per process BEFORE any
    jax operation; afterwards ``jax.devices()`` spans every host and
    :func:`make_multihost_mesh` lays them out host-major."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(n_hosts: int | None = None,
                        devices_per_host: int | None = None) -> Mesh:
    """(host, device) mesh over the global device set.

    Defaults: n_hosts = jax.process_count() (or the largest power-of-two
    split of a single-process device set, for the virtual-CPU tests),
    devices_per_host = devices / n_hosts.  Device order is host-major, so
    the "dcn" axis strides across processes and "ici" stays within one —
    collectives over "ici" ride the fast interconnect and only the "dcn"
    step crosses the data-center network."""
    devs = jax.devices()
    if len(devs) < 2:
        try:  # the forced-multi-device CPU platform of the test env
            cpus = jax.local_devices(backend="cpu")
            if len(cpus) > len(devs):
                devs = cpus
        except RuntimeError:
            pass
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 2 if len(devs) >= 4 else 1)
    if devices_per_host is None:
        devices_per_host = len(devs) // n_hosts
    n = n_hosts * devices_per_host
    assert n >= 2 and n <= len(devs), (n_hosts, devices_per_host, len(devs))
    grid = np.asarray(devs[:n]).reshape(n_hosts, devices_per_host)
    return Mesh(grid, AXES)


def make_dist_bundle_adjust_2d(mesh: Mesh, cam, cfg, iters: int = 10):
    """Landmark-sharded Schur BA over the (host, device) mesh: landmark
    rows shard over BOTH axes; the reduced camera system psums over
    ("ici", then "dcn") hierarchically.  Algebraically identical to the
    1-axis program (and to the single-device solve)."""
    from . import dist_ba

    return dist_ba.make_dist_bundle_adjust(mesh, cam, cfg, iters,
                                           axes=AXES)


def shard_problem_2d(mesh: Mesh, prob):
    from . import dist_ba

    return dist_ba.shard_problem(mesh, prob, axes=AXES)


def distributed_gba_2d(mapper, mesh: Mesh):
    """kf-block sharded GBA over the (host, device) mesh (exact; see
    parallel/dist_gba.py)."""
    from . import dist_gba

    return dist_gba.distributed_global_bundle_adjustment(mapper, mesh,
                                                         axes=AXES)
