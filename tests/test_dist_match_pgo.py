"""Sharded matcher and edge-sharded PGO vs their single-device oracles on
the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.backend import pgo
from plslam_tpu.core import lie
from plslam_tpu.ops import matching as M
from plslam_tpu.ops.descriptors import hamming_distance_matrix
from plslam_tpu.parallel import dist_match
from plslam_tpu.parallel.mesh import make_mesh

N_DEV = 8


def test_dist_matcher_matches_single_device():
    rng = np.random.default_rng(3)
    nq, ndb = 64 * N_DEV, 300
    dq = rng.integers(0, 2**32, (nq, 8), dtype=np.uint32)
    ddb = rng.integers(0, 2**32, (ndb, 8), dtype=np.uint32)
    # plant strong matches
    for i in range(0, ndb, 3):
        ddb[i] = dq[i % nq]
    vq = rng.random(nq) < 0.95
    vdb = rng.random(ndb) < 0.95

    ref = M.match_mutual_nnr(
        hamming_distance_matrix(jnp.asarray(dq), jnp.asarray(ddb)),
        jnp.asarray(vq)[:, None] & jnp.asarray(vdb)[None, :], 0.9)

    mesh = make_mesh(N_DEV)
    run = dist_match.make_dist_matcher(mesh, nnr=0.9)
    from jax.sharding import NamedSharding, PartitionSpec as P

    idx, dist = run(
        jax.device_put(jnp.asarray(dq), NamedSharding(mesh, P("lm"))),
        jax.device_put(jnp.asarray(vq), NamedSharding(mesh, P("lm"))),
        jax.device_put(jnp.asarray(ddb), NamedSharding(mesh, P())),
        jax.device_put(jnp.asarray(vdb), NamedSharding(mesh, P())))
    got = np.asarray(idx)
    want = np.asarray(ref.idx)
    # identical decisions except possible tie-breaks
    agree = (got == want)
    assert agree.mean() > 0.98, (got[~agree], want[~agree])


def _square_loop(n_side=3, noise=0.03, seed=23):
    rng = np.random.default_rng(seed)
    xis = []
    for leg in range(4):
        for s in range(n_side):
            xi = np.zeros(6)
            xi[0] = 1.0
            if s == n_side - 1:
                xi[5] = np.pi / 2
            xis.append(xi)
    noisy = [x + rng.normal(size=6) * noise for x in xis]
    T = [np.eye(4)]
    for xn in noisy:
        T.append(T[-1] @ np.asarray(lie.exp_se3(jnp.asarray(xn))))
    K = len(T)
    e_i = list(range(K - 1)) + [K - 1]
    e_j = list(range(1, K)) + [0]
    e_T = [np.asarray(lie.exp_se3(jnp.asarray(x))) for x in noisy]
    e_T.append(np.eye(4))
    # pad edges to a multiple of N_DEV
    E = len(e_i)
    pad = (-E) % N_DEV
    e_valid = [True] * E + [False] * pad
    e_i += [0] * pad
    e_j += [0] * pad
    e_T += [np.eye(4)] * pad
    g = pgo.PoseGraph(
        T_w_k=jnp.asarray(np.stack(T)),
        fixed=jnp.arange(K) == 0,
        valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i, jnp.int32),
        e_j=jnp.asarray(e_j, jnp.int32),
        e_T=jnp.asarray(np.stack(e_T)),
        e_info=jnp.ones(E + pad),
        e_valid=jnp.asarray(e_valid),
    )
    return g


def test_dist_pgo_matches_single_device():
    g = _square_loop()
    ref = jax.jit(pgo.optimize, static_argnums=1)(g, 10)
    mesh = make_mesh(N_DEV)
    run = dist_match.make_dist_pgo(mesh, iters=10)
    got = run(dist_match.shard_posegraph(mesh, g))
    np.testing.assert_allclose(
        np.asarray(got.T_w_k), np.asarray(ref.T_w_k), atol=1e-6)
    # loop actually closed
    drift = float(jnp.linalg.norm(got.T_w_k[-1][:3, 3] - got.T_w_k[0][:3, 3]))
    assert drift < 0.02
