"""Pose-graph optimization and BoW vocabulary tests (SURVEY.md §4:
property tests — PGO closes synthetic loops; retrieval ranks true revisits
first)."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.core import lie
from plslam_tpu.backend import pgo, vocab

RNG = np.random.default_rng(21)


@jax.jit
def _build_loop(odo_xi_noisy, odo_xi_true):
    """Chain the noisy odometry into drifting poses; ground truth closes a
    loop (last pose == first)."""
    def chain(T, xi):
        T2 = T @ lie.exp_se3(xi)
        return T2, T2

    K = odo_xi_noisy.shape[0] + 1
    I = jnp.eye(4, dtype=odo_xi_noisy.dtype)
    _, Ts = jax.lax.scan(chain, I, odo_xi_noisy)
    poses = jnp.concatenate([I[None], Ts], axis=0)
    return poses


def make_loop(n=12, noise=0.02):
    """A square loop: n segments returning to the start."""
    dtype = jnp.float64
    side = n // 4
    xis = []
    for leg in range(4):
        for s in range(side):
            xi = np.zeros(6)
            xi[0] = 1.0  # move +x in body frame
            if s == side - 1:
                xi[5] = np.pi / 2  # then turn 90 degrees
            xis.append(xi)
    xis = np.asarray(xis)
    noisy = xis + RNG.normal(size=xis.shape) * noise
    poses = _build_loop(jnp.asarray(noisy, dtype), jnp.asarray(xis, dtype))
    K = len(poses)
    # edges: consecutive odometry (the *noisy* measurements are consistent
    # with the chained initialization, so residuals start at 0) + loop edge
    # with the true measurement (identity: last pose == first pose).
    e_i = list(range(K - 1)) + [K - 1]
    e_j = list(range(1, K)) + [0]
    e_T = [jnp.asarray(np.asarray(lie.exp_se3(jnp.asarray(x, dtype)))) for x in noisy]
    e_T.append(jnp.eye(4, dtype=dtype))  # loop closure: T_{K-1}^-1 T_0 = I
    g = pgo.PoseGraph(
        T_w_k=poses,
        fixed=jnp.arange(K) == 0,
        valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i, jnp.int32),
        e_j=jnp.asarray(e_j, jnp.int32),
        e_T=jnp.stack(e_T),
        e_info=jnp.ones(len(e_i), dtype),
        e_valid=jnp.ones(len(e_i), bool),
    )
    return g


def test_pgo_closes_loop():
    g = make_loop(noise=0.03)
    drift_before = float(jnp.linalg.norm(g.T_w_k[-1][:3, 3] - g.T_w_k[0][:3, 3]))
    assert drift_before > 0.05  # the chain drifted
    g2 = jax.jit(pgo.optimize, static_argnums=(1,))(g, 15)
    # loop edge satisfied: last pose back at origin
    drift_after = float(jnp.linalg.norm(g2.T_w_k[-1][:3, 3] - g2.T_w_k[0][:3, 3]))
    assert drift_after < 0.02, (drift_before, drift_after)
    # gauge: pose 0 untouched
    np.testing.assert_allclose(np.asarray(g2.T_w_k[0]), np.eye(4), atol=1e-12)
    # cost decreased
    _, _, c0 = jax.jit(pgo.build_system)(g)
    _, _, c1 = jax.jit(pgo.build_system)(g2)
    assert float(c1) < float(c0)


def test_pgo_edge_jacobians_vs_residual_change():
    g = make_loop(noise=0.01)
    H, b, cost = jax.jit(pgo.build_system)(g)
    assert np.isfinite(np.asarray(H)).all()
    assert np.isfinite(float(cost))


def test_landmark_correction_rigid():
    g = make_loop(noise=0.05)
    g2 = jax.jit(pgo.optimize, static_argnums=(1,))(g, 10)
    pts = jnp.asarray(RNG.normal(size=(30, 3)) + np.array([0, 0, 5.0]))
    owner = jnp.asarray(RNG.integers(0, len(g.T_w_k), 30), jnp.int32)
    moved = jax.jit(pgo.correct_landmarks)(g.T_w_k, g2.T_w_k, owner, pts)
    # landmarks follow their owner: point expressed in owner frame unchanged
    T_rel_old = jax.vmap(lie.inv_se3)(g.T_w_k)[owner]
    T_rel_new = jax.vmap(lie.inv_se3)(g2.T_w_k)[owner]
    local_old = jax.jit(jax.vmap(lie.transform_point))(T_rel_old, pts)
    local_new = jax.jit(jax.vmap(lie.transform_point))(T_rel_new, moved)
    np.testing.assert_allclose(np.asarray(local_new), np.asarray(local_old), atol=1e-5)


def rand_desc(n, rng):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_vocab_retrieval_ranks_revisit_first():
    rng = np.random.default_rng(5)
    corpus = rand_desc(2000, rng)
    voc = vocab.train_vocabulary(corpus, k=6, depth=2, iters=4)

    # "scenes": subsets of corpus descriptors; revisit = same scene + noise
    def flip_bits(d, nbits):
        d = d.copy()
        for row in d:
            for _ in range(nbits):
                w = rng.integers(0, 8)
                row[w] ^= np.uint32(1) << rng.integers(0, 32)
        return d

    scene_a = corpus[:150]
    scene_b = corpus[500:650]
    scene_c = corpus[1200:1350]
    revisit_a = flip_bits(scene_a, 2)

    tf = jax.jit(lambda d, v: vocab.transform(voc, d, v))
    ones = jnp.ones(150, bool)
    va = tf(jnp.asarray(scene_a), ones)
    vb = tf(jnp.asarray(scene_b), ones)
    vc = tf(jnp.asarray(scene_c), ones)
    vq = tf(jnp.asarray(revisit_a), ones)

    db = jnp.stack([va, vb, vc])
    scores = np.asarray(jax.jit(vocab.score_against_database)(
        vq, db, jnp.ones(3, bool)))
    assert scores.argmax() == 0, scores
    assert scores[0] > max(scores[1], scores[2]) + 0.1, scores


def test_vocab_score_properties():
    rng = np.random.default_rng(6)
    corpus = rand_desc(500, rng)
    voc = vocab.train_vocabulary(corpus, k=5, depth=2, iters=3)
    d = jnp.asarray(rand_desc(80, rng))
    v = jax.jit(lambda dd, vv: vocab.transform(voc, dd, vv))(d, jnp.ones(80, bool))
    # normalized
    np.testing.assert_allclose(float(jnp.sum(v)), 1.0, atol=1e-5)
    # self-similarity is 1
    np.testing.assert_allclose(float(vocab.l1_score(v, v)), 1.0, atol=1e-6)
