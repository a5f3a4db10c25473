"""Distributed Schur BA on a forced 8-device CPU mesh: the sharded solver
must reproduce the single-device solution (SURVEY.md §4: CPU-backend
multi-device simulation of the distributed Schur BA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.backend import ba
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.core.plucker import plucker_from_two_points, plucker_to_orth
from plslam_tpu.parallel import dist_ba
from plslam_tpu.parallel.mesh import make_mesh

CAM = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074, dtype=jnp.float64)
N_DEV = 8


def make_sharded_problem(K=4, P_shard=8, L_shard=2, pert=0.02, seed=42):
    """Fully-connected synthetic BA problem with observations grouped by
    landmark shard and shard-local landmark indices."""
    rng = np.random.default_rng(seed)
    P = P_shard * N_DEV
    L = L_shard * N_DEV
    dtype = np.float64

    poses_xi = np.concatenate(
        [rng.uniform(-0.5, 0.5, (K, 2)), rng.uniform(-0.1, 0.1, (K, 1)),
         rng.uniform(-0.05, 0.05, (K, 3))], axis=1)
    T_w_c = np.asarray(jax.vmap(lie.exp_se3)(jnp.asarray(poses_xi, jnp.float64)))
    T_c_w = np.linalg.inv(T_w_c)

    Pw = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                   rng.uniform(4, 10, P)], axis=-1)
    LA = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                   rng.uniform(4, 10, L)], axis=-1)
    LB = LA + np.stack([rng.uniform(-1.5, 1.5, L), rng.uniform(-1.5, 1.5, L),
                        rng.uniform(-0.5, 0.5, L)], axis=-1)

    def proj(Tcw, X):
        Xc = (Tcw[:3, :3] @ X.T).T + Tcw[:3, 3]
        return np.stack([367.4 + 435.2 * Xc[:, 0] / Xc[:, 2],
                         252.2 + 435.2 * Xc[:, 1] / Xc[:, 2]], -1)

    # observations ordered landmark-major => contiguous per shard
    p_cam = np.tile(np.arange(K, dtype=np.int32), P)
    p_lm_global = np.repeat(np.arange(P, dtype=np.int32), K)
    p_lm_local = p_lm_global % P_shard          # shard-local slot
    p_uv = np.concatenate([proj(T_c_w[p_cam[i]], Pw[p_lm_global[i]][None])
                           for i in range(K * P)], axis=0)

    l_cam = np.tile(np.arange(K, dtype=np.int32), L)
    l_lm_global = np.repeat(np.arange(L, dtype=np.int32), K)
    l_lm_local = l_lm_global % L_shard
    l_sobs = np.concatenate([proj(T_c_w[l_cam[i]], LA[l_lm_global[i]][None])
                             for i in range(K * L)], axis=0)
    l_eobs = np.concatenate([proj(T_c_w[l_cam[i]], LB[l_lm_global[i]][None])
                             for i in range(K * L)], axis=0)

    Lw = np.asarray(plucker_from_two_points(jnp.asarray(LA), jnp.asarray(LB)))
    scale = np.linalg.norm(Lw, axis=-1)
    orth = np.asarray(plucker_to_orth(jnp.asarray(Lw / scale[:, None])))

    pert_xi = rng.normal(size=(K, 6)) * pert
    pert_xi[0] = 0
    T_init = np.asarray(jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(
        jnp.asarray(pert_xi), jnp.asarray(T_c_w)))
    pts_init = Pw + rng.normal(size=Pw.shape) * pert
    orth_init = orth + rng.normal(size=orth.shape) * pert * 0.5

    def mk(lm_idx_arr):
        return jnp.asarray(lm_idx_arr)

    prob_global = ba.BAProblem(
        T_c_w=jnp.asarray(T_init), pose_fixed=jnp.arange(K) == 0,
        pose_valid=jnp.ones(K, bool),
        points=jnp.asarray(pts_init), point_valid=jnp.ones(P, bool),
        lines_orth=jnp.asarray(orth_init), lines_scale=jnp.asarray(scale),
        line_valid=jnp.ones(L, bool),
        p_cam=mk(p_cam), p_lm=mk(p_lm_global), p_uv=jnp.asarray(p_uv),
        p_sigma2=jnp.ones(K * P), p_valid=jnp.ones(K * P, bool),
        l_cam=mk(l_cam), l_lm=mk(l_lm_global), l_sobs=jnp.asarray(l_sobs),
        l_eobs=jnp.asarray(l_eobs), l_sigma2=jnp.ones(K * L),
        l_valid=jnp.ones(K * L, bool),
    )
    prob_local = prob_global._replace(p_lm=mk(p_lm_local), l_lm=mk(l_lm_local))
    truth = (T_c_w, Pw, Lw)
    return prob_global, prob_local, truth


def test_dist_ba_matches_single_device():
    assert len(jax.local_devices(backend="cpu")) >= N_DEV
    mesh = make_mesh(N_DEV)
    cfg = ba.BAConfig()
    prob_g, prob_l, (T_true, Pw_true, _) = make_sharded_problem()

    # single-device reference: same LM schedule
    single, cost_s = jax.jit(
        lambda p: ba.lm_rounds(p, CAM, cfg, p.p_valid, p.l_valid, 10))(prob_g)

    run = dist_ba.make_dist_bundle_adjust(mesh, CAM, cfg, iters=10)
    sharded = dist_ba.shard_problem(mesh, prob_l)
    dist, cost_d = run(sharded)

    np.testing.assert_allclose(float(cost_d), float(cost_s), rtol=1e-3, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dist.T_c_w), np.asarray(single.T_c_w), atol=1e-5)
    # and both recover the ground truth poses
    dT = np.asarray(jax.vmap(lambda a, b: lie.log_se3(a @ lie.inv_se3(b)))(
        dist.T_c_w, jnp.asarray(T_true)))
    assert np.abs(dT).max() < 5e-3, dT


def test_dist_ba_cost_decreases():
    mesh = make_mesh(N_DEV)
    cfg = ba.BAConfig()
    prob_g, prob_l, _ = make_sharded_problem(pert=0.05, seed=7)
    c0 = float(jax.jit(ba.total_cost, static_argnums=2)(
        prob_g, CAM, cfg, prob_g.p_valid, prob_g.l_valid))
    run = dist_ba.make_dist_bundle_adjust(mesh, CAM, cfg, iters=8)
    _, cost_d = run(dist_ba.shard_problem(mesh, prob_l))
    assert float(cost_d) < 0.1 * c0, (c0, float(cost_d))
