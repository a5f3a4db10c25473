"""Endpoint-line BA mode (levMarquardtOptimizationLBA/GBA :2334/:3128):
line endpoints live in the 3-DoF point table with point-to-observed-line
residuals selected by p_is_line."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.backend import ba
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera

CAM = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074,
                          dtype=jnp.float64)
CFG = ba.BAConfig()


def make_endpoint_problem(K=4, P=20, L=8, pert=0.02, seed=3):
    rng = np.random.default_rng(seed)
    dtype = jnp.float64
    poses_xi = jnp.asarray(np.concatenate(
        [rng.uniform(-0.5, 0.5, (K, 2)), rng.uniform(-0.1, 0.1, (K, 1)),
         rng.uniform(-0.05, 0.05, (K, 3))], 1), dtype)
    T_w_c = jax.vmap(lie.exp_se3)(poses_xi)
    T_c_w = jax.vmap(lie.inv_se3)(T_w_c)
    Pw = jnp.asarray(np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                               rng.uniform(4, 10, P)], -1), dtype)
    LA = jnp.asarray(np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                               rng.uniform(4, 10, L)], -1), dtype)
    LB = LA + jnp.asarray(np.stack(
        [rng.uniform(-1.5, 1.5, L), rng.uniform(-1.5, 1.5, L),
         rng.uniform(-0.5, 0.5, L)], -1), dtype)

    # point-obs rows: real points first, then 2 rows per line obs
    Np_pt = K * P
    Np_ln = K * L * 2
    Np = Np_pt + Np_ln
    cam_pt = jnp.repeat(jnp.arange(K, dtype=jnp.int32), P)
    lm_pt = jnp.tile(jnp.arange(P, dtype=jnp.int32), K)
    uv = CAM.project(jax.vmap(lie.transform_point)(T_c_w[cam_pt], Pw[lm_pt]))

    # endpoints occupy slots P .. P+2L-1: line l -> (P+2l, P+2l+1)
    cam_ln = jnp.repeat(jnp.arange(K, dtype=jnp.int32), 2 * L)
    lm_ln = jnp.tile(P + jnp.arange(2 * L, dtype=jnp.int32), K)
    # observed image line from the true projections
    sA = CAM.project(jax.vmap(lie.transform_point)(
        T_c_w[jnp.repeat(jnp.arange(K, dtype=jnp.int32), L)],
        LA[jnp.tile(jnp.arange(L, dtype=jnp.int32), K)]))
    eB = CAM.project(jax.vmap(lie.transform_point)(
        T_c_w[jnp.repeat(jnp.arange(K, dtype=jnp.int32), L)],
        LB[jnp.tile(jnp.arange(L, dtype=jnp.int32), K)]))
    sh = jnp.concatenate([sA, jnp.ones((K * L, 1), dtype)], -1)
    eh = jnp.concatenate([eB, jnp.ones((K * L, 1), dtype)], -1)
    lo = jnp.cross(sh, eh)
    lo = lo / jnp.linalg.norm(lo[:, :2], axis=-1, keepdims=True)
    lo2 = jnp.repeat(lo, 2, axis=0)                   # one per endpoint row

    p_cam = jnp.concatenate([cam_pt, cam_ln])
    p_lm = jnp.concatenate([lm_pt, lm_ln])
    p_uv = jnp.concatenate([uv, jnp.zeros((Np_ln, 2), dtype)])
    p_lo = jnp.concatenate([jnp.zeros((Np_pt, 3), dtype), lo2])
    p_is_line = jnp.concatenate([jnp.zeros(Np_pt, bool),
                                 jnp.ones(Np_ln, bool)])

    pert_xi = jnp.asarray(rng.normal(size=(K, 6)) * pert, dtype).at[0].set(0.0)
    T_init = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(pert_xi, T_c_w)
    pts_all = jnp.concatenate(
        [Pw, jnp.stack([LA, LB], 1).reshape(2 * L, 3)])
    pts_init = pts_all + jnp.asarray(rng.normal(size=(P + 2 * L, 3)) * pert,
                                     dtype)

    nl = 1  # dummy line table (unused)
    prob = ba.BAProblem(
        T_c_w=T_init, pose_fixed=jnp.arange(K) == 0,
        pose_valid=jnp.ones(K, bool),
        points=pts_init, point_valid=jnp.ones(P + 2 * L, bool),
        lines_orth=jnp.zeros((nl, 4), dtype),
        lines_scale=jnp.ones(nl, dtype),
        line_valid=jnp.zeros(nl, bool),
        p_cam=p_cam, p_lm=p_lm, p_uv=p_uv,
        p_sigma2=jnp.ones(Np, dtype), p_valid=jnp.ones(Np, bool),
        l_cam=jnp.zeros(1, jnp.int32), l_lm=jnp.zeros(1, jnp.int32),
        l_sobs=jnp.zeros((1, 2), dtype), l_eobs=jnp.zeros((1, 2), dtype),
        l_sigma2=jnp.ones(1, dtype), l_valid=jnp.zeros(1, bool),
        p_lo=p_lo, p_is_line=p_is_line,
    )
    return prob, T_c_w, pts_all


def test_endpoint_jacobians_vs_autodiff():
    prob, _, _ = make_endpoint_problem()

    def res_of_pose(xi_all):
        T = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(xi_all, prob.T_c_w)
        e, _, _ = ba.point_obs_residuals(prob._replace(T_c_w=T), CAM)
        return e

    e0, J_pose, J_pt = ba.point_obs_residuals(prob, CAM)
    J_auto = jax.jacobian(res_of_pose)(
        jnp.zeros((prob.T_c_w.shape[0], 6), jnp.float64))
    # gather the block for each obs's own camera
    J_auto_own = J_auto[jnp.arange(e0.shape[0]), :, prob.p_cam, :]
    np.testing.assert_allclose(np.asarray(J_pose), np.asarray(J_auto_own),
                               atol=1e-6)

    def res_of_points(dp):
        e, _, _ = ba.point_obs_residuals(
            prob._replace(points=prob.points + dp), CAM)
        return e

    J_auto_p = jax.jacobian(res_of_points)(jnp.zeros_like(prob.points))
    J_auto_p_own = J_auto_p[jnp.arange(e0.shape[0]), :, prob.p_lm, :]
    np.testing.assert_allclose(np.asarray(J_pt), np.asarray(J_auto_p_own),
                               atol=1e-6)


def test_endpoint_ba_converges():
    prob, T_gt, pts_gt = make_endpoint_problem()
    res = ba.bundle_adjust(prob, CAM, CFG)
    T_fin = np.asarray(res.problem.T_c_w)
    for k in range(1, T_fin.shape[0]):
        dt = np.linalg.norm(T_fin[k][:3, 3] - np.asarray(T_gt[k])[:3, 3])
        assert dt < 5e-3, (k, dt)
    assert float(res.cost) < 1e-5


def test_endpoint_ba_cost_decreases():
    prob, _, _ = make_endpoint_problem(pert=0.05)
    c0 = float(ba.total_cost(prob, CAM, CFG, prob.p_valid, prob.l_valid))
    res = ba.bundle_adjust(prob, CAM, CFG)
    assert float(res.cost) < 0.1 * c0
