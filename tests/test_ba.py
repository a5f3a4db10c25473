"""Bundle-adjustment tests: Jacobian autodiff oracles, cost decrease, and
synthetic-scene convergence with a fixed gauge (SURVEY.md §4: property tests
— BA decreases cost; golden tests on tiny synthetic scenes)."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.core.plucker import (
    plucker_from_two_points,
    plucker_to_orth,
    orth_to_plucker,
)
from plslam_tpu.backend import ba

RNG = np.random.default_rng(11)
CAM = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074, dtype=jnp.float64)
CFG = ba.BAConfig()


@jax.jit
def _build(poses_xi, Pw, LA, LB, pert_xi, pert_P, pert_orth, noise_uv, noise_s, noise_e):
    K = poses_xi.shape[0]
    P = Pw.shape[0]
    L = LA.shape[0]
    dtype = Pw.dtype
    T_w_c = jax.vmap(lie.exp_se3)(poses_xi)         # camera->world
    T_c_w = jax.vmap(lie.inv_se3)(T_w_c)

    # observations: every camera sees every landmark
    cam_idx_p = jnp.repeat(jnp.arange(K, dtype=jnp.int32), P)
    lm_idx_p = jnp.tile(jnp.arange(P, dtype=jnp.int32), K)
    Pc = jax.vmap(lie.transform_point)(T_c_w[cam_idx_p], Pw[lm_idx_p])
    uv = CAM.project(Pc) + noise_uv

    cam_idx_l = jnp.repeat(jnp.arange(K, dtype=jnp.int32), L)
    lm_idx_l = jnp.tile(jnp.arange(L, dtype=jnp.int32), K)
    sA = CAM.project(jax.vmap(lie.transform_point)(T_c_w[cam_idx_l], LA[lm_idx_l])) + noise_s
    eB = CAM.project(jax.vmap(lie.transform_point)(T_c_w[cam_idx_l], LB[lm_idx_l])) + noise_e

    Lw = plucker_from_two_points(LA, LB)
    scale = jnp.linalg.norm(Lw, axis=-1)
    orth = plucker_to_orth(Lw / scale[:, None])

    # perturb initial state (keep pose 0 fixed as gauge)
    T_c_w_init = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(pert_xi, T_c_w)
    points_init = Pw + pert_P
    orth_init = jax.vmap(lambda o, d: o + d)(orth, pert_orth)

    prob = ba.BAProblem(
        T_c_w=T_c_w_init,
        pose_fixed=jnp.arange(K) == 0,
        pose_valid=jnp.ones(K, bool),
        points=points_init,
        point_valid=jnp.ones(P, bool),
        lines_orth=orth_init,
        lines_scale=scale,
        line_valid=jnp.ones(L, bool),
        p_cam=cam_idx_p, p_lm=lm_idx_p, p_uv=uv,
        p_sigma2=jnp.ones(K * P, dtype), p_valid=jnp.ones(K * P, bool),
        l_cam=cam_idx_l, l_lm=lm_idx_l, l_sobs=sA, l_eobs=eB,
        l_sigma2=jnp.ones(K * L, dtype), l_valid=jnp.ones(K * L, bool),
    )
    return prob, T_c_w, Pw, Lw


def make_problem(K=5, P=30, L=12, noise=0.0, pert=0.02, seed=11):
    RNG = np.random.default_rng(seed)
    dtype = jnp.float64
    poses_xi = jnp.asarray(
        np.concatenate(
            [RNG.uniform(-0.5, 0.5, (K, 2)), RNG.uniform(-0.1, 0.1, (K, 1)),
             RNG.uniform(-0.05, 0.05, (K, 3))], axis=1), dtype)
    Pw = jnp.asarray(np.stack(
        [RNG.uniform(-3, 3, P), RNG.uniform(-2, 2, P), RNG.uniform(4, 10, P)],
        axis=-1), dtype)
    LA = jnp.asarray(np.stack(
        [RNG.uniform(-3, 3, L), RNG.uniform(-2, 2, L), RNG.uniform(4, 10, L)],
        axis=-1), dtype)
    LB = LA + jnp.asarray(np.stack(
        [RNG.uniform(-1.5, 1.5, L), RNG.uniform(-1.5, 1.5, L),
         RNG.uniform(-0.5, 0.5, L)], axis=-1), dtype)
    pert_xi = jnp.asarray(RNG.normal(size=(K, 6)) * pert, dtype)
    pert_xi = pert_xi.at[0].set(0.0)
    pert_P = jnp.asarray(RNG.normal(size=(P, 3)) * pert, dtype)
    pert_orth = jnp.asarray(RNG.normal(size=(L, 4)) * pert * 0.5, dtype)
    noise_uv = jnp.asarray(RNG.normal(size=(K * P, 2)) * noise, dtype)
    noise_s = jnp.asarray(RNG.normal(size=(K * L, 2)) * noise, dtype)
    noise_e = jnp.asarray(RNG.normal(size=(K * L, 2)) * noise, dtype)
    return _build(poses_xi, Pw, LA, LB, pert_xi, pert_P, pert_orth,
                  noise_uv, noise_s, noise_e)


def test_point_obs_jacobians_vs_autodiff():
    prob, *_ = make_problem(K=2, P=5, L=3)

    e0, Jc, Jp = jax.jit(ba.point_obs_residuals)(prob, CAM)

    def e_of_pose_delta(d):
        T = jax.vmap(lambda dd, T: lie.exp_se3(dd) @ T)(d, prob.T_c_w)
        return ba.point_obs_residuals(prob._replace(T_c_w=T), CAM)[0]

    Jc_auto = jax.jit(jax.jacfwd(e_of_pose_delta))(jnp.zeros((2, 6), jnp.float64))
    # gather per-obs blocks
    Jc_auto = Jc_auto[jnp.arange(prob.p_cam.shape[0]), :, prob.p_cam, :]
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_auto), atol=1e-4)

    def e_of_points(pp):
        return ba.point_obs_residuals(prob._replace(points=pp), CAM)[0]

    Jp_auto = jax.jit(jax.jacfwd(e_of_points))(prob.points)
    Jp_auto = Jp_auto[jnp.arange(prob.p_lm.shape[0]), :, prob.p_lm, :]
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp_auto), atol=1e-4)


def test_line_obs_jacobians_vs_autodiff():
    prob, *_ = make_problem(K=2, P=5, L=4)

    e0, Jc, Jl = jax.jit(ba.line_obs_residuals)(prob, CAM)

    def e_of_pose_delta(d):
        T = jax.vmap(lambda dd, T: lie.exp_se3(dd) @ T)(d, prob.T_c_w)
        return ba.line_obs_residuals(prob._replace(T_c_w=T), CAM)[0]

    Jc_auto = jax.jit(jax.jacfwd(e_of_pose_delta))(jnp.zeros((2, 6), jnp.float64))
    Jc_auto = Jc_auto[jnp.arange(prob.l_cam.shape[0]), :, prob.l_cam, :]
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_auto), atol=1e-4)

    from plslam_tpu.core.plucker import orth_plus

    def e_of_line_delta(d):
        o = jax.vmap(orth_plus)(prob.lines_orth, d)
        return ba.line_obs_residuals(prob._replace(lines_orth=o), CAM)[0]

    Jl_auto = jax.jit(jax.jacfwd(e_of_line_delta))(jnp.zeros((4, 4), jnp.float64))
    Jl_auto = Jl_auto[jnp.arange(prob.l_lm.shape[0]), :, prob.l_lm, :]
    np.testing.assert_allclose(np.asarray(Jl), np.asarray(Jl_auto), atol=1e-4)


def test_ba_converges_clean():
    prob, T_c_w_true, Pw_true, Lw_true = make_problem(noise=0.0, pert=0.03)
    res = jax.jit(ba.bundle_adjust, static_argnums=2)(prob, CAM, CFG)
    # a noise-free problem must reach (numerically) zero residual cost
    assert float(res.cost) < 1e-8, float(res.cost)
    # pose recovery (gauge fixed at pose 0; these are monocular
    # observations, so global scale is a true gauge freedom — the
    # optimizer may settle on a zero-residual configuration a small
    # similarity away from the generating one)
    dT = np.asarray(jax.vmap(lambda a, b: lie.log_se3(a @ lie.inv_se3(b)))(
        res.problem.T_c_w, T_c_w_true))
    assert np.abs(dT).max() < 5e-3, dT
    # point recovery up to that scale-gauge wiggle
    dP = np.asarray(res.problem.points - Pw_true)
    assert np.abs(dP).max() < 2.5e-2, np.abs(dP).max()
    # line recovery: compare normalized Pluecker
    Lw_est = np.asarray(jax.jit(jax.vmap(orth_to_plucker))(res.problem.lines_orth)
                        ) * np.asarray(res.problem.lines_scale)[:, None]
    Lw_ref = np.asarray(Lw_true)
    err = np.abs(Lw_est / np.linalg.norm(Lw_est, axis=1, keepdims=True)
                 - Lw_ref / np.linalg.norm(Lw_ref, axis=1, keepdims=True)).max()
    assert err < 1e-2, err


def test_ba_cost_decreases_with_noise():
    prob, *_ = make_problem(noise=0.5, pert=0.05)
    c0 = float(jax.jit(ba.total_cost, static_argnums=2)(
        prob, CAM, CFG, prob.p_valid, prob.l_valid))
    res = jax.jit(ba.bundle_adjust, static_argnums=2)(prob, CAM, CFG)
    assert float(res.cost) < c0 * 0.5, (c0, float(res.cost))


def test_chi2_gate_deactivates_outliers():
    prob, *_ = make_problem(noise=0.2, pert=0.02)
    uv = np.asarray(prob.p_uv).copy()
    bad = RNG.choice(len(uv), size=8, replace=False)
    uv[bad] += 50.0
    prob = prob._replace(p_uv=jnp.asarray(uv))
    res = jax.jit(ba.bundle_adjust, static_argnums=2)(prob, CAM, CFG)
    active = np.asarray(res.p_active)
    assert active[bad].sum() == 0
    # inliers largely kept
    keep = np.ones(len(uv), bool); keep[bad] = False
    assert active[keep].mean() > 0.9


def test_fixed_pose_untouched():
    prob, T_true, _, _ = make_problem(pert=0.03)
    res = jax.jit(ba.bundle_adjust, static_argnums=2)(prob, CAM, CFG)
    np.testing.assert_allclose(
        np.asarray(res.problem.T_c_w[0]), np.asarray(prob.T_c_w[0]), atol=0)


def test_padded_obs_rows_have_zero_effect():
    """Invariant (r1 review weak #6): padded observation rows — cam=0,
    lm=0, valid=False, arbitrary garbage observations — must not change
    the solution at all.  Correctness must not silently depend on the
    garbage being benign."""
    prob, *_ = make_problem(K=3, P=10, L=4)
    run = jax.jit(lambda p: ba.lm_rounds(p, CAM, CFG, p.p_valid,
                                         p.l_valid, 5))
    clean, _ = run(prob)

    garbage = 1e8
    z32 = lambda n: jnp.zeros(n, jnp.int32)
    dt = prob.p_uv.dtype
    padded = prob._replace(
        p_cam=jnp.concatenate([prob.p_cam, z32(7)]),
        p_lm=jnp.concatenate([prob.p_lm, z32(7)]),
        p_uv=jnp.concatenate([prob.p_uv, jnp.full((7, 2), garbage, dt)]),
        p_sigma2=jnp.concatenate([prob.p_sigma2, jnp.full(7, garbage, dt)]),
        p_valid=jnp.concatenate([prob.p_valid, jnp.zeros(7, bool)]),
        l_cam=jnp.concatenate([prob.l_cam, z32(5)]),
        l_lm=jnp.concatenate([prob.l_lm, z32(5)]),
        l_sobs=jnp.concatenate([prob.l_sobs, jnp.full((5, 2), -garbage, dt)]),
        l_eobs=jnp.concatenate([prob.l_eobs, jnp.full((5, 2), garbage, dt)]),
        l_sigma2=jnp.concatenate([prob.l_sigma2, jnp.full(5, garbage, dt)]),
        l_valid=jnp.concatenate([prob.l_valid, jnp.zeros(5, bool)]),
    )
    run_p = jax.jit(lambda p: ba.lm_rounds(p, CAM, CFG, p.p_valid,
                                           p.l_valid, 5))
    dirty, _ = run_p(padded)
    for name in ("T_c_w", "points", "lines_orth"):
        np.testing.assert_array_equal(np.asarray(getattr(clean, name)),
                                      np.asarray(getattr(dirty, name)),
                                      err_msg=name)
