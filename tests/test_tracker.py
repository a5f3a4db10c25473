"""Pose-tracker tests: Jacobian autodiff oracles and synthetic-scene
convergence with outliers (SURVEY.md §4: golden-value tests on tiny
synthetic scenes; analytic Jacobians checked against jax.grad)."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.core.plucker import (
    plane_from_points,
    plucker_from_planes,
    transform_plucker,
)
from plslam_tpu.frontend.features import TrackedLines, TrackedPoints
from plslam_tpu.frontend import tracker

RNG = np.random.default_rng(7)
CAM = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074, dtype=jnp.float64)
CFG = tracker.TrackerConfig()


@jax.jit
def _build_scene(xi_true, P, A, B, noise_p, noise_s, noise_e):
    """Jitted scene derivation (eager execution is low-precision in this
    environment — see conftest note)."""
    T = lie.exp_se3(xi_true)  # curr_from_prev
    dtype = P.dtype
    obs = CAM.project(lie.transform_point(T, P)) + noise_p
    pts = TrackedPoints(
        P=P, obs=obs, sigma2=jnp.ones(P.shape[0], dtype),
        valid=jnp.ones(P.shape[0], bool), inlier=jnp.ones(P.shape[0], bool))

    n_ls = A.shape[0]
    # Pluecker from the stereo construction (two back-projected planes)
    o2 = jnp.asarray([1.0, 0.0, 0.0], dtype) * CAM.b
    pi1 = plane_from_points(A, B, jnp.zeros(3, dtype))
    pi2 = plane_from_points(A, B, o2)
    NDc = plucker_from_planes(pi1, pi2)

    sobs = CAM.project(lie.transform_point(T, A)) + noise_s
    eobs = CAM.project(lie.transform_point(T, B)) + noise_e
    sp = CAM.project(A)
    ep = CAM.project(B)
    # observed image line equation (normalized like stereoFrame.cpp:356)
    sph = jnp.concatenate([sobs, jnp.ones((n_ls, 1), dtype)], axis=-1)
    eph = jnp.concatenate([eobs, jnp.ones((n_ls, 1), dtype)], axis=-1)
    le = jnp.cross(sph, eph)
    le = le / jnp.linalg.norm(le[:, :2], axis=-1, keepdims=True)

    ls = TrackedLines(
        sP=A, eP=B, sp=sp, ep=ep, NDc=NDc, sobs=sobs, eobs=eobs,
        le_obs=le, sigma2=jnp.ones(n_ls, dtype),
        valid=jnp.ones(n_ls, bool), inlier=jnp.ones(n_ls, bool))
    return T, pts, ls


def make_scene(n_pts=40, n_ls=20, noise=0.0, dtype=jnp.float64, seed=7):
    """Random 3D points/lines in front of the prev camera + a ground-truth
    motion; observations are projections in the curr camera."""
    RNG = np.random.default_rng(seed)
    xi_true = jnp.asarray([0.04, -0.02, 0.06, 0.01, -0.02, 0.015], dtype)
    P = jnp.asarray(
        np.stack(
            [RNG.uniform(-2, 2, n_pts), RNG.uniform(-1.5, 1.5, n_pts),
             RNG.uniform(2.5, 8.0, n_pts)], axis=-1
        ), dtype)
    A = jnp.asarray(
        np.stack([RNG.uniform(-2, 2, n_ls), RNG.uniform(-1.5, 1.5, n_ls),
                  RNG.uniform(2.5, 8.0, n_ls)], axis=-1), dtype)
    B = A + jnp.asarray(
        np.stack([RNG.uniform(-1, 1, n_ls), RNG.uniform(-1, 1, n_ls),
                  RNG.uniform(-0.5, 0.5, n_ls)], axis=-1), dtype)
    noise_p = jnp.asarray(RNG.normal(size=(n_pts, 2)) * noise, dtype)
    noise_s = jnp.asarray(RNG.normal(size=(n_ls, 2)) * noise, dtype)
    noise_e = jnp.asarray(RNG.normal(size=(n_ls, 2)) * noise, dtype)
    T, pts, ls = _build_scene(xi_true, P, A, B, noise_p, noise_s, noise_e)
    return xi_true, T, pts, ls


def test_point_jacobian_vs_autodiff():
    _, T, pts, _ = make_scene()
    DT = lie.exp_se3(jnp.asarray([0.01, 0.0, -0.02, 0.005, 0.01, 0.0]))

    def r_of_delta(delta):
        return tracker.point_residuals(lie.exp_se3(delta) @ DT, pts, CAM)[0]

    J_auto = jax.jit(jax.jacfwd(r_of_delta))(jnp.zeros(6, jnp.float64))
    _, J = jax.jit(tracker.point_residuals)(DT, pts, CAM)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-5)


def test_plucker_line_jacobian_vs_autodiff():
    _, T, _, ls = make_scene()
    DT = lie.exp_se3(jnp.asarray([0.01, 0.0, -0.02, 0.005, 0.01, 0.0]))

    def r_of_delta(delta):
        return tracker.line_residuals_plucker(lie.exp_se3(delta) @ DT, ls, CAM)[0]

    J_auto = jax.jit(jax.jacfwd(r_of_delta))(jnp.zeros(6, jnp.float64))
    _, J, _, _ = jax.jit(tracker.line_residuals_plucker)(DT, ls, CAM)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-5)


def test_endpoint_line_jacobian_vs_autodiff():
    _, T, _, ls = make_scene()
    DT = lie.exp_se3(jnp.asarray([0.01, 0.0, -0.02, 0.005, 0.01, 0.0]))

    def r_of_delta(delta):
        return tracker.line_residuals_endpoint(lie.exp_se3(delta) @ DT, ls, CAM)[0]

    J_auto = jax.jit(jax.jacfwd(r_of_delta))(jnp.zeros(6, jnp.float64))
    _, J, _, _ = jax.jit(tracker.line_residuals_endpoint)(DT, ls, CAM)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-5)


def test_residuals_zero_at_true_pose():
    _, T, pts, ls = make_scene()
    r_p, _ = jax.jit(tracker.point_residuals)(T, pts, CAM)
    assert float(jnp.max(r_p)) < 1e-4
    r_l, _, _, _ = jax.jit(tracker.line_residuals_plucker)(T, ls, CAM)
    assert float(jnp.max(r_l)) < 1e-4
    r_e, _, _, _ = jax.jit(tracker.line_residuals_endpoint)(T, ls, CAM)
    assert float(jnp.max(r_e)) < 1e-4


def run_optimize(pts, ls, cfg):
    f = jax.jit(tracker.optimize_pose, static_argnums=3)
    return f(pts, ls, CAM, cfg)


def test_convergence_clean_plucker():
    xi_true, T, pts, ls = make_scene(noise=0.0)
    est, _, _ = run_optimize(pts, ls, CFG)
    assert bool(est.good)
    err_T = np.asarray(est.DT) - np.asarray(T)
    assert np.abs(err_T).max() < 1e-4, err_T


def test_convergence_endpoint_mode():
    xi_true, T, pts, ls = make_scene(noise=0.0)
    cfg = CFG._replace(plucker_lines=False)
    est, _, _ = run_optimize(pts, ls, cfg)
    assert bool(est.good)
    assert np.abs(np.asarray(est.DT) - np.asarray(T)).max() < 1e-4


def test_convergence_with_noise_and_outliers():
    xi_true, T, pts, ls = make_scene(n_pts=80, n_ls=30, noise=0.3)
    # corrupt 15% of point observations
    obs = np.asarray(pts.obs).copy()
    n_bad = 12
    bad = RNG.choice(len(obs), size=n_bad, replace=False)
    obs[bad] += RNG.uniform(30, 80, size=(n_bad, 2)) * np.sign(RNG.normal(size=(n_bad, 2)))
    pts = pts._replace(obs=jnp.asarray(obs))
    est, pts2, ls2 = run_optimize(pts, ls, CFG)
    assert bool(est.good)
    # rotation+translation recovered to a few mrad / mm despite outliers
    dxi = np.asarray(jax.jit(lambda a, b: lie.log_se3(lie.inv_se3(a) @ b))(est.DT, T))
    assert np.abs(dxi).max() < 5e-3, dxi
    # most injected outliers rejected
    inl = np.asarray(pts2.inlier)
    assert inl[bad].sum() <= 3


def test_points_only_mode():
    xi_true, T, pts, ls = make_scene()
    cfg = CFG._replace(use_lines=False)
    est, _, _ = run_optimize(pts, ls, cfg)
    assert bool(est.good)
    assert np.abs(np.asarray(est.DT) - np.asarray(T)).max() < 1e-4


def test_too_few_features_falls_back_to_identity():
    _, T, pts, ls = make_scene(n_pts=4, n_ls=2)
    cfg = CFG._replace(use_lines=False)
    pts = pts._replace(valid=pts.valid & (jnp.arange(4) < 3))
    est, _, _ = run_optimize(pts, ls._replace(valid=jnp.zeros(2, bool)), cfg)
    assert not bool(est.good)
    np.testing.assert_array_equal(np.asarray(est.DT), np.eye(4))


def test_clipped_mad_scale_pair_matches_separate():
    from plslam_tpu.core import robust

    rng = np.random.default_rng(5)
    r_p = jnp.asarray(rng.normal(size=1200) ** 2)
    m_p = jnp.asarray(rng.uniform(size=1200) > 0.3)
    r_l = jnp.asarray(rng.normal(size=256) ** 2)
    m_l = jnp.asarray(rng.uniform(size=256) > 0.5)
    s_p, s_l = jax.jit(robust.clipped_mad_scale_pair)(r_p, m_p, r_l, m_l)
    np.testing.assert_array_equal(
        np.asarray(s_p), np.asarray(jax.jit(robust.clipped_mad_scale)(r_p, m_p)))
    np.testing.assert_array_equal(
        np.asarray(s_l), np.asarray(jax.jit(robust.clipped_mad_scale)(r_l, m_l)))
    # all-invalid row -> clipped floor, no NaN
    s0, _ = jax.jit(robust.clipped_mad_scale_pair)(
        r_p, jnp.zeros(1200, bool), r_l, m_l)
    assert np.isfinite(float(s0))
