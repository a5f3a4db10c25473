"""Pluecker / orthonormal line representation tests, including the
autodiff oracle for the 6x4 Jacobian (the analytic Jacobians of
g2o_types.h become oracle checks against jax.jacobian, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.core import lie, plucker

RNG = np.random.default_rng(1)


def rand_line():
    A = jnp.asarray(RNG.normal(size=3) * 2.0)
    B = jnp.asarray(RNG.normal(size=3) * 2.0)
    return plucker.plucker_from_two_points(A, B), A, B


def point_on_line(L, p):
    """Distance of point p to Pluecker line L."""
    n, d = np.asarray(L[:3]), np.asarray(L[3:])
    p = np.asarray(p)
    return np.linalg.norm(np.cross(p, d) - n) / np.linalg.norm(d)


def test_plucker_klein_constraint():
    L, A, B = rand_line()
    # n . d == 0 always
    assert abs(float(jnp.dot(L[:3], L[3:]))) < 1e-6
    assert point_on_line(L, A) < 1e-6
    assert point_on_line(L, B) < 1e-6


def test_transform_plucker_consistent_with_points():
    L, A, B = rand_line()
    T = lie.exp_se3(jnp.asarray(RNG.normal(size=6)))
    L2 = plucker.transform_plucker(T, L)
    A2 = lie.transform_point(T, A)
    B2 = lie.transform_point(T, B)
    L2_pts = plucker.plucker_from_two_points(A2, B2)
    # same line up to scale
    s = float(jnp.linalg.norm(L2[3:]) / jnp.linalg.norm(L2_pts[3:]))
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L2_pts) * s, atol=1e-6)


def test_motion_matrix_matches_transform():
    L, _, _ = rand_line()
    T = lie.exp_se3(jnp.asarray(RNG.normal(size=6)))
    H = plucker.plucker_motion_matrix(T)
    np.testing.assert_allclose(
        np.asarray(H @ L), np.asarray(plucker.transform_plucker(T, L)), atol=1e-6
    )


def test_plane_construction():
    """pi_from_ppp plane passes through its three defining points."""
    x1, x2, x3 = (jnp.asarray(RNG.normal(size=3)) for _ in range(3))
    pi = plucker.plane_from_points(x1, x2, x3)
    for x in (x1, x2, x3):
        xh = jnp.concatenate([x, jnp.ones(1)])
        assert abs(float(jnp.dot(pi, xh))) < 1e-6


def test_plucker_from_planes_lies_in_both():
    """The two-plane line construction (stereo Pluecker triangulation,
    stereoFrame.cpp:870-883): resulting line must lie in both planes."""
    A = jnp.asarray(RNG.normal(size=3))
    B = jnp.asarray(RNG.normal(size=3))
    C1 = jnp.asarray(RNG.normal(size=3))
    C2 = jnp.asarray(RNG.normal(size=3))
    pi1 = plucker.plane_from_points(A, B, C1)
    pi2 = plucker.plane_from_points(A, B, C2)
    L = plucker.plucker_from_planes(pi1, pi2)
    # direction parallel to B - A, and A on the line
    d = np.asarray(L[3:])
    ab = np.asarray(B - A)
    cosang = abs(d @ ab) / (np.linalg.norm(d) * np.linalg.norm(ab))
    np.testing.assert_allclose(cosang, 1.0, atol=1e-6)
    assert point_on_line(L, A) < 1e-6


def test_orth_roundtrip():
    L, _, _ = rand_line()
    Ln = L / jnp.linalg.norm(L)  # orth rep always has unit (n,d) pair norm
    o = plucker.plucker_to_orth(Ln)
    L2 = plucker.orth_to_plucker(o)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(Ln), atol=1e-6)


def test_orth_plus_zero_is_identity():
    L, _, _ = rand_line()
    o = plucker.plucker_to_orth(L)
    o2 = plucker.orth_plus(o, jnp.zeros(4))
    np.testing.assert_allclose(
        np.asarray(plucker.orth_to_plucker(o2)),
        np.asarray(plucker.orth_to_plucker(o)),
        atol=1e-6,
    )


def test_jac_plucker_wrt_orth_vs_autodiff():
    """Analytic 6x4 (g2o_types.h:455-470, corrected) vs jax.jacobian of
    delta -> orth_to_plucker(orth_plus(o, delta)) at delta = 0."""
    for _ in range(5):
        L, _, _ = rand_line()
        Ln = L / jnp.linalg.norm(L)
        o = plucker.plucker_to_orth(Ln)

        def f(delta):
            return plucker.orth_to_plucker(plucker.orth_plus(o, delta))

        J_auto = jax.jacobian(f)(jnp.zeros(4))
        J_analytic = plucker.jac_plucker_wrt_orth(Ln)
        np.testing.assert_allclose(
            np.asarray(J_analytic), np.asarray(J_auto), atol=1e-6
        )


def test_normalize_plucker():
    L, _, _ = rand_line()
    Ln = plucker.normalize_plucker(L)
    np.testing.assert_allclose(float(jnp.linalg.norm(Ln[3:])), 1.0, atol=1e-6)
    # same line
    s = float(jnp.linalg.norm(L[3:]))
    np.testing.assert_allclose(np.asarray(Ln * s), np.asarray(L), atol=1e-6)
