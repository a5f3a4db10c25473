"""Math-core unit tests: SE(3) round trips, adjoint identities, and
autodiff-vs-analytic checks (SURVEY.md §4 test pyramid, layer 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.core import lie

RNG = np.random.default_rng(0)


def rand_twist(scale=1.0):
    return jnp.asarray(RNG.normal(size=6) * scale)


@pytest.mark.parametrize("scale", [1e-9, 1e-5, 0.1, 1.0, 2.5])
def test_exp_log_roundtrip(scale):
    x = rand_twist(scale)
    T = lie.exp_se3(x)
    x2 = lie.log_se3(T)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6 * max(1, scale))


def test_exp_is_rigid():
    T = lie.exp_se3(rand_twist())
    R = T[:3, :3]
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(float(jnp.linalg.det(R)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[3]), [0, 0, 0, 1], atol=0)


def test_inverse():
    T = lie.exp_se3(rand_twist())
    np.testing.assert_allclose(
        np.asarray(T @ lie.inv_se3(T)), np.eye(4), atol=1e-6
    )


def test_log_near_pi():
    w = jnp.asarray([np.pi - 1e-7, 0.0, 0.0, 0.0, 0.0, 0.0])
    x = jnp.concatenate([jnp.zeros(3), w[:3]])
    T = lie.exp_se3(jnp.concatenate([jnp.asarray([0.3, -0.2, 0.1]), w[:3]]))
    x2 = lie.log_se3(T)
    T2 = lie.exp_se3(x2)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)


def test_adjoint_identity():
    """Adj(T) x == log(T exp(x) T^-1) to first order; test exactly via
    T exp(x) T^-1 == exp(Adj(T) x)."""
    T = lie.exp_se3(rand_twist())
    x = rand_twist(0.3)
    lhs = T @ lie.exp_se3(x) @ lie.inv_se3(T)
    rhs = lie.exp_se3(lie.adjoint_se3(T) @ x)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_cov_compose_shapes():
    T = lie.exp_se3(rand_twist())
    cov = jnp.eye(6) * 0.01
    out = lie.cov_compose(T, cov, cov)
    assert out.shape == (6, 6)
    # symmetric PSD
    np.testing.assert_allclose(np.asarray(out), np.asarray(out.T), atol=1e-14)
    assert np.all(np.linalg.eigvalsh(np.asarray(out)) > 0)


def test_vmap_batching():
    xs = jnp.asarray(RNG.normal(size=(7, 6)))
    Ts = jax.vmap(lie.exp_se3)(xs)
    assert Ts.shape == (7, 4, 4)
    xs2 = jax.vmap(lie.log_se3)(Ts)
    np.testing.assert_allclose(np.asarray(xs2), np.asarray(xs), atol=1e-6)


def test_grad_safe_at_zero():
    g = jax.grad(lambda x: jnp.sum(lie.exp_se3(x)))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))


def test_skew_unskew():
    v = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(lie.unskew(lie.skew(v))), np.asarray(v))
    a, b = jnp.asarray(RNG.normal(size=3)), jnp.asarray(RNG.normal(size=3))
    np.testing.assert_allclose(
        np.asarray(lie.skew(a) @ b), np.asarray(jnp.cross(a, b)), atol=1e-14
    )
