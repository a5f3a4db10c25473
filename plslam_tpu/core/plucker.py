"""Pluecker line coordinates and the orthonormal 4-DoF representation.

A 3D line is L = [n(3); d(3)]: n = moment (normal of the plane through the
line and the origin), d = direction.  Behavioral spec (re-derived, not
copied) from the reference:

- 6x6 motion matrix & transform     include/mapHandler.h:232-250
- plane-from-3-points / line-from-2-planes construction
                                    src2/stereoFrame.cpp:870-883
- Pluecker <-> orthonormal (U,W)    src/mapFeatures.cpp:186-266
- orthonormal box-plus update       g2o_types/g2o_types.h:72-155
- d(Pluecker)/d(orth) Jacobian      g2o_types/g2o_types.h:455-470
  (NOTE: the reference carries a sign bug in the *other* copy of this
  Jacobian, mapFeatures.cpp:251 — we implement the correct version and
  verify against jax.jacobian in tests.)

All functions are batchable with vmap and dtype-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .numerics import cos as _cos

from .lie import skew

_EPS = 1e-12


def plucker_motion_matrix(T: jax.Array) -> jax.Array:
    """6x6 matrix H(T) with L_c = H(T) @ L_w  (mapHandler.h:242-250).

    H = [[R, skew(t) R], [0, R]].
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    H = jnp.zeros(T.shape[:-2] + (6, 6), dtype=T.dtype)
    H = H.at[..., :3, :3].set(R)
    H = H.at[..., :3, 3:].set(skew(t) @ R)
    H = H.at[..., 3:, 3:].set(R)
    return H


def transform_plucker(T: jax.Array, L: jax.Array) -> jax.Array:
    """Apply a rigid transform to Pluecker line(s) without forming the 6x6.

    n' = R n + t x (R d);  d' = R d.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n = jnp.einsum("...ij,...j->...i", R, L[..., :3])
    d = jnp.einsum("...ij,...j->...i", R, L[..., 3:])
    n = n + jnp.cross(t, d)
    return jnp.concatenate([n, d], axis=-1)


def plane_from_points(x1: jax.Array, x2: jax.Array, x3: jax.Array) -> jax.Array:
    """Plane [a,b,c,d] through three 3D points (stereoFrame.cpp pi_from_ppp :870)."""
    normal = jnp.cross(x1 - x3, x2 - x3)
    d = -jnp.sum(x3 * jnp.cross(x1, x2), axis=-1, keepdims=True)
    return jnp.concatenate([normal, d], axis=-1)


def plucker_from_planes(pi1: jax.Array, pi2: jax.Array) -> jax.Array:
    """Pluecker line as intersection of two planes (stereoFrame.cpp pipi_plk :877).

    From the dual Pluecker matrix dp = pi1 pi2^T - pi2 pi1^T:
    n = dp[0:3, 3], d = [-dp(1,2), dp(0,2), -dp(0,1)].
    """
    dp = pi1[..., :, None] * pi2[..., None, :] - pi2[..., :, None] * pi1[..., None, :]
    n = dp[..., :3, 3]
    d = jnp.stack([-dp[..., 1, 2], dp[..., 0, 2], -dp[..., 0, 1]], axis=-1)
    return jnp.concatenate([n, d], axis=-1)


def normalize_plucker(L: jax.Array) -> jax.Array:
    """Scale so that ||d|| = 1 (the reference's world-frame normalization,
    mapHandler.cpp:451-459: d_hat = d/||d||, n = n_hat * (||n||/||d||))."""
    dn = jnp.linalg.norm(L[..., 3:], axis=-1, keepdims=True)
    return L / jnp.where(dn > _EPS, dn, 1.0)


# ---------------------------------------------------------------------------
# Orthonormal (U, W) 4-DoF representation
# ---------------------------------------------------------------------------


def _euler_R(theta: jax.Array) -> jax.Array:
    """The specific rotation parameterization used by the reference
    (g2o_types.h:84-92): R(theta) with columns built from s1..c3."""
    s1, c1 = jnp.sin(theta[..., 0]), _cos(theta[..., 0])
    s2, c2 = jnp.sin(theta[..., 1]), _cos(theta[..., 1])
    s3, c3 = jnp.sin(theta[..., 2]), _cos(theta[..., 2])
    r = jnp.stack(
        [
            jnp.stack([c2 * c3, s1 * s2 * c3 - c1 * s3, c1 * s2 * c3 + s1 * s3], axis=-1),
            jnp.stack([c2 * s3, s1 * s2 * s3 + c1 * c3, c1 * s2 * s3 - s1 * c3], axis=-1),
            jnp.stack([-s2, s1 * c2, c1 * c2], axis=-1),
        ],
        axis=-2,
    )
    return r


def _R_to_euler(R: jax.Array) -> jax.Array:
    """Inverse of _euler_R (g2o_types.h:125-131)."""
    u1 = R[..., :, 0]
    u2 = R[..., :, 1]
    u3 = R[..., :, 2]
    t0 = jnp.arctan2(u2[..., 2], u3[..., 2])
    t1 = jnp.arcsin(jnp.clip(-u1[..., 2], -1.0, 1.0))
    t2 = jnp.arctan2(u1[..., 1], u1[..., 0])
    return jnp.stack([t0, t1, t2], axis=-1)


def orth_U_from_plucker(L: jax.Array) -> jax.Array:
    """U = [n_hat, d_hat, (n x d)_hat] (mapFeatures.cpp getOrhtRFromPluker :226)."""
    n, d = L[..., :3], L[..., 3:]
    n_h = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
    d_h = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)
    c = jnp.cross(n, d)
    c_h = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), _EPS)
    return jnp.stack([n_h, d_h, c_h], axis=-1)


def orth_W_from_plucker(L: jax.Array) -> jax.Array:
    """W = [[w1,-w2],[w2,w1]] with (w1,w2) = (||n||,||d||)/sqrt(||n||^2+||d||^2)
    (mapFeatures.cpp getOrthWFromPluker :241)."""
    nn = jnp.linalg.norm(L[..., :3], axis=-1)
    dn = jnp.linalg.norm(L[..., 3:], axis=-1)
    den = jnp.sqrt(nn * nn + dn * dn)
    den = jnp.maximum(den, _EPS)
    w1, w2 = nn / den, dn / den
    return jnp.stack(
        [jnp.stack([w1, -w2], axis=-1), jnp.stack([w2, w1], axis=-1)], axis=-2
    )


def plucker_to_orth(L: jax.Array) -> jax.Array:
    """Pluecker 6-vec -> orthonormal 4-vec [theta(3); phi]
    (mapFeatures.cpp changePlukerToOrth :186)."""
    U = orth_U_from_plucker(L)
    theta = _R_to_euler(U)
    W = orth_W_from_plucker(L)
    phi = jnp.arcsin(jnp.clip(W[..., 1, 0], -1.0, 1.0))
    return jnp.concatenate([theta, phi[..., None]], axis=-1)


def orth_to_plucker(o: jax.Array) -> jax.Array:
    """Orthonormal 4-vec -> Pluecker 6-vec (mapFeatures.cpp changeOrthToPluker
    :203).  Result has ||n||^2 + ||d||^2 = 1."""
    R = _euler_R(o[..., :3])
    w1 = _cos(o[..., 3])
    w2 = jnp.sin(o[..., 3])
    n = w1[..., None] * R[..., :, 0]
    d = w2[..., None] * R[..., :, 1]
    return jnp.concatenate([n, d], axis=-1)


def orth_plus(o: jax.Array, delta: jax.Array) -> jax.Array:
    """Box-plus: right-multiply U by Rx Ry Rz of delta[:3], W by R(delta[3])
    (g2o_types.h updateOrthCoord :72-155)."""
    R = _euler_R(o[..., :3])
    d0, d1, d2 = delta[..., 0], delta[..., 1], delta[..., 2]
    one = jnp.ones_like(d0)
    zero = jnp.zeros_like(d0)
    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, _cos(d0), -jnp.sin(d0)], axis=-1),
            jnp.stack([zero, jnp.sin(d0), _cos(d0)], axis=-1),
        ],
        axis=-2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([_cos(d1), zero, jnp.sin(d1)], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([-jnp.sin(d1), zero, _cos(d1)], axis=-1),
        ],
        axis=-2,
    )
    Rz = jnp.stack(
        [
            jnp.stack([_cos(d2), -jnp.sin(d2), zero], axis=-1),
            jnp.stack([jnp.sin(d2), _cos(d2), zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    Rnew = R @ Rx @ Ry @ Rz
    theta_new = _R_to_euler(Rnew)
    phi_new = o[..., 3] + delta[..., 3]
    # wrap via the W-matrix extraction used by the reference: asin(sin(..))
    # of the rotated 2x2, equivalent to angle addition then re-extraction.
    w = jnp.stack([_cos(phi_new), jnp.sin(phi_new)], axis=-1)
    phi_new = jnp.arcsin(jnp.clip(w[..., 1], -1.0, 1.0))
    return jnp.concatenate([theta_new, phi_new[..., None]], axis=-1)


def jac_plucker_wrt_orth(L: jax.Array) -> jax.Array:
    """Analytic 6x4 Jacobian d(Pluecker L(orth boxplus delta))/d(delta) at
    delta = 0, where L = [w1 u1; w2 u2] (g2o_types.h:455-470, corrected
    version; validated against autodiff in tests)."""
    U = orth_U_from_plucker(L)
    W = orth_W_from_plucker(L)
    w1, w2 = W[..., 0, 0], W[..., 1, 0]
    u1 = U[..., :, 0]
    u2 = U[..., :, 1]
    u3 = U[..., :, 2]
    z = jnp.zeros_like(u1)
    top = jnp.stack(
        [z, -w1[..., None] * u3, w1[..., None] * u2, -w2[..., None] * u1], axis=-1
    )
    bot = jnp.stack(
        [w2[..., None] * u3, z, -w2[..., None] * u1, w1[..., None] * u2], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def plucker_closest_point(L: jax.Array) -> jax.Array:
    """Point on the line closest to the origin: p = (d x n)/||d||^2."""
    n, d = L[..., :3], L[..., 3:]
    dd = jnp.sum(d * d, axis=-1, keepdims=True)
    return jnp.cross(d, n) / jnp.maximum(dd, _EPS)


def plucker_from_two_points(A: jax.Array, B: jax.Array) -> jax.Array:
    """Pluecker line through 3D points A, B: d = B - A, n = A x B."""
    return jnp.concatenate([jnp.cross(A, B), B - A], axis=-1)
