"""Robust-stat and camera-model tests against numpy oracles."""

import jax.numpy as jnp
import numpy as np

from plslam_tpu.core import robust
from plslam_tpu.core.camera import StereoCamera

RNG = np.random.default_rng(2)


def ref_mad_stdv(res):
    """Direct transliteration of the spec: sorted upper median, then MAD
    (auxiliar.cpp vector_stdv_mad :438)."""
    res = np.sort(np.asarray(res))
    n = len(res)
    med = res[n // 2]
    dev = np.sort(np.abs(res - med))
    return 1.4826 * dev[n // 2]


def test_masked_mad_matches_dense():
    x = RNG.normal(size=37) ** 2
    mask = np.ones(37, dtype=bool)
    got = float(robust.mad_stdv(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref_mad_stdv(x), rtol=1e-12)


def test_masked_mad_ignores_padding():
    x = RNG.normal(size=20) ** 2
    pad = np.full(44, 1e9)
    xp = np.concatenate([x, pad])
    mask = np.concatenate([np.ones(20, bool), np.zeros(44, bool)])
    got = float(robust.mad_stdv(jnp.asarray(xp), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref_mad_stdv(x), rtol=1e-12)


def test_mean_stdv_mad_trimmed():
    x = np.abs(RNG.normal(size=50))
    x[:5] = 100.0  # outliers
    mask = np.ones(50, bool)
    mean, stdv = robust.mean_stdv_mad(jnp.asarray(x), jnp.asarray(mask))
    # trimmed mean should exclude the 100s
    assert float(mean) < 2.0
    assert float(stdv) < 2.0


def test_cauchy():
    assert float(robust.cauchy_weight(jnp.asarray(0.0))) == 1.0
    np.testing.assert_allclose(float(robust.cauchy_weight(jnp.asarray(1.0))), 0.5)


def test_project_backproject_roundtrip():
    cam = StereoCamera.create(458.0, 457.0, 367.2, 248.4, 0.11, dtype=jnp.float64)
    uv = jnp.asarray(RNG.uniform(10, 400, size=(15, 2)))
    disp = jnp.asarray(RNG.uniform(2.0, 40.0, size=(15,)))
    P = cam.back_project(uv, disp)
    uv2 = cam.project(P)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-6)
    # disparity consistency: projecting into the right camera shifts u by disp
    P_r = P - jnp.asarray([float(cam.b), 0.0, 0.0])
    uv_r = cam.project(P_r)
    np.testing.assert_allclose(
        np.asarray(uv[..., 0] - uv_r[..., 0]), np.asarray(disp), atol=1e-6
    )


def test_plucker_K_projects_line():
    """K_L @ n_c must vanish on the projections of points on the line."""
    from plslam_tpu.core import plucker

    cam = StereoCamera.create(458.0, 457.0, 367.2, 248.4, 0.11, dtype=jnp.float64)
    A = jnp.asarray([0.5, 0.2, 3.0])
    B = jnp.asarray([-0.4, 0.6, 5.0])
    L = plucker.plucker_from_two_points(A, B)
    l_img = cam.project_line(L)
    for t in (0.0, 0.3, 1.0):
        p = A + t * (B - A)
        uv = cam.project(p)
        val = l_img[0] * uv[0] + l_img[1] * uv[1] + l_img[2]
        dist = float(jnp.abs(val) / jnp.linalg.norm(l_img[:2]))
        assert dist < 1e-6
