"""Hand-controlled synthetic worlds rendered straight into StereoFeatures.

Unlike io.synthetic (which rasterizes images and runs the full front-end),
these fixtures project known 3D landmarks with unique random descriptors, so
mapping-layer tests control exactly which keyframes co-observe what.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineSet, PointSet, StereoFeatures

WIDTH, HEIGHT = 752, 480


def make_camera(dtype=jnp.float32) -> StereoCamera:
    return StereoCamera.create(458.0, 457.0, 376.0, 240.0, 0.11,
                               width=WIDTH, height=HEIGHT, dtype=dtype)


class World:
    """Random 3D points and segments in front of the origin camera."""

    def __init__(self, n_pts: int = 120, n_ls: int = 12, seed: int = 3,
                 depth=(4.0, 9.0), spread=3.0):
        rng = np.random.default_rng(seed)
        self.pts = np.stack([
            rng.uniform(-spread, spread, n_pts),
            rng.uniform(-spread * 0.6, spread * 0.6, n_pts),
            rng.uniform(depth[0], depth[1], n_pts)], axis=-1)
        self.pt_desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
        A = np.stack([
            rng.uniform(-spread, spread, n_ls),
            rng.uniform(-spread * 0.6, spread * 0.6, n_ls),
            rng.uniform(depth[0], depth[1], n_ls)], axis=-1)
        B = A + np.stack([rng.uniform(-1.5, 1.5, n_ls),
                          rng.uniform(-1.5, 1.5, n_ls),
                          rng.uniform(-0.4, 0.4, n_ls)], axis=-1)
        self.ls_A, self.ls_B = A, B
        self.ls_desc = rng.integers(0, 2 ** 32, (n_ls, 8), dtype=np.uint32)


def render_features(world: World, T_w_c: np.ndarray,
                    cam: StereoCamera) -> StereoFeatures:
    """Project the world into the camera at T_w_c (camera->world)."""
    T_c_w = np.linalg.inv(T_w_c)
    R, t = T_c_w[:3, :3], T_c_w[:3, 3]
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)

    def proj(Pw):
        Pc = Pw @ R.T + t
        z = np.maximum(Pc[:, 2], 1e-9)
        uv = np.stack([cx + fx * Pc[:, 0] / z, cy + fy * Pc[:, 1] / z], -1)
        ok = ((Pc[:, 2] > 0.1) & (uv[:, 0] >= 8) & (uv[:, 0] < WIDTH - 8)
              & (uv[:, 1] >= 8) & (uv[:, 1] < HEIGHT - 8))
        return Pc, uv, ok

    Pc, uv, ok = proj(world.pts)
    n = len(world.pts)
    points = PointSet(
        uv=jnp.asarray(uv, jnp.float32),
        disp=jnp.ones(n, jnp.float32),
        P=jnp.asarray(Pc, jnp.float32),
        desc=jnp.asarray(world.pt_desc),
        sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.asarray(ok),
    )

    aC, auv, aok = proj(world.ls_A)
    bC, buv, bok = proj(world.ls_B)
    lok = aok & bok
    le = np.cross(np.concatenate([auv, np.ones((len(auv), 1))], 1),
                  np.concatenate([buv, np.ones((len(buv), 1))], 1))
    nrm = np.hypot(le[:, 0], le[:, 1])
    le = le / np.maximum(nrm, 1e-9)[:, None]
    NDc = np.concatenate([np.cross(aC, bC), bC - aC], axis=-1)
    m = len(world.ls_A)
    lines = LineSet(
        sp=jnp.asarray(auv, jnp.float32), ep=jnp.asarray(buv, jnp.float32),
        sdisp=jnp.ones(m, jnp.float32), edisp=jnp.ones(m, jnp.float32),
        sP=jnp.asarray(aC, jnp.float32), eP=jnp.asarray(bC, jnp.float32),
        le=jnp.asarray(le, jnp.float32),
        angle=jnp.asarray(np.arctan2(buv[:, 1] - auv[:, 1],
                                     buv[:, 0] - auv[:, 0]), jnp.float32),
        NDc=jnp.asarray(NDc, jnp.float32),
        desc=jnp.asarray(world.ls_desc),
        sigma2=jnp.ones(m, jnp.float32),
        valid=jnp.asarray(lok),
    )
    return StereoFeatures(points=points, lines=lines)


def lateral_poses(n: int, step: float = 0.05) -> list[np.ndarray]:
    """n camera->world poses translating along +x, identity rotation."""
    out = []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = step * i
        out.append(T)
    return out
