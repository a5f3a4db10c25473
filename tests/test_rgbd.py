"""RGB-D extraction variant: depth-synthesized disparity must reproduce the
stereo geometry, and a two-frame RGB-D track must recover the motion."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend import f2f
from plslam_tpu.frontend.frame import FrontendConfig
from plslam_tpu.frontend.rgbd import extract_rgbd_features
from plslam_tpu.frontend.tracker import TrackerConfig, optimize_pose
from plslam_tpu.io.synthetic import SyntheticScene


def render_depth(scene, T_w_c):
    """Depth map matching the rendered intensity image (z of the nearest
    splat; background = far)."""
    T_c_w = np.linalg.inv(T_w_c)
    depth = np.full((scene.height, scene.width), 50.0, np.float32)
    for X in np.concatenate([scene.P, scene.LA, scene.LB]):
        Xc = T_c_w[:3, :3] @ X + T_c_w[:3, 3]
        if Xc[2] <= 0.3:
            continue
        u = scene.cx + scene.fx * Xc[0] / Xc[2]
        v = scene.cy + scene.fy * Xc[1] / Xc[2]
        x0, y0 = int(round(u)), int(round(v))
        if 3 <= x0 < scene.width - 3 and 3 <= y0 < scene.height - 3:
            depth[y0 - 3:y0 + 4, x0 - 3:x0 + 4] = np.minimum(
                depth[y0 - 3:y0 + 4, x0 - 3:x0 + 4], Xc[2])
    # lines: sample along
    for A, B in zip(scene.LA, scene.LB):
        for t in np.linspace(0, 1, 200):
            X = A + t * (B - A)
            Xc = T_c_w[:3, :3] @ X + T_c_w[:3, 3]
            if Xc[2] <= 0.3:
                continue
            u = scene.cx + scene.fx * Xc[0] / Xc[2]
            v = scene.cy + scene.fy * Xc[1] / Xc[2]
            x0, y0 = int(round(u)), int(round(v))
            if 2 <= x0 < scene.width - 2 and 2 <= y0 < scene.height - 2:
                depth[y0 - 2:y0 + 3, x0 - 2:x0 + 3] = np.minimum(
                    depth[y0 - 2:y0 + 3, x0 - 2:x0 + 3], Xc[2])
    return depth


def test_rgbd_two_frame_tracking():
    scene = SyntheticScene(seed=13)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy, scene.b,
                              width=scene.width, height=scene.height)
    cfg = FrontendConfig(n_points=512, n_lines=64, fast_th=15.0)
    T0 = np.eye(4)
    xi = np.asarray([0.02, -0.01, 0.1, 0.005, -0.008, 0.01])
    T1 = np.asarray(lie.exp_se3(jnp.asarray(xi)))

    il0, _ = scene.render_stereo(T0)
    il1, _ = scene.render_stereo(T1)
    d0 = render_depth(scene, T0)
    d1 = render_depth(scene, T1)

    ex = jax.jit(lambda im, dp: extract_rgbd_features(
        im, dp, cam, cfg, max_depth=30.0))
    f0 = ex(jnp.asarray(il0), jnp.asarray(d0))
    f1 = ex(jnp.asarray(il1), jnp.asarray(d1))
    assert int(f0.points.valid.sum()) > 80, int(f0.points.valid.sum())

    pts, ls, _, _ = jax.jit(f2f.track_frame_to_frame)(f0, f1)
    est, _, _ = jax.jit(optimize_pose, static_argnums=3)(
        pts, ls, cam, TrackerConfig(use_lines=False))
    assert bool(est.good)
    # recovered motion: proj(DT P0) = obs1 means DT = T1^-1 (curr_from_prev)
    DT_expected = np.linalg.inv(T1)
    err = np.abs(np.asarray(est.DT) - DT_expected)
    assert err[:3, 3].max() < 0.02, err
