"""End-to-end visual odometry on a rendered synthetic stereo sequence —
the 'minimum end-to-end slice' of SURVEY.md §7: images in, trajectory out,
no intermediate ground truth used."""

import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.frame import FrontendConfig
from plslam_tpu.frontend.tracker import TrackerConfig
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.io.trajectory import ate_rmse
from plslam_tpu.vo import VisualOdometry

N_FRAMES = 6


@pytest.fixture(scope="module")
def vo_run():
    scene = SyntheticScene(seed=3)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy, scene.b,
                              width=scene.width, height=scene.height,
                              dtype=jnp.float32)
    fcfg = FrontendConfig(n_points=512, n_lines=128, fast_th=15.0)
    vo = VisualOdometry(cam, fcfg, TrackerConfig())
    poses_gt = circular_trajectory(N_FRAMES)
    il, ir = scene.render_stereo(poses_gt[0])
    vo.initialize(jnp.asarray(il), jnp.asarray(ir))
    est = [np.eye(4)]
    results = []
    for i in range(1, N_FRAMES):
        il, ir = scene.render_stereo(poses_gt[i])
        res = vo.process(jnp.asarray(il), jnp.asarray(ir))
        results.append(res)
        est.append(np.asarray(res.T_f_w))
    return poses_gt, est, results


def test_vo_tracks_every_frame(vo_run):
    _, _, results = vo_run
    for i, r in enumerate(results):
        assert bool(r.good), f"frame {i+1} lost tracking"
        assert int(r.n_inliers) >= 30, (i, int(r.n_inliers))


def test_vo_trajectory_accuracy(vo_run):
    poses_gt, est, _ = vo_run
    gt_pos = np.stack([p[:3, 3] for p in poses_gt])
    est_pos = np.stack([p[:3, 3] for p in est])
    err = ate_rmse(est_pos, gt_pos, align=False)
    # total travel ~0.36 m over 6 frames; demand cm-level odometry
    assert err < 0.03, err


def test_vo_rotation_accuracy(vo_run):
    poses_gt, est, _ = vo_run
    for Tg, Te in zip(poses_gt, est):
        dR = Tg[:3, :3].T @ np.asarray(Te)[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang


def test_prewarm_compiles_the_whole_pipeline():
    """VisualOdometry.prewarm AOT-compiles the per-frame programs from
    shapes alone (the driver's cold-cache benchmark robustness,
    bench.py): after prewarm, the first real frames must not trigger any
    further compilation — asserted by wall time, since a fresh compile
    of these programs costs seconds even on CPU."""
    import time

    from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory

    scene = SyntheticScene(n_points=80, n_lines=12, seed=0,
                           width=188, height=120,
                           fx=100.0, fy=100.0, cx=94.0, cy=60.0)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy,
                              scene.b, width=scene.width,
                              height=scene.height)
    vo = VisualOdometry(cam, FrontendConfig(n_points=128, n_lines=32),
                        TrackerConfig())
    vo.prewarm((120, 188), jnp.float32)
    poses = circular_trajectory(3, step_t=0.05)
    frames = [tuple(jnp.asarray(x)
                    for x in scene.render_stereo(T, noise=1.0))
              for T in poses]
    t0 = time.time()
    vo.initialize(*frames[0])
    res = vo.process(*frames[1])
    _ = float(res.err)
    wall = time.time() - t0
    # a fresh compile of the detection or track program costs >10 s on
    # this CPU; prewarmed, only sub-second tiny-op compiles remain
    assert wall < 3.0, f"post-prewarm first frames took {wall:.1f}s " \
        "(a compile leaked past prewarm)"
