"""End-to-end SLAM in the endpoint-line baseline mode
(use_line_plucker=False — the reference's default branch with
levMarquardtOptimizationLBA endpoint parameterization)."""

import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.backend.mapping import MapConfig
from plslam_tpu.config import PLSLAMConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.io.trajectory import ate_rmse
from plslam_tpu.pipeline import PLSLAM

N_FRAMES = 10


@pytest.fixture(scope="module")
def slam_run():
    scene = SyntheticScene(seed=5)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy, scene.b,
                              width=scene.width, height=scene.height,
                              dtype=jnp.float32)
    cfg = PLSLAMConfig(orb_nfeatures=512, lsd_nfeatures=128, orb_fast_th=15,
                       min_entropy_ratio=0.99, use_line_plucker=False,
                       multithread_slam=False)
    slam = PLSLAM(cam, cfg, MapConfig(local_ba_kf=8, ba_points=2048,
                                      ba_lines=256, ba_pobs=8192,
                                      ba_lobs=2048, plucker_lines=False))
    poses_gt = circular_trajectory(N_FRAMES, step_t=0.12, step_r=0.015)
    for i, T in enumerate(poses_gt):
        il, ir = scene.render_stereo(T)
        slam.process(jnp.asarray(il), jnp.asarray(ir), timestamp=0.05 * i)
    traj = slam.finish(run_gba=True)
    return slam, poses_gt, traj


def test_endpoint_mode_builds_map(slam_run):
    slam, _, traj = slam_run
    mp = slam.mapper.map
    assert len(mp.keyframes) >= 3
    assert mp.pt_valid.sum() > 50
    assert mp.ls_valid.sum() >= 3
    # endpoints were populated at creation and refined by BA
    ep = mp.ls_epw[mp.ls_valid]
    assert np.isfinite(ep).all()
    # a rare degenerately-triangulated line may collapse along its flat
    # direction before culling removes it; the bulk must be well-formed
    sep = np.linalg.norm(ep[:, 0] - ep[:, 1], axis=-1)
    assert (sep > 1e-3).mean() > 0.8, sep


def test_endpoint_mode_trajectory(slam_run):
    _, poses_gt, traj = slam_run
    kf_pos = np.stack([T[:3, 3] for T in traj])
    gt_pos = np.stack([T[:3, 3] for T in poses_gt])[: len(kf_pos)]
    assert ate_rmse(kf_pos, gt_pos, align=True) < 0.25


def test_refinement_and_fallback_modes():
    """has_refinement (:937-977) + global-match fallback (:277-281) keep
    the pipeline accurate."""
    scene = SyntheticScene(seed=6)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy, scene.b,
                              width=scene.width, height=scene.height,
                              dtype=jnp.float32)
    cfg = PLSLAMConfig(orb_nfeatures=512, lsd_nfeatures=128, orb_fast_th=15,
                       min_entropy_ratio=0.99, has_refinement=True,
                       multithread_slam=False)
    slam = PLSLAM(cam, cfg, MapConfig(local_ba_kf=8, ba_points=2048,
                                      ba_lines=256, ba_pobs=8192,
                                      ba_lobs=2048, has_refinement=True,
                                      min_pt_matches=1000))  # force fallback
    poses_gt = circular_trajectory(6, step_t=0.12, step_r=0.015)
    for i, T in enumerate(poses_gt):
        il, ir = scene.render_stereo(T)
        slam.process(jnp.asarray(il), jnp.asarray(ir), timestamp=0.05 * i)
    traj = slam.finish(run_gba=False)
    kf_pos = np.stack([T[:3, 3] for T in traj])
    gt_pos = np.stack([T[:3, 3] for T in poses_gt])[: len(kf_pos)]
    assert ate_rmse(kf_pos, gt_pos, align=True) < 0.25
