"""Multithread SLAM mode: mapping on a worker thread fed by a KF queue
(reference SlamConfig::multithreadSLAM, mapHandler.cpp:1143-1248), and the
offline visualization artifacts (slamScene analog)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.backend.mapping import MapConfig
from plslam_tpu.config import PLSLAMConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.io.trajectory import ate_rmse
from plslam_tpu.pipeline import PLSLAM

N_FRAMES = 8


def _run(multithread: bool):
    scene = SyntheticScene(seed=7)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy, scene.b,
                              width=scene.width, height=scene.height,
                              dtype=jnp.float32)
    cfg = PLSLAMConfig(orb_nfeatures=512, lsd_nfeatures=128, orb_fast_th=15,
                       min_entropy_ratio=0.99,
                       multithread_slam=multithread)
    slam = PLSLAM(cam, cfg, MapConfig(local_ba_kf=8, ba_points=2048,
                                      ba_lines=256, ba_pobs=8192,
                                      ba_lobs=2048))
    poses_gt = circular_trajectory(N_FRAMES, step_t=0.12, step_r=0.015)
    for i, T in enumerate(poses_gt):
        il, ir = scene.render_stereo(T)
        slam.process(jnp.asarray(il), jnp.asarray(ir), timestamp=0.05 * i)
    traj = slam.finish(run_gba=False)
    return slam, poses_gt, traj


@pytest.fixture(scope="module")
def both_runs():
    return _run(False), _run(True)


def test_multithread_matches_singlethread(both_runs):
    (s0, gt, t0), (s1, _, t1) = both_runs
    # same KF set and identical mapping results: the worker consumes the
    # same (pose, features) jobs in order
    assert len(s0.mapper.map.keyframes) == len(s1.mapper.map.keyframes)
    assert len(t0) == len(t1)
    np.testing.assert_allclose(np.stack(t0), np.stack(t1), atol=1e-5)


def test_multithread_trajectory_accurate(both_runs):
    _, (s1, gt, t1) = both_runs
    kf_pos = np.stack([T[:3, 3] for T in t1])
    # align lengths: use the first |t1| gt poses corresponding to KFs
    # (aggressive KF creation: nearly every frame is a KF)
    gt_pos = np.stack([T[:3, 3] for T in gt])[: len(kf_pos)]
    assert ate_rmse(kf_pos, gt_pos, align=True) < 0.25


def test_multithread_errors_surface(both_runs):
    _, (s1, _, _) = both_runs
    assert s1._map_errors == []
    assert s1._map_thread is None  # joined at finish


def test_viz_artifacts(both_runs):
    from plslam_tpu import viz

    _, (s1, gt, _) = both_runs
    with tempfile.TemporaryDirectory() as d:
        files = viz.render_run(s1, d, gt=np.stack(gt))
        for f in files:
            assert os.path.exists(f) and os.path.getsize(f) > 1000, f


def test_plot_frame(both_runs):
    import tempfile

    from plslam_tpu import viz
    from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory

    _, (s1, _, _) = both_runs
    scene = SyntheticScene(seed=7)
    il, _ = scene.render_stereo(circular_trajectory(1)[0])
    feats = s1.vo.current_features
    with tempfile.TemporaryDirectory() as d:
        p = viz.plot_frame(il, feats, os.path.join(d, "frame.png"))
        assert os.path.getsize(p) > 1000


def test_loop_closure_runs_off_the_mapping_worker():
    """The dedicated LC worker (reference loop-closure thread,
    mapHandler.cpp:1302-1386): a slow loop-closure detection must NOT
    back-pressure the bounded KF queue through the mapping worker — the
    tracker keeps inserting keyframes while LC lags behind, and every
    queued LC job still runs by the time the pipeline idles."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from _map_fixtures import World, lateral_poses, make_camera, \
        render_features

    cam = make_camera()
    world = World(n_pts=120, n_ls=12)
    cfg = PLSLAMConfig(use_line_plucker=False, use_loop_closure=True,
                       multithread_slam=True)
    slam = PLSLAM(cam, cfg, MapConfig(use_lines=True, plucker_lines=False,
                                      local_ba_kf=8))
    assert slam._lc_thread is not None, "LC worker must exist"

    import threading

    done = []
    lc_blocked = threading.Event()
    lc_release = threading.Event()

    def blocking_lc(kf_id=None):
        done.append(kf_id)
        if kf_id == 1:  # an "in-progress loop closure" that takes forever
            lc_blocked.set()
            assert lc_release.wait(timeout=120)
        return None

    slam.loop_closer.on_new_keyframe = blocking_lc

    n = 8
    poses = lateral_poses(n, step=0.04)
    feats = [render_features(world, T, cam) for T in poses]
    slam.insert_keyframe_features(poses[0], feats[0], timestamp=0.0)
    slam.insert_keyframe_features(poses[1], feats[1], timestamp=0.1)
    assert lc_blocked.wait(timeout=120)

    # with LC now stuck mid-closure, the remaining keyframes must still
    # flow through the bounded KF queue and the mapping worker — inline
    # LC (the old design) would wedge the queue and block this feed
    def feed_rest():
        for i in range(2, n):
            slam.insert_keyframe_features(poses[i], feats[i],
                                          timestamp=0.1 * i)
        slam._kf_queue.join()

    t = threading.Thread(target=feed_rest, daemon=True)
    t.start()
    t.join(timeout=120)
    stalled = t.is_alive()
    lc_release.set()  # let the LC worker finish either way
    assert not stalled, "KF feed wedged behind the in-progress loop closure"
    assert len(slam.mapper.map.keyframes) == n
    slam.wait_until_idle()
    assert sorted(done) == list(range(n)), done  # every queued LC job ran
    slam.finish(run_gba=False)
