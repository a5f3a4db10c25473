"""kf-axis (sequence-block) sharded global BA on a virtual 8-device mesh
(SURVEY.md §2.4/§5, BASELINE config 5: trajectory-block partitioning)."""

import numpy as np

from _map_fixtures import World, lateral_poses, make_camera, render_features
from plslam_tpu.backend.mapping import MapConfig, MapHandler
from plslam_tpu.parallel import dist_gba
from plslam_tpu.parallel.mesh import make_mesh


def _build(n_kf=16, n_pts=300, n_ls=16):
    cam = make_camera()
    world = World(n_pts=n_pts, n_ls=n_ls, seed=9)
    cfg = MapConfig(ba_points=512, ba_lines=64, ba_pobs=4096, ba_lobs=512)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(n_kf, step=0.04)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    return mapper, world, poses


def test_kf_block_gba_reduces_error():
    mapper, world, poses = _build()
    mp = mapper.map
    rng = np.random.default_rng(1)
    eligible = np.where(mp.pt_valid & (mp.pt_nobs >= 2))[0]
    truth = mp.pt_w[eligible].copy()
    mp.pt_w[eligible] = truth + rng.normal(0, 0.03, truth.shape)
    # perturb every pose but KF0
    for kf in mp.keyframes[1:]:
        kf.T_w_k = kf.T_w_k.copy()
        kf.T_w_k[:3, 3] += rng.normal(0, 0.01, 3)
    pre_pose = np.stack([k.T_w_k[:3, 3] for k in mp.keyframes])
    pre_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)

    mesh = make_mesh(8, axis='kf')
    blk = dist_gba.distributed_global_bundle_adjustment(mapper, mesh,
                                                        rounds=2)
    assert len(blk.block_kfs) == 8
    # every eligible landmark is owned by exactly one block
    owned = np.zeros(len(blk.pt_ids_glob), np.int64)
    for b in range(8):
        owned[blk.pt_gid[b][blk.own_pt[b]]] += 1
    assert (owned == 1).all(), owned

    post_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)
    assert np.median(post_err) < 0.5 * np.median(pre_err), (
        np.median(pre_err), np.median(post_err))
    # poses pulled back toward the true lateral track
    gt = np.stack([T[:3, 3] for T in poses])
    post_pose = np.stack([k.T_w_k[:3, 3] for k in mp.keyframes])
    assert (np.linalg.norm(post_pose - gt, axis=1).mean()
            < np.linalg.norm(pre_pose - gt, axis=1).mean())
    assert np.isfinite(post_pose).all()


def test_partition_ownership_is_exclusive_and_anchors_kept():
    """Every global landmark is owned by at most one block (the block
    with the most observations, and only with >=2 there); landmarks a
    block merely sees stay listed as consensus anchors."""
    mapper, world, poses = _build()
    blk = dist_gba.partition_map(mapper, 2)
    owned = [set(blk.pt_gid[b][blk.own_pt[b]].tolist()) for b in range(2)]
    assert not (owned[0] & owned[1])
    n_owned = sum(len(o) for o in owned)
    assert 0 < n_owned <= len(blk.pt_ids_glob)
    listed = set()
    for b in range(2):
        valid = np.asarray(blk.prob.point_valid[b]) | blk.own_pt[b]
        listed |= set(blk.pt_gid[b][blk.pt_gid[b] >= 0].tolist())
    # every global slot appears in at least one block's problem
    assert listed >= set(range(len(blk.pt_ids_glob)))


def test_pipeline_routes_gba_to_mesh(monkeypatch):
    """PLSLAM.global_bundle_adjustment(mesh=...) dispatches the kf-block
    sharded GBA; without a mesh it runs the chunked single-chip solve."""
    import jax

    from plslam_tpu import pipeline as pl_mod

    calls = {}

    def fake_dist(mapper, mesh, rounds=2):
        calls["mesh"] = mesh
        return "dist"

    monkeypatch.setattr("plslam_tpu.parallel.dist_gba."
                        "distributed_global_bundle_adjustment", fake_dist)

    class FakeMapper:
        def global_bundle_adjustment(self):
            calls["single"] = True
            return "single"

    slam = pl_mod.PLSLAM.__new__(pl_mod.PLSLAM)
    slam.mapper = FakeMapper()
    mesh = make_mesh(min(8, len(jax.local_devices(backend="cpu"))), "kf")
    assert slam.global_bundle_adjustment(mesh=mesh) == "dist"
    assert calls["mesh"] is mesh
    assert slam.global_bundle_adjustment() == "single"


def test_distributed_gba_on_real_map_runs_under_mesh():
    """End-to-end: the sharded GBA on an 8-block mesh leaves a healthy map
    (all poses finite, landmarks updated in place)."""
    import jax

    devs = jax.local_devices(backend="cpu")
    mapper, world, poses = _build(n_kf=16)
    mesh = make_mesh(min(8, len(devs)), dist_gba.AXIS)
    before = np.stack([k.T_w_k for k in mapper.map.keyframes])
    dist_gba.distributed_global_bundle_adjustment(mapper, mesh, rounds=1)
    after = np.stack([k.T_w_k for k in mapper.map.keyframes])
    assert np.isfinite(after).all()
    assert after.shape == before.shape


def _build_endpoint(n_kf=16, n_pts=300, n_ls=16):
    cam = make_camera()
    world = World(n_pts=n_pts, n_ls=n_ls, seed=9)
    cfg = MapConfig(ba_points=512, ba_lines=64, ba_pobs=4096, ba_lobs=512,
                    plucker_lines=False)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(n_kf, step=0.04)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    return mapper, world, poses


def test_kf_block_gba_endpoint_mode_reduces_error():
    """Endpoint-parameterized (non-Pluecker) kf-block GBA: line endpoints
    ride the point consensus table (the reference's GBA parameterization,
    mapHandler.cpp:3128-3731), so the loop-closure baseline config can use
    the sequence-block distribution too."""
    mapper, world, poses = _build_endpoint()
    mp = mapper.map
    rng = np.random.default_rng(1)
    eligible = np.where(mp.pt_valid & (mp.pt_nobs >= 2))[0]
    truth = mp.pt_w[eligible].copy()
    mp.pt_w[eligible] = truth + rng.normal(0, 0.03, truth.shape)
    l_eligible = np.where(mp.ls_valid & (mp.ls_nobs >= 2))[0]
    l_truth = mp.ls_epw[l_eligible].copy()
    mp.ls_epw[l_eligible] = l_truth + rng.normal(0, 0.03, l_truth.shape)
    for kf in mp.keyframes[1:]:
        kf.T_w_k = kf.T_w_k.copy()
        kf.T_w_k[:3, 3] += rng.normal(0, 0.01, 3)
    pre_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)
    pre_lerr = np.linalg.norm(
        (mp.ls_epw[l_eligible] - l_truth).reshape(len(l_eligible), -1),
        axis=1)

    mesh = make_mesh(8, axis='kf')
    blk = dist_gba.distributed_global_bundle_adjustment(mapper, mesh,
                                                        rounds=2)
    assert not blk.plucker
    # the global point table carries 2 endpoint rows per global line
    assert len(blk.pt_glob) == len(blk.pt_ids_glob) + 2 * len(
        blk.ls_ids_glob)
    # ownership exclusive across ALL consensus rows (points + endpoints)
    owned = np.zeros(len(blk.pt_glob), np.int64)
    for b in range(8):
        owned[blk.pt_gid[b][blk.own_pt[b]]] += 1
    assert (owned <= 1).all()
    assert owned[len(blk.pt_ids_glob):].sum() > 0, "no endpoint rows owned"

    post_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)
    assert np.median(post_err) < 0.5 * np.median(pre_err), (
        np.median(pre_err), np.median(post_err))
    post_lerr = np.linalg.norm(
        (mp.ls_epw[l_eligible] - l_truth).reshape(len(l_eligible), -1),
        axis=1)
    assert np.median(post_lerr) < np.median(pre_lerr), (
        np.median(pre_lerr), np.median(post_lerr))
    # the Pluecker mirror of each line was refreshed to ||d|| = 1
    d = mp.ls_w[l_eligible][:, 3:]
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)
    assert np.isfinite(
        np.stack([k.T_w_k for k in mp.keyframes])).all()
