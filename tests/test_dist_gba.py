"""kf-axis (sequence-block) sharded global BA on a virtual 8-device mesh
(SURVEY.md §2.4/§5, BASELINE config 5: trajectory-block partitioning).

The sharded solve is EXACT (landmark-disjoint chunks, psum-combined
reduced camera system), so these tests hold it to direct agreement with
``MapHandler.global_bundle_adjustment`` on an identical map — the same
parity bar the driver's dryrun enforces."""

import numpy as np

from _map_fixtures import World, lateral_poses, make_camera, render_features
from plslam_tpu.backend.mapping import MapConfig, MapHandler
from plslam_tpu.parallel import dist_gba
from plslam_tpu.parallel.mesh import make_mesh


def _build(n_kf=16, n_pts=300, n_ls=16, plucker=True):
    cam = make_camera()
    world = World(n_pts=n_pts, n_ls=n_ls, seed=9)
    # ba_pobs large enough that the SINGLE-chip oracle never truncates
    # (16 KFs x 300 pts = 4800 obs land in one chunk there; the sharded
    # solve spreads them over 8 chunks)
    cfg = MapConfig(ba_points=512, ba_lines=64, ba_pobs=8192, ba_lobs=512,
                    plucker_lines=plucker)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(n_kf, step=0.04)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    return mapper, world, poses


def _perturb(mapper, seed=1, lines=False):
    mp = mapper.map
    rng = np.random.default_rng(seed)
    eligible = np.where(mp.pt_valid & (mp.pt_nobs >= 2))[0]
    truth = mp.pt_w[eligible].copy()
    mp.pt_w[eligible] = truth + rng.normal(0, 0.03, truth.shape)
    l_eligible = np.where(mp.ls_valid & (mp.ls_nobs >= 2))[0]
    l_truth = mp.ls_epw[l_eligible].copy()
    if lines:
        mp.ls_epw[l_eligible] = l_truth + rng.normal(0, 0.03, l_truth.shape)
    for kf in mp.keyframes[1:]:
        kf.T_w_k = kf.T_w_k.copy()
        kf.T_w_k[:3, 3] += rng.normal(0, 0.01, 3)
    return eligible, truth, l_eligible, l_truth


def test_kf_block_gba_matches_single_chip_and_reduces_error():
    mapper, world, poses = _build()
    mapper_b, _, _ = _build()      # identical copy for the single-chip oracle
    eligible, truth, _, _ = _perturb(mapper)
    _perturb(mapper_b)
    mp = mapper.map
    pre_pose = np.stack([k.T_w_k[:3, 3] for k in mp.keyframes])
    pre_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)

    mesh = make_mesh(8, axis='kf')
    blk = dist_gba.distributed_global_bundle_adjustment(mapper, mesh)
    assert len(blk.block_kfs) == 8
    # every global landmark lives in exactly one chunk (exactness invariant)
    owned = np.zeros(len(blk.pt_ids_glob), np.int64)
    for c in range(len(blk.pt_gid)):
        sel = blk.own_pt[c] & (blk.pt_gid[c] >= 0)
        owned[blk.pt_gid[c][sel]] += 1
    assert (owned == 1).all(), owned

    post_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)
    assert np.median(post_err) < 0.5 * np.median(pre_err), (
        np.median(pre_err), np.median(post_err))
    gt = np.stack([T[:3, 3] for T in poses])
    post_pose = np.stack([k.T_w_k[:3, 3] for k in mp.keyframes])
    assert (np.linalg.norm(post_pose - gt, axis=1).mean()
            < np.linalg.norm(pre_pose - gt, axis=1).mean())
    assert np.isfinite(post_pose).all()

    # PARITY: the sharded solve is the single-chip chunked GBA psum'd, so
    # it must agree with it directly (f32 reduction-order noise only)
    mapper_b.global_bundle_adjustment()
    mpb = mapper_b.map
    dpose = max(np.abs(mp.keyframes[k].T_w_k - mpb.keyframes[k].T_w_k).max()
                for k in range(len(mp.keyframes)))
    dx = np.abs(mp.pt_w[eligible] - mpb.pt_w[eligible]).max()
    assert dpose < 5e-3, dpose
    assert dx < 2e-2, dx
    # and match the single-chip solve's error to truth within 25%
    single_err = np.linalg.norm(mpb.pt_w[eligible] - truth, axis=1)
    assert np.median(post_err) < 1.25 * np.median(single_err) + 1e-4, (
        np.median(post_err), np.median(single_err))


def test_partition_chunks_are_exclusive_and_complete():
    """Every global landmark appears in exactly one chunk, together with
    all of its observations (the invariant that makes psum'd Schur
    accumulation exact)."""
    mapper, world, poses = _build()
    blk = dist_gba.partition_map(mapper, 2)
    seen = {}
    for c in range(len(blk.pt_gid)):
        sel = blk.own_pt[c] & (blk.pt_gid[c] >= 0)
        for g in blk.pt_gid[c][sel].tolist():
            assert g not in seen, f"landmark {g} in chunks {seen[g]} and {c}"
            seen[g] = c
    assert set(seen) == set(range(len(blk.pt_ids_glob)))
    # observation completeness: chunk obs counts sum to the map's
    mp = mapper.map
    tb = mp.pobs
    glob = np.isin(tb.lm[: tb.n], blk.pt_ids_glob) & tb.valid[: tb.n]
    n_obs_map = int(glob.sum())
    n_obs_chunks = int(np.asarray(blk.prob.p_valid).sum())
    if not blk.plucker:
        n_obs_chunks -= int(np.asarray(blk.prob.p_is_line).sum())
    assert n_obs_chunks == n_obs_map, (n_obs_chunks, n_obs_map)


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
    dist_gba.distributed_global_bundle_adjustment(mapper, mesh)
    after = np.stack([k.T_w_k for k in mapper.map.keyframes])
    assert np.isfinite(after).all()
    assert after.shape == before.shape


def test_kf_block_gba_endpoint_mode_matches_single_chip():
    """Endpoint-parameterized (non-Pluecker) kf-block GBA: line endpoints
    ride each chunk's point table (the reference's GBA parameterization,
    mapHandler.cpp:3128-3731), and the sharded solve still agrees with
    the single-chip chunked GBA."""
    mapper, world, poses = _build(plucker=False)
    mapper_b, _, _ = _build(plucker=False)
    eligible, truth, l_eligible, l_truth = _perturb(mapper, lines=True)
    _perturb(mapper_b, lines=True)
    mp = mapper.map
    pre_err = np.linalg.norm(mp.pt_w[eligible] - truth, axis=1)
    pre_lerr = np.linalg.norm(
        (mp.ls_epw[l_eligible] - l_truth).reshape(len(l_eligible), -1),
        axis=1)

    mesh = make_mesh(8, axis='kf')
    blk = dist_gba.distributed_global_bundle_adjustment(mapper, mesh)
    assert not blk.plucker
    # ownership exclusive across ALL slots (points + endpoint rows), and
    # endpoint rows are present
    owned = np.zeros(len(blk.pt_ids_glob) + 2 * len(blk.ls_ids_glob),
                     np.int64)
    for c in range(len(blk.pt_gid)):
        sel = blk.own_pt[c] & (blk.pt_gid[c] >= 0)
        owned[blk.pt_gid[c][sel]] += 1
    assert (owned == 1).all()
    assert owned[len(blk.pt_ids_glob):].sum() == 2 * len(blk.ls_ids_glob)

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

    # PARITY with the single-chip endpoint-mode GBA
    mapper_b.global_bundle_adjustment()
    mpb = mapper_b.map
    dpose = max(np.abs(mp.keyframes[k].T_w_k - mpb.keyframes[k].T_w_k).max()
                for k in range(len(mp.keyframes)))
    assert dpose < 5e-3, dpose
    single_err = np.linalg.norm(mpb.pt_w[eligible] - truth, axis=1)
    assert np.median(post_err) < 1.25 * np.median(single_err) + 1e-4, (
        np.median(post_err), np.median(single_err))
