"""Covisibility-graph semantics, loop-closure fusion, and full-coverage
chunked GBA (reference behaviors: mapHandler.cpp full_graph increments
:322-351/:788-789, decrements :2251-2252/:4036-4039, formLocalMap :1005,
loopClosureFuseLandmarks :5533-5807, globalBundleAdjustment :3022-3126)."""

import numpy as np
import pytest

from _map_fixtures import World, lateral_poses, make_camera, render_features
from plslam_tpu.backend.loop import LoopCloser, LoopConfig, build_pgo_edges
from plslam_tpu.backend.mapping import KeyframeRecord, MapConfig, MapHandler


def _build_mapper(n_kf=5, n_pts=120, n_ls=12, step=0.05, run_ba=False,
                  **cfg_kw):
    cam = make_camera()
    world = World(n_pts=n_pts, n_ls=n_ls)
    cfg = MapConfig(ba_points=2048, ba_pobs=8192, ba_lobs=2048, **cfg_kw)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(n_kf, step)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=run_ba)
    return mapper, world, poses


def _expected_covis(mp):
    """Pairwise shared-landmark counts recomputed from the obs tables."""
    k = len(mp.keyframes)
    exp = np.zeros((k, k), np.int64)
    for table, valid in ((mp.pobs, mp.pt_valid), (mp.lobs, mp.ls_valid)):
        for lm in np.unique(table.lm[: table.n][table.valid[: table.n]]):
            rows = table.valid[: table.n] & (table.lm[: table.n] == lm)
            kfs = np.unique(table.kf[: table.n][rows])
            for a in kfs:
                for b in kfs:
                    if a != b:
                        exp[a, b] += 1
    return exp


def test_covis_counts_every_observer_pair():
    """covis[i][j] equals the shared-landmark count for EVERY pair — in
    particular non-adjacent ones like (0, 4) (mapHandler.cpp:322-351)."""
    mapper, _, _ = _build_mapper()
    mp = mapper.map
    exp = _expected_covis(mp)
    np.testing.assert_array_equal(mp.covis, exp)
    # the world stays visible across all five KFs, so the far pair is rich
    assert mp.covis[0, 4] > 75, mp.covis
    assert (mp.covis == mp.covis.T).all()


def test_form_local_map_includes_covisible_kf0():
    """formLocalMap's covis>=min_lm_cov_graph branch (:1052) pulls KF0 in
    even though it is far outside the recency window."""
    mapper, _, _ = _build_mapper(n_kf=6)
    local = mapper.map.local_kf_set()
    assert local[0], (local, mapper.map.covis[-1])
    assert local[-1] and local[-2]


def test_pgo_covis_edges_materialize():
    """A loop closure on this map gets covisibility edges (i, j>=i+2), not
    just the odometry chain (mapHandler.cpp:5380)."""
    mapper, _, poses = _build_mapper()
    mp = mapper.map
    T_old = np.stack([k.T_w_k for k in mp.keyframes])
    e_i, e_j, _, _ = build_pgo_edges(
        mp.covis, T_old, mapper.cfg.min_lm_cov_graph,
        kf_id=4, cand_id=0, T_rel=np.eye(4))
    non_adjacent = [(i, j) for i, j in zip(e_i[:-1], e_j[:-1]) if j >= i + 2]
    assert (0, 4) in non_adjacent, list(zip(e_i, e_j))
    assert (0, 2) in non_adjacent


def test_obs_removal_decrements_covis():
    """Pruning one keyframe's observation of a shared landmark decrements
    covis against the remaining observers (:2251-2252)."""
    mapper, _, _ = _build_mapper(n_kf=3)
    mp = mapper.map
    before = mp.covis.copy()
    # landmark observed by all three KFs; drop KF1's observation
    tb = mp.pobs
    for lm in range(mp.n_pt):
        rows = np.where(tb.valid[: tb.n] & (tb.lm[: tb.n] == lm))[0]
        if set(tb.kf[rows].tolist()) == {0, 1, 2}:
            r1 = rows[tb.kf[rows] == 1]
            mp.remove_point_obs_rows(r1)
            break
    else:
        pytest.fail("no landmark observed by all three KFs")
    assert mp.covis[0, 1] == before[0, 1] - 1
    assert mp.covis[1, 2] == before[1, 2] - 1
    assert mp.covis[0, 2] == before[0, 2]  # pair not involving KF1 untouched


def test_kf_cull_clears_covis_row():
    """removeRedundantKFs clears the culled KF's row/col (:4036-4039)."""
    mapper, _, _ = _build_mapper(n_kf=5)
    mp = mapper.map
    mp.drop_keyframe_obs(2)
    assert (mp.covis[2, :] == 0).all() and (mp.covis[:, 2] == 0).all()
    assert mp.covis[0, 4] > 0  # other pairs survive


def test_loop_fusion_four_cases_points_and_lines():
    """loopClosureFuseLandmarks (:5533-5807): extend-old, extend-new,
    create-new, and fuse-duplicates for BOTH modalities, with observation
    counts, feature back-links, and covis reconciling afterwards."""
    cam = make_camera()
    world = World(n_pts=8, n_ls=8)
    mapper = MapHandler(cam, MapConfig())
    mp = mapper.map
    poses = lateral_poses(2, step=0.04)
    kf0 = KeyframeRecord(0, poses[0], render_features(world, poses[0], cam))
    kf1 = KeyframeRecord(1, poses[1], render_features(world, poses[1], cam))
    mp.keyframes.extend([kf0, kf1])
    mp.expand_graphs()

    def world_pt(i):
        return world.pts[i][None]

    # case ext_new: landmark exists only on the old side (KF0 feature 0)
    kf0.pt_lm[0] = mp.new_points(world_pt(0), world.pt_desc[0][None], 0,
                                 np.asarray([0]))[0]
    # case ext_old: landmark exists only on the new side (KF1 feature 1)
    kf1.pt_lm[1] = mp.new_points(world_pt(1), world.pt_desc[1][None], 1,
                                 np.asarray([1]))[0]
    # case created: feature 2 has no landmark on either side
    # case fused: both sides carry separate duplicates of feature 3
    kf0.pt_lm[3] = mp.new_points(world_pt(3), world.pt_desc[3][None], 0,
                                 np.asarray([3]))[0]
    kf1.pt_lm[3] = mp.new_points(world_pt(3), world.pt_desc[3][None], 1,
                                 np.asarray([3]))[0]

    from plslam_tpu.backend.mapping import (_np_normalize_plucker,
                                            _np_transform_plucker)

    def world_line(i, kf, feat_idx, kf_rec):
        Lw = _np_normalize_plucker(_np_transform_plucker(
            kf_rec.T_w_k, kf_rec.ls_NDc[feat_idx][None]))
        R, t = kf_rec.T_w_k[:3, :3], kf_rec.T_w_k[:3, 3]
        ep_w = np.stack([kf_rec.ls_sP[feat_idx] @ R.T + t,
                         kf_rec.ls_eP[feat_idx] @ R.T + t])[None]
        return mp.new_lines(Lw, world.ls_desc[i][None], kf,
                            np.asarray([feat_idx]), ep_w)[0]

    kf0.ls_lm[0] = world_line(0, 0, 0, kf0)
    kf1.ls_lm[1] = world_line(1, 1, 1, kf1)
    kf0.ls_lm[3] = world_line(3, 0, 3, kf0)
    kf1.ls_lm[3] = world_line(3, 1, 3, kf1)

    pt_pairs = np.asarray([[0, 0], [1, 1], [2, 2], [3, 3]])
    ls_pairs = np.asarray([[0, 0], [1, 1], [2, 2], [3, 3]])
    lc = LoopCloser(cam, mapper, LoopConfig())
    stats = lc._fuse_landmarks(1, 0, pt_pairs, ls_pairs)
    # one of each case per modality; nothing distance-gated (all pairs
    # are views of the same world entity)
    assert stats == {"ext_old": 2, "ext_new": 2, "created": 2, "fused": 2,
                     "gated": 0}

    for i in range(4):
        # both sides now link to ONE live landmark with two observations
        assert kf0.pt_lm[i] == kf1.pt_lm[i] >= 0
        lm = kf0.pt_lm[i]
        assert mp.pt_valid[lm] and mp.pt_nobs[lm] == 2
        kfs, fis = mp.point_obs(lm)
        assert sorted(kfs.tolist()) == [0, 1]
        assert kf0.ls_lm[i] == kf1.ls_lm[i] >= 0
        lm = kf0.ls_lm[i]
        assert mp.ls_valid[lm] and mp.ls_nobs[lm] == 2
    # the fused-away duplicates are dead
    assert mp.pt_valid.sum() == 4 and mp.ls_valid.sum() == 4
    assert mp.n_pt == 5 and mp.n_ls == 5
    # every fusion case shares exactly one landmark between KF0 and KF1
    assert mp.covis[0, 1] == 8, mp.covis


def test_loop_fusion_distance_gates_reject_aliased_landmarks():
    """Fusion gates (max_point_point_error / max_point_line_error /
    max_dir_line_error, slamConfig.cpp:54): two NEARBY-BUT-DISTINCT
    landmarks whose descriptors alias (a wrong mutual-NNR pair at a loop
    event) must NOT be welded; a gate failure leaves both landmarks and
    both feature links untouched."""
    cam = make_camera()
    world = World(n_pts=8, n_ls=8)
    mapper = MapHandler(cam, MapConfig())
    mp = mapper.map
    poses = lateral_poses(2, step=0.04)
    kf0 = KeyframeRecord(0, poses[0], render_features(world, poses[0], cam))
    kf1 = KeyframeRecord(1, poses[1], render_features(world, poses[1], cam))
    mp.keyframes.extend([kf0, kf1])
    mp.expand_graphs()

    # the "duplicate" pair actually links two DIFFERENT world points, 0.5 m
    # apart (gate default 0.1 m): feature 0 of KF0 -> world point 0,
    # feature 1 of KF1 -> world point 1 with an aliased descriptor
    d = float(np.linalg.norm(world.pts[0] - world.pts[1]))
    assert d > 0.1, "fixture points must violate the default gate"
    lm0 = mp.new_points(world.pts[0][None], world.pt_desc[0][None], 0,
                        np.asarray([0]))[0]
    lm1 = mp.new_points(world.pts[1][None], world.pt_desc[0][None], 1,
                        np.asarray([1]))[0]
    kf0.pt_lm[0] = lm0
    kf1.pt_lm[1] = lm1

    lc = LoopCloser(cam, mapper, LoopConfig())
    # fuse case (both landmarks exist): aliased pair (0 in KF0, 1 in KF1)
    stats = lc._fuse_landmarks(1, 0, np.asarray([[0, 1]]),
                               np.zeros((0, 2), np.int64))
    assert stats["fused"] == 0 and stats["gated"] == 1
    assert mp.pt_valid[lm0] and mp.pt_valid[lm1]
    assert kf0.pt_lm[0] == lm0 and kf1.pt_lm[1] == lm1

    # extend case: landmark only on the new side, old-side feature sees a
    # different world point -> gated, no observation added
    stats = lc._fuse_landmarks(1, 0, np.asarray([[2, 1]]),
                               np.zeros((0, 2), np.int64))
    assert stats["ext_old"] == 0 and stats["gated"] == 1
    assert mp.pt_nobs[lm1] == 1

    # create case: the two features back-project to different world points
    stats = lc._fuse_landmarks(1, 0, np.asarray([[4, 5]]),
                               np.zeros((0, 2), np.int64))
    assert stats["created"] == 0 and stats["gated"] == 1

    # line direction gate: two world lines with different directions must
    # not fuse even if their midpoints are close
    llm0 = mp.new_lines(
        np.zeros((1, 6)), world.ls_desc[0][None], 0, np.asarray([0]),
        np.asarray([[[0.0, 0, 2], [1.0, 0, 2]]]))[0]
    llm1 = mp.new_lines(
        np.zeros((1, 6)), world.ls_desc[0][None], 1, np.asarray([1]),
        np.asarray([[[0.5, -0.5, 2], [0.5, 0.5, 2]]]))[0]
    kf0.ls_lm[0] = llm0
    kf1.ls_lm[1] = llm1
    stats = lc._fuse_landmarks(1, 0, np.zeros((0, 2), np.int64),
                               np.asarray([[0, 1]]))
    assert stats["fused"] == 0 and stats["gated"] == 1
    assert mp.ls_valid[llm0] and mp.ls_valid[llm1]


def test_descriptor_reelection_matches_median_rule():
    """Batched refresh_landmark_descriptors == updateAverageDescDir
    (mapFeatures.cpp:52-140): the representative descriptor becomes the
    observation descriptor with minimal summed Hamming distance, so a
    landmark whose viewpoint drifted re-elects a CURRENT descriptor
    instead of keeping its creation-time one forever."""
    cam = make_camera()
    world = World(n_pts=8, n_ls=4)
    mapper = MapHandler(cam, MapConfig())
    mp = mapper.map
    poses = lateral_poses(3, step=0.04)
    kfs = [KeyframeRecord(i, poses[i], render_features(world, poses[i], cam))
           for i in range(3)]
    mp.keyframes.extend(kfs)
    mp.expand_graphs()

    # three observations with drifting descriptors: two nearby variants
    # and one outlier — the elected one minimizes the summed distance
    base = np.zeros(8, np.uint32)
    drift = base.copy()
    drift[0] = 0b111                      # 3 bits from base
    outlier = np.full(8, 0xFFFFFFFF, np.uint32)
    for kf in kfs:  # the packed device fetch yields read-only views
        kf.pt_desc = kf.pt_desc.copy()
        kf.ls_desc = kf.ls_desc.copy()
    kfs[0].pt_desc[0] = outlier           # creation-time descriptor
    kfs[1].pt_desc[0] = base
    kfs[2].pt_desc[0] = drift
    lm = mp.new_points(world.pts[0][None], outlier[None], 0,
                       np.asarray([0]))[0]
    mp.add_point_obs([lm], 1, [0])
    mp.add_point_obs([lm], 2, [0])
    assert (mp.pt_desc[lm] == outlier).all()

    kfs[0].ls_desc[0] = outlier
    kfs[1].ls_desc[0] = base
    kfs[2].ls_desc[0] = drift
    llm = mp.new_lines(np.zeros((1, 6)), outlier[None], 0, np.asarray([0]),
                       np.zeros((1, 2, 3)))[0]
    mp.add_line_obs([llm], 1, [0])
    mp.add_line_obs([llm], 2, [0])

    mapper.refresh_landmark_descriptors()
    # oracle: brute-force argmin of summed pairwise Hamming distances
    descs = np.stack([outlier, base, drift])
    x = np.bitwise_xor(descs[:, None], descs[None, :])
    D = np.bitwise_count(x).sum(-1)
    best = descs[D.sum(1).argmin()]
    assert (mp.pt_desc[lm] == best).all()
    assert (mp.ls_desc[llm] == best).all()
    assert not (mp.pt_desc[lm] == outlier).all()


def test_descriptor_reelection_wired_into_mapping_path():
    """The re-election actually RUNS from add_keyframe every
    desc_refresh_kfs keyframes (the reference invokes
    updateAverageDescDir from its matchKF2KF/Map2KF paths)."""
    mapper, world, poses = _build_mapper(n_kf=5, n_pts=60, n_ls=8,
                                         desc_refresh_kfs=2)
    mp = mapper.map
    # every multi-obs landmark's descriptor must equal one of its
    # observations' descriptors under the median rule (here all obs share
    # the world descriptor, so it must be unchanged — the wiring smoke
    # check is that refresh ran without corrupting anything)
    lms = np.where(mp.pt_valid & (mp.pt_nobs >= 3))[0]
    assert len(lms) > 10
    for lm in lms[:20]:
        kfs_, fis = mp.point_obs(lm)
        descs = np.stack([mp.keyframes[k].pt_desc[f]
                          for k, f in zip(kfs_, fis)])
        assert any((mp.pt_desc[lm] == d).all() for d in descs)


def test_gba_covers_whole_map_in_chunks():
    """GBA over > ba_points landmarks and > ba_pobs observations updates
    EVERY eligible landmark — no silent truncation (VERDICT round-1 weak
    #2; globalBundleAdjustment :3022-3126)."""
    cam = make_camera()
    world = World(n_pts=1200, n_ls=20, seed=7)
    cfg = MapConfig(ba_points=512, ba_lines=64, ba_pobs=3072, ba_lobs=512)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(5, step=0.05)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    mp = mapper.map
    eligible = np.where(mp.pt_valid & (mp.pt_nobs >= 2))[0]
    assert len(eligible) > 2 * cfg.ba_points  # forces >2 chunks
    n_obs = int(mp.pobs.valid[: mp.pobs.n].sum())
    assert n_obs > cfg.ba_pobs

    rng = np.random.default_rng(0)
    truth = mp.pt_w[eligible].copy()
    mp.pt_w[eligible] = truth + rng.normal(0, 0.05, truth.shape)
    pre = mp.pt_w[eligible].copy()
    mapper.global_bundle_adjustment()
    post = mp.pt_w[eligible]
    moved = np.linalg.norm(post - pre, axis=1) > 1e-7
    assert moved.mean() > 0.99, f"only {moved.mean():.2%} updated"
    # and moved TOWARD the truth
    err_pre = np.linalg.norm(pre - truth, axis=1)
    err_post = np.linalg.norm(post - truth, axis=1)
    assert np.median(err_post) < 0.2 * np.median(err_pre)


def test_endpoint_gba_chunk_caps_respect_point_table():
    """Endpoint-mode GBA appends 2 point slots per line; chunk caps must
    jointly satisfy |points| + 2*|lines| <= ba_points (review finding:
    clamping only the point cap overflowed the table when
    ba_lines > ba_points/4)."""
    cam = make_camera()
    world = World(n_pts=140, n_ls=70)
    cfg = MapConfig(plucker_lines=False, ba_points=120, ba_lines=32,
                    ba_pobs=4096, ba_lobs=1024)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(4, 0.05)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    mapper.global_bundle_adjustment()     # IndexError before the fix


def test_plucker_ba_keeps_epw_on_optimized_line():
    """Pluecker-mode BA write-back must keep the stored world endpoints on
    the optimized line: Map2KF association gates on projected ls_epw, and
    stale creation-time endpoints would starve line re-observations
    (review finding r2)."""
    mapper, _, _ = _build_mapper(run_ba=True)
    mp = mapper.map
    mapper.flush_ba()
    ids = np.nonzero(mp.ls_valid)[0]
    assert len(ids)
    Lw = mp.ls_w[ids]
    n, d = Lw[:, :3], Lw[:, 3:]
    dn = np.linalg.norm(d, axis=-1, keepdims=True)
    d = d / dn
    nn = n / dn
    for k in range(2):
        x = mp.ls_epw[ids][:, k]
        dist = np.linalg.norm(np.cross(x, d) - nn, axis=-1)
        # f32 pipeline at meter-scale geometry: machine-epsilon-level
        # residue only (the r5 early-exit LM lands at a slightly
        # different rounding than the fixed 15-iteration schedule, which
        # nudged the worst endpoint from 9e-7 to 1.1e-6)
        assert dist.max() < 5e-6, dist.max()


def _rowpair_covis(mp):
    """Exact covis invariant: ordered pairs of distinct live rows of the
    same landmark with distinct keyframes (merges can leave one KF with
    two rows of a landmark, which counts per ROW — the reference's
    per-shared-feature increments, mapHandler.cpp:349-350)."""
    k = len(mp.keyframes)
    exp = np.zeros((k, k), np.int64)
    for table in (mp.pobs, mp.lobs):
        live = np.where(table.valid[: table.n])[0]
        lms = table.lm[live]
        kfs = table.kf[live]
        for lm in np.unique(lms):
            kk = kfs[lms == lm]
            for i in range(len(kk)):
                for j in range(len(kk)):
                    if i != j and kk[i] != kk[j]:
                        exp[kk[i], kk[j]] += 1
    return exp


def test_batched_maintenance_keeps_covis_invariant():
    """Randomized removal / merge / KF-drop sequences must keep the covis
    matrix equal to its from-scratch recomputation (the batched pair
    arithmetic of the lazy-indexed obs table vs the r3 per-row loops)."""
    mapper, _, _ = _build_mapper(n_kf=7, n_pts=150, n_ls=14)
    mp = mapper.map
    rng = np.random.default_rng(3)
    np.testing.assert_array_equal(mp.covis, _rowpair_covis(mp))
    for step in range(6):
        tb = mp.pobs
        live = np.where(tb.valid[: tb.n])[0]
        if len(live) > 5:
            mp.remove_point_obs_rows(rng.choice(live, 5, replace=False))
        lt = mp.lobs
        live_l = np.where(lt.valid[: lt.n])[0]
        if len(live_l) > 2:
            mp.remove_line_obs_rows(rng.choice(live_l, 2, replace=False))
        lp = np.where(mp.pt_valid)[0]
        if len(lp) > 4:
            keep, kill = rng.choice(lp, 2, replace=False)
            mp.merge_point_landmarks(int(keep), int(kill))
        if step == 3:
            mp.drop_keyframe_obs(2)
        np.testing.assert_array_equal(mp.covis, _rowpair_covis(mp),
                                      err_msg=f"step {step}")
    # nobs stays in sync with live rows per landmark
    tb = mp.pobs
    cnt = np.bincount(tb.lm[: tb.n][tb.valid[: tb.n]], minlength=mp.n_pt)
    assert (mp.pt_nobs[mp.pt_valid] == cnt[np.where(mp.pt_valid)[0]]).all()


def test_kf_drop_rebases_landmark_ownership():
    """Landmarks anchored (first_kf) at a dropped keyframe are handed to
    their oldest surviving observer (removeRedundantKFs :3983-4009)."""
    mapper, _, _ = _build_mapper(n_kf=5, n_pts=120, n_ls=12)
    mp = mapper.map
    owned = np.where(mp.pt_valid & (mp.pt_first_kf == 0)
                     & (mp.pt_nobs >= 2))[0]
    assert len(owned) > 0
    mp.drop_keyframe_obs(0)
    for lm in owned[:20]:
        kfs, _ = mp.point_obs(int(lm))
        if len(kfs):
            assert mp.pt_first_kf[lm] == kfs.min()
            assert mp.pt_first_kf[lm] != 0


def test_lba_divergence_guard_discards_runaway_solves(caplog):
    """A bounded robust cost can accept an LM step that flings a weak
    pose far away; the write-back guard (MapConfig.lba_max_jump) must
    discard such a solve loudly and leave the map untouched."""
    import dataclasses
    import logging

    mapper, _, _ = _build_mapper(n_kf=5, n_pts=120, n_ls=12)
    mp = mapper.map
    before = np.stack([k.T_w_k for k in mp.keyframes])
    # threshold below any real update -> every solve is "divergent"
    mapper.cfg = dataclasses.replace(mapper.cfg, lba_max_jump=1e-12)
    with caplog.at_level(logging.WARNING, logger="plslam"):
        mapper.local_bundle_adjustment()
    assert any("divergence guard" in m for m in caplog.messages)
    after = np.stack([k.T_w_k for k in mp.keyframes])
    np.testing.assert_array_equal(before, after)
    # with the default bound the same solve is applied
    mapper.cfg = dataclasses.replace(mapper.cfg, lba_max_jump=1.0)
    mapper.local_bundle_adjustment()
