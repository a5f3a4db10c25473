"""Loop-closure subsystem test on a synthetic drifting square loop:
retrieval must find the revisited place, geometric verification must
recover the relative pose, and the PGO correction must shrink the drift
(SURVEY.md §4: property test — PGO closes synthetic loops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.backend.loop import LoopCloser, LoopConfig
from plslam_tpu.backend.mapping import MapConfig, MapHandler
from plslam_tpu.core import lie
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineSet, PointSet, StereoFeatures

CAM = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074,
                          dtype=jnp.float32)
N_PT = 96
RNG = np.random.default_rng(17)


def make_features(T_w_c_true: np.ndarray, place_pts: np.ndarray,
                  place_desc: np.ndarray) -> StereoFeatures:
    """Stereo features of a KF truly located at T_w_c_true observing the
    given world points."""
    T_c_w = np.linalg.inv(T_w_c_true)
    Pc = (T_c_w[:3, :3] @ place_pts.T).T + T_c_w[:3, 3]
    uv = np.stack([435.2 * Pc[:, 0] / Pc[:, 2] + 367.4,
                   435.2 * Pc[:, 1] / Pc[:, 2] + 252.2], -1)
    disp = 435.2 * 0.110074 / Pc[:, 2]
    valid = (Pc[:, 2] > 0.3) & (uv[:, 0] > 0) & (uv[:, 0] < 752) \
        & (uv[:, 1] > 0) & (uv[:, 1] < 480)
    pts = PointSet(
        uv=jnp.asarray(uv, jnp.float32),
        disp=jnp.asarray(disp, jnp.float32),
        P=jnp.asarray(Pc, jnp.float32),
        desc=jnp.asarray(place_desc),
        sigma2=jnp.ones(N_PT, jnp.float32),
        valid=jnp.asarray(valid),
    )
    return StereoFeatures(points=pts, lines=LineSet.empty(8))


def _run_loop_scenario(**loop_kwargs):
    # square loop of 12 steps; drifted odometry, true revisit at the end
    side = 3
    xis = []
    for leg in range(4):
        for s in range(side):
            xi = np.zeros(6)
            xi[0] = 1.2
            if s == side - 1:
                xi[5] = np.pi / 2
            xis.append(xi)
    noisy = [x + RNG.normal(size=6) * np.array([0.02] * 3 + [0.004] * 3)
             for x in xis]
    T_true = [np.eye(4)]
    T_drift = [np.eye(4)]
    for xt, xn in zip(xis, noisy):
        T_true.append(T_true[-1] @ np.asarray(lie.exp_se3(jnp.asarray(xt))))
        T_drift.append(T_drift[-1] @ np.asarray(lie.exp_se3(jnp.asarray(xn))))

    # one "place" per KF: world points in front of the true pose
    places_pts, places_desc = [], []
    for T in T_true:
        local = np.stack([RNG.uniform(-2.5, 2.5, N_PT),
                          RNG.uniform(-1.8, 1.8, N_PT),
                          RNG.uniform(3.0, 9.0, N_PT)], -1)
        world = (T[:3, :3] @ local.T).T + T[:3, 3]
        places_pts.append(world)
        places_desc.append(RNG.integers(0, 2**32, (N_PT, 8), dtype=np.uint32))

    mapper = MapHandler(CAM, MapConfig(use_lines=False, min_lm_cov_graph=10**9))
    closer = LoopCloser(CAM, mapper, LoopConfig(
        lc_kf_dist=8, lc_nkf_closest=1, min_pt_matches=12, vocab_k=6,
        vocab_depth=2, **loop_kwargs))

    # insert KFs 0..11 at drifted poses observing their own place
    mapper.initialize(T_drift[0], make_features(T_true[0], places_pts[0],
                                                places_desc[0]))
    closer.on_new_keyframe()
    reports = []
    for i in range(1, len(xis)):
        feats = make_features(T_true[i], places_pts[i], places_desc[i])
        mapper.add_keyframe(T_drift[i], feats, run_ba=False)
        r = closer.on_new_keyframe()
        if r:
            reports.append(r)
    # final KF: revisits place 0 (true pose back at origin), drifted estimate
    i = len(xis)
    feats = make_features(T_true[i], places_pts[0], places_desc[0])
    mapper.add_keyframe(T_drift[i], feats, run_ba=False)
    drift_before = np.linalg.norm(
        mapper.map.keyframes[-1].T_w_k[:3, 3] - T_true[i][:3, 3])
    r = closer.on_new_keyframe()
    if r:
        reports.append(r)
    return mapper, closer, reports, T_true, drift_before


@pytest.fixture(scope="module")
def loop_setup():
    return _run_loop_scenario()


def test_loop_detected(loop_setup):
    _, _, reports, _, _ = loop_setup
    assert len(reports) >= 1, "no loop closure fired"
    assert reports[-1]["candidate"] == 0


def test_loop_correction_reduces_drift(loop_setup):
    mapper, _, reports, T_true, drift_before = loop_setup
    assert drift_before > 0.1  # there was real drift
    kf = mapper.map.keyframes[-1]
    drift_after = np.linalg.norm(kf.T_w_k[:3, 3] - T_true[len(T_true) - 1][:3, 3])
    assert drift_after < 0.5 * drift_before, (drift_before, drift_after)


def test_no_false_loops_midway(loop_setup):
    _, _, reports, _, _ = loop_setup
    # only the genuine revisit should close
    assert all(r["candidate"] == 0 for r in reports)
    assert len(reports) == 1


def test_essential_graph_variant():
    """loopClosureOptimizationEssGraphG2O (:5070-5299): strong-edge graph
    with the loop-closure target fixed also corrects the drift."""
    global RNG
    RNG = np.random.default_rng(17)
    mapper, _, reports, T_true, drift_before = _run_loop_scenario(
        pgo_graph="essential")
    assert len(reports) >= 1 and reports[-1]["candidate"] == 0
    kf = mapper.map.keyframes[-1]
    drift_after = np.linalg.norm(
        kf.T_w_k[:3, 3] - T_true[len(T_true) - 1][:3, 3])
    assert drift_after < 0.5 * drift_before, (drift_before, drift_after)


def test_vocab_refresh_keeps_loop_closing():
    """vocab_refresh_kfs: periodic online-vocabulary retraining re-encodes
    every KF, keeps bow/conf aligned, and the revisit still closes."""
    mapper, closer, reports, T_true, drift_before = _run_loop_scenario(
        vocab_refresh_kfs=4)
    k = len(mapper.map.keyframes)
    assert len(closer.bow) == k
    assert closer.conf.shape == (k, k)
    np.testing.assert_allclose(closer.conf, closer.conf.T, atol=0)
    assert reports, "loop must still close after vocabulary refreshes"
    drift_after = np.linalg.norm(
        mapper.map.keyframes[-1].T_w_k[:3, 3] - T_true[-1][:3, 3])
    assert drift_after < drift_before


def test_pretrained_vocabulary_loop_closes():
    """The SHIPPED pretrained vocabulary (configs/vocab_orb_k10L3.yml.gz,
    DBoW2 interchange format) drives candidate retrieval end-to-end: with
    a fixed vocabulary (reference semantics, mapHandler.cpp:41-44) the
    same revisit scenario still detects and closes the loop."""
    import os

    voc = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "vocab_orb_k10L3.yml.gz")
    mapper, closer, reports, T_true, drift_before = _run_loop_scenario(
        vocabulary_file=voc)
    assert closer.voc is not None and closer.voc.num_words == 1000
    assert len(reports) >= 1, "no closure with the pretrained vocabulary"
    r = reports[-1]
    assert r["candidate"] == 0 and r["kf"] == 12, r
    drift_after = np.linalg.norm(
        mapper.map.keyframes[-1].T_w_k[:3, 3] - T_true[12][:3, 3])
    assert drift_after < drift_before
