"""Loop-closure stress at reference scale with a DISTRACTOR corridor and
online-vocabulary refresh: ring A (genuine revisit region) -> corridor B
(spatially distinct world with the same geometric statistics — candidates
here would be false loops) -> ring A again.  Asserts candidate PRECISION
(every closure pairs a revisit KF with the matching-angle KF of the first
pass, never a corridor KF), not merely "a loop closed"
(lookForLoopCandidates gating, mapHandler.cpp:4241-4301; VERDICT r3
next-round #5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from _map_fixtures import RingWorld, make_camera, render_ring_features
from plslam_tpu.backend.mapping import MapConfig
from plslam_tpu.config import PLSLAMConfig
from plslam_tpu.core import lie
from plslam_tpu.pipeline import PLSLAM

N_A1 = 100           # first pass around ring A (full revolution)
N_B = 60             # distractor corridor (distinct world, KFs 100..159)
N_A2 = 30            # revisit pass over ring A   (KFs 160..189)
RNG = np.random.default_rng(21)

pytestmark = pytest.mark.slow


class _ShiftedRing(RingWorld):
    """A second ring world displaced far from the first — same geometry
    class, different (random) descriptors: a pure place-recognition
    distractor."""

    def __init__(self, offset, **kw):
        super().__init__(**kw)
        self.offset = np.asarray(offset, float)
        self.pts = self.pts + self.offset
        self.ls_A = self.ls_A + self.offset
        self.ls_B = self.ls_B + self.offset

    def pose_at(self, theta):
        T = super().pose_at(theta)
        T[:3, 3] += self.offset
        return T


@pytest.fixture(scope="module")
def stress_run():
    cam = make_camera()
    ring = RingWorld(n_pts=2200, n_ls=220, seed=5)
    corridor = _ShiftedRing(offset=(0.0, 60.0, 0.0),
                            n_pts=1600, n_ls=160, seed=77)
    cfg = PLSLAMConfig(use_line_plucker=False, use_loop_closure=True,
                       multithread_slam=True,
                       vocab_refresh_kfs=40)   # >=2 online retrains
    mcfg = MapConfig(use_lines=True, plucker_lines=False,
                     local_ba_kf=8, ba_points=512, ba_lines=64,
                     ba_pobs=2048, ba_lobs=512)
    slam = PLSLAM(cam, cfg, mcfg)

    # trajectory: A1 full revolution, B HALF-revolution (a distractor
    # corridor with no self-revisit — a full ring would legitimately
    # close on itself), A2 revisit over A1's start
    worlds, thetas = [], []
    for i in range(N_A1):
        worlds.append(ring)
        thetas.append(2 * np.pi * i / N_A1)
    for i in range(N_B):
        worlds.append(corridor)
        thetas.append(np.pi * i / N_B)
    for i in range(N_A2):
        worlds.append(ring)
        thetas.append(2 * np.pi * i / N_A1)   # same angular raster as A1
    T_true = [w.pose_at(th) for w, th in zip(worlds, thetas)]

    T_est = [T_true[0]]
    for i in range(1, len(T_true)):
        rel = np.linalg.inv(T_true[i - 1]) @ T_true[i]
        eps = np.concatenate([RNG.normal(0, 0.010, 3),
                              RNG.normal(0, 0.0025, 3)])
        rel = rel @ np.asarray(lie.exp_se3(jnp.asarray(eps)))
        T_est.append(T_est[-1] @ rel)

    for i, (w, T) in enumerate(zip(worlds, T_est)):
        feats = render_ring_features(worlds[i], T_true[i], cam)
        slam.insert_keyframe_features(T, feats, timestamp=0.1 * i)
    slam.wait_until_idle()
    return slam, thetas


def _in_ring_a(k: int) -> bool:
    return k < N_A1 or k >= N_A1 + N_B


def test_loops_close_with_precision(stress_run):
    slam, thetas = stress_run
    assert len(slam.loop_reports) >= 1, \
        "no closure (online vocab + distractors)"
    sector = 2 * np.pi / N_A1
    for r in slam.loop_reports:
        # every closure stays within ring A (the end of the first
        # revolution closing against the start is genuine too — the ring
        # is a physical loop) and NEVER touches the distractor corridor
        assert _in_ring_a(r["kf"]) and _in_ring_a(r["candidate"]), \
            f"false loop into the distractor corridor: {r}"
        # ... and pairs matching ring angles (candidate precision)
        dth = abs(thetas[r["candidate"]] - thetas[r["kf"]])
        dth = min(dth, 2 * np.pi - dth)
        assert dth <= 3.0 * sector, (r, dth)
    # the revisit pass after the corridor must close as well
    assert any(r["kf"] >= N_A1 + N_B for r in slam.loop_reports), \
        slam.loop_reports


def test_no_corridor_closures(stress_run):
    """The corridor pass must produce ZERO closures: it never revisits
    (half a revolution), so any closure with a corridor endpoint would be
    a BoW alias clearing the covisible-minimum + temporal-support +
    geometric gates — a false loop."""
    slam, _ = stress_run
    for r in slam.loop_reports:
        assert _in_ring_a(r["kf"]) and _in_ring_a(r["candidate"]), r


def test_online_vocab_was_refreshed(stress_run):
    """vocab_refresh_kfs=40 over 190 KFs must have retrained the online
    vocabulary (the conf matrix stays aligned with the KF count)."""
    slam, _ = stress_run
    lc = slam.loop_closer
    assert lc is not None and lc.voc is not None
    assert lc.conf.shape[0] == len(slam.mapper.map.keyframes)
