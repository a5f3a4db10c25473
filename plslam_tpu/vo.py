"""Stereo visual odometry driver — the StereoFrameHandler equivalent.

Behavioral spec: reference ``src2/stereoFrameHandler.cpp`` — initialize
(:35), insertStereoPair (:54), updateFrame, optimizePose (:307), pose
chaining + covariance composition (:385-394), needNewKF (:1465),
currFrameIsKF (:1518).

The per-frame hot path is two jit programs: (1) stereo feature extraction
(frontend/frame.py), (2) f2f association + robust GN pose solve + the KF
statistics, all fused.  The Python layer only chains poses and carries the
tiny per-frame state (one 4x4 + 6x6 transfer per frame — the "one small
pose transfer" budget of SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .core import lie
from .core.camera import StereoCamera
from .frontend import f2f
from .frontend.frame import FrontendConfig, make_extractor
from .frontend.features import StereoFeatures
from .frontend.tracker import TrackerConfig, optimize_pose


class FrameResult(NamedTuple):
    T_f_w: jax.Array        # camera->world pose of this frame
    DT: jax.Array           # motion: prev-frame points -> curr frame
    DT_cov: jax.Array
    err: jax.Array
    n_inliers: jax.Array
    good: jax.Array
    is_kf: jax.Array
    entropy_ratio: jax.Array


class VOState(NamedTuple):
    features: StereoFeatures
    T_f_w: jax.Array
    T_f_w_cov: jax.Array
    T_prevKF: jax.Array
    cov_prevKF_accum: jax.Array
    entropy_first: jax.Array
    frames_since_kf: jax.Array
    prev_was_kf: jax.Array


@functools.partial(jax.jit, static_argnums=(5,))
def _track_and_optimize(prev_feats: StereoFeatures, curr_feats: StereoFeatures,
                        state_small, DT_init, cam: StereoCamera,
                        tcfg: TrackerConfig):
    """f2f association + pose GN + KF statistics in one program."""
    (T_f_w_prev, cov_prev, T_prevKF, cov_accum, entropy_first,
     frames_since_kf, prev_was_kf) = state_small
    pts, ls, _, _ = f2f.track_frame_to_frame(prev_feats, curr_feats)
    est, pts2, ls2 = optimize_pose(pts, ls, cam, tcfg, DT_init=DT_init)

    # pose chaining (optimizePose :385-394): DT maps prev-frame points into
    # the curr frame; frame pose composes with its inverse.
    DT_pose = lie.inv_se3(est.DT)
    T_f_w = lie.se3_chordal_project(T_f_w_prev @ DT_pose)
    T_f_w = jnp.where(est.good, T_f_w, T_f_w_prev)
    cov = lie.cov_compose(T_f_w_prev, cov_prev, est.cov)
    cov = jnp.where(est.good, cov, cov_prev)

    # needNewKF (:1465): refresh entropy_first right after a KF
    dtype = T_f_w.dtype
    _, ent_now = _entropy(est.cov)
    det_ok = jnp.isfinite(ent_now)
    entropy_first = jnp.where(
        prev_was_kf, jnp.where(det_ok, ent_now, -9.9e8), entropy_first)

    # accumulate covariance since the previous KF
    adj = lie.adjoint_se3(T_prevKF)
    cov_dt_inv = lie.cov_Tinv(DT_pose, est.cov)
    cov_accum = cov_accum + adj @ cov_dt_inv @ adj.T
    ratio, ent_cur = _entropy(cov_accum)
    entropy_ratio = ent_cur / entropy_first

    # geometric gates
    dX = lie.log_se3(lie.inv_se3(T_f_w) @ T_prevKF)
    t_dist = jnp.linalg.norm(dX[:3])
    r_dist = jnp.linalg.norm(dX[3:]) * (180.0 / jnp.pi)

    is_kf = (
        (entropy_ratio < tcfg.min_entropy_ratio)
        | ~jnp.isfinite(entropy_ratio)
        | ~est.good
        | (t_dist > tcfg.max_kf_t_dist)
        | (r_dist > tcfg.max_kf_r_dist)
        | (frames_since_kf >= 10)
    )

    res = FrameResult(T_f_w=T_f_w, DT=est.DT, DT_cov=est.cov, err=est.err,
                      n_inliers=est.n_inliers, good=est.good, is_kf=is_kf,
                      entropy_ratio=entropy_ratio)
    return res, cov, cov_accum, entropy_first


def _entropy(cov):
    from .core import linalg

    L = linalg.cholesky(cov + 1e-18 * jnp.eye(6, dtype=cov.dtype))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L))))
    ent = 3.0 * (1.0 + jnp.log(2.0 * jnp.pi)) + 0.5 * logdet
    return ent, ent


class VisualOdometry:
    """Host-side driver holding the tiny sequential state."""

    def __init__(self, cam: StereoCamera,
                 fcfg: FrontendConfig = FrontendConfig(),
                 tcfg: TrackerConfig = TrackerConfig(),
                 dtype=jnp.float32,
                 adaptative_fast: bool = True,
                 fast_min_th: float = 5.0, fast_max_th: float = 50.0,
                 fast_inc_th: float = 5.0, fast_feat_th: int = 50,
                 fast_err_th: float = 0.5,
                 use_motion_model: bool = False):
        self.cam = cam
        self.fcfg = fcfg
        self.tcfg = tcfg
        self.dtype = dtype
        self._extract = make_extractor(cam, fcfg)
        self.state: Optional[VOState] = None
        # adaptative FAST threshold protocol (updateFrame :66-86)
        self.adaptative_fast = adaptative_fast
        self.fast_th = float(fcfg.fast_th)
        self._fast_params = (fast_min_th, fast_max_th, fast_inc_th,
                             fast_feat_th, fast_err_th)
        self.use_motion_model = use_motion_model
        self._prev_DT = None

    def initialize(self, img_l, img_r) -> StereoFeatures:
        feats = self._extract(img_l, img_r)
        I = jnp.eye(4, dtype=self.dtype)
        Z = jnp.zeros((6, 6), dtype=self.dtype)
        self.state = VOState(
            features=feats, T_f_w=I, T_f_w_cov=Z, T_prevKF=I,
            cov_prevKF_accum=Z, entropy_first=jnp.asarray(-9.9e8, self.dtype),
            frames_since_kf=jnp.asarray(0, jnp.int32),
            prev_was_kf=jnp.asarray(True),
        )
        return feats

    def process(self, img_l, img_r) -> FrameResult:
        """Track one new stereo pair; updates internal state.  Call
        ``mark_keyframe()`` afterwards if the mapping layer accepted the KF
        (currFrameIsKF :1518 semantics)."""
        assert self.state is not None, "call initialize() first"
        st = self.state
        feats = self._extract(img_l, img_r, self.fast_th)
        small = (st.T_f_w, st.T_f_w_cov, st.T_prevKF, st.cov_prevKF_accum,
                 st.entropy_first, st.frames_since_kf, st.prev_was_kf)
        # constant motion model (optimizePose :318-330): warm-start from
        # the previous inter-frame motion when enabled and healthy
        if self.use_motion_model and self._prev_DT is not None:
            DT_init = self._prev_DT
        else:
            DT_init = jnp.eye(4, dtype=self.dtype)
        res, cov, cov_accum, entropy_first = _track_and_optimize(
            st.features, feats, small, DT_init, self.cam, self.tcfg)
        self._prev_DT = res.DT if bool(res.good) else None
        self.state = st._replace(
            features=feats, T_f_w=res.T_f_w, T_f_w_cov=cov,
            cov_prevKF_accum=cov_accum, entropy_first=entropy_first,
            frames_since_kf=st.frames_since_kf + 1,
            prev_was_kf=jnp.asarray(False),
        )
        if self.adaptative_fast:
            self._update_fast_th(res)
        return res

    def _update_fast_th(self, res: FrameResult):
        """Adaptative FAST threshold (stereoFrameHandler.cpp
        updateFrame :66-86): lower on weak tracking / few inliers, raise
        when features are abundant."""
        mn, mx, inc, feat_th, err_th = self._fast_params
        n = int(res.n_inliers)
        err = float(res.err)
        th = self.fast_th
        if not bool(res.good) or err > err_th:
            th = max(mn, th - 2 * inc)
        elif n < feat_th:
            th = max(mn, th - 2 * inc)
        elif n < feat_th * 2:
            th = max(mn, th - inc)
        elif n > feat_th * 4:
            th = min(mx, th + 2 * inc)
        elif n > feat_th * 3:
            th = min(mx, th + inc)
        self.fast_th = th

    def mark_keyframe(self):
        """Reset the KF statistics after the mapping layer inserts a KF."""
        st = self.state
        Z = jnp.zeros((6, 6), dtype=self.dtype)
        self.state = st._replace(
            T_prevKF=st.T_f_w, cov_prevKF_accum=Z,
            frames_since_kf=jnp.asarray(0, jnp.int32),
            prev_was_kf=jnp.asarray(True),
        )

    @property
    def current_features(self) -> StereoFeatures:
        return self.state.features

    @property
    def pose(self):
        return self.state.T_f_w
