"""Keyframe map management — the MapHandler equivalent.

Behavioral spec: reference ``src/mapHandler.cpp`` — addKeyFrame (:121),
matchKF2KFPoints (:237), matchKF2KFLines (:368, Pluecker branch :433-590
incl. the world-frame renormalization :451-459 and the chi^2 creation gate
:489-494), matchMap2KFPoints/Lines (:697-921), lookForCommonMatches (:923),
expandGraphs (:992), formLocalMap (:1005), local BA write-back + pruning
(:6154-6319), removeBadMapLandmarks (:3732), removeRedundantKFs (:3899).

Architecture: the *dynamic topology* (landmark creation/culling, growing
observation tables, covisibility counts) lives in host numpy — it is tiny,
branchy bookkeeping.  Every *numeric* step (descriptor matching, projection
gates, bundle adjustment) is a fixed-shape jitted device program.  This is
the TPU replacement for the reference's pointer-soup map + mutex protocol:
the device never sees a pointer, only padded index tables.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.camera import StereoCamera
from ..core.plucker import (
    normalize_plucker,
    plucker_to_orth,
    orth_to_plucker,
    transform_plucker,
)
from ..frontend.features import StereoFeatures
from ..ops import matching as M
from ..ops.descriptors import hamming_distance_matrix
from . import ba as ba_mod

CHI2_GATE = 5.991  # mapHandler.cpp:489, :6131


@dataclass
class MapConfig:
    max_kf: int = 128
    max_points: int = 8192
    max_lines: int = 2048
    min_lm_obs: int = 5           # slamConfig min_lm_obs
    cull_age: int = 10            # remove... :3741 "older than 10 KFs"
    min_lm_cov_graph: int = 75    # formLocalMap :1052
    min_kf_local_map: int = 3     # formLocalMap :1118
    max_kf_epip_p: float = 1.0    # matchMap2KF accept gate :778
    max_kf_epip_l: float = 1.0
    match_window: float = 40.0    # projected-grid window (f2f cells)
    nnr: float = 0.9
    use_lines: bool = True
    plucker_lines: bool = True
    min_pt_matches: int = 10      # windowed->global fallback gate :277-281
    has_refinement: bool = False  # SlamConfig::hasRefinement :937-977
    cull_kf_every: int = 0        # run removeRedundantKFs every N KFs
    max_common_fts_kf: float = 0.9  # :3899 shared-landmark ratio
    local_ba_kf: int = 16         # padded local-KF capacity for the BA
    ba_points: int = 1024         # padded BA landmark capacities
    ba_lines: int = 256
    ba_pobs: int = 4096
    ba_lobs: int = 1024


class KeyframeRecord:
    """Host-side record of one keyframe (deep copy of the frame's features,
    keyFrame.cpp:31-79)."""

    def __init__(self, kf_id: int, pose: np.ndarray, feats: StereoFeatures):
        self.id = kf_id
        self.active = True
        self.T_w_k = pose.astype(np.float64)        # camera -> world
        # ONE device_get for the whole feature pytree: fifteen separate
        # np.asarray transfers cost ~300 ms/KF in per-transfer latency on
        # the remote runtime
        f = jax.device_get(feats)
        self.pt_uv = np.asarray(f.points.uv)
        self.pt_P = np.asarray(f.points.P)
        self.pt_desc = np.asarray(f.points.desc)
        self.pt_sigma2 = np.asarray(f.points.sigma2)
        self.pt_valid = np.asarray(f.points.valid)
        self.pt_lm = np.full(len(self.pt_uv), -1, np.int64)
        self.ls_sp = np.asarray(f.lines.sp)
        self.ls_ep = np.asarray(f.lines.ep)
        self.ls_sP = np.asarray(f.lines.sP)
        self.ls_eP = np.asarray(f.lines.eP)
        self.ls_NDc = np.asarray(f.lines.NDc)
        self.ls_desc = np.asarray(f.lines.desc)
        self.ls_sigma2 = np.asarray(f.lines.sigma2)
        self.ls_valid = np.asarray(f.lines.valid)
        self.ls_lm = np.full(len(self.ls_sp), -1, np.int64)


class SlamMap:
    """Fixed-capacity landmark store + observation tables + covisibility."""

    def __init__(self, cfg: MapConfig):
        self.cfg = cfg
        self.keyframes: list[KeyframeRecord] = []
        self.covis = np.zeros((0, 0), np.int32)
        # point landmarks
        self.pt_w = np.zeros((0, 3))
        self.pt_desc = np.zeros((0, 8), np.uint32)
        self.pt_valid = np.zeros(0, bool)
        self.pt_first_kf = np.zeros(0, np.int64)
        self.pt_last_kf = np.zeros(0, np.int64)
        # observations: lists of (lm, kf, feat_idx)
        self.pt_obs: list[list[tuple]] = []
        # line landmarks (world Pluecker, normalized ||d||=1) + world
        # endpoints (the endpoint-mode state, line3D of the reference's
        # non-Pluecker branch :591-692; kept in both modes)
        self.ls_w = np.zeros((0, 6))
        self.ls_epw = np.zeros((0, 2, 3))
        self.ls_desc = np.zeros((0, 8), np.uint32)
        self.ls_valid = np.zeros(0, bool)
        self.ls_first_kf = np.zeros(0, np.int64)
        self.ls_last_kf = np.zeros(0, np.int64)
        self.ls_obs: list[list[tuple]] = []

    # -- landmark creation ------------------------------------------------

    def new_point(self, Pw, desc, kf_id, feat_idx) -> int:
        self.pt_w = np.vstack([self.pt_w, Pw[None]])
        self.pt_desc = np.vstack([self.pt_desc, desc[None]])
        self.pt_valid = np.append(self.pt_valid, True)
        self.pt_first_kf = np.append(self.pt_first_kf, kf_id)
        self.pt_last_kf = np.append(self.pt_last_kf, kf_id)
        self.pt_obs.append([(kf_id, feat_idx)])
        return len(self.pt_valid) - 1

    def new_line(self, Lw, desc, kf_id, feat_idx, ep_w=None) -> int:
        self.ls_w = np.vstack([self.ls_w, Lw[None]])
        ep = np.zeros((1, 2, 3)) if ep_w is None else np.asarray(ep_w)[None]
        self.ls_epw = np.concatenate([self.ls_epw, ep])
        self.ls_desc = np.vstack([self.ls_desc, desc[None]])
        self.ls_valid = np.append(self.ls_valid, True)
        self.ls_first_kf = np.append(self.ls_first_kf, kf_id)
        self.ls_last_kf = np.append(self.ls_last_kf, kf_id)
        self.ls_obs.append([(kf_id, feat_idx)])
        return len(self.ls_valid) - 1

    def add_point_obs(self, lm, kf_id, feat_idx):
        self.pt_obs[lm].append((kf_id, feat_idx))
        self.pt_last_kf[lm] = kf_id

    def add_line_obs(self, lm, kf_id, feat_idx):
        self.ls_obs[lm].append((kf_id, feat_idx))
        self.ls_last_kf[lm] = kf_id

    # -- covisibility -----------------------------------------------------

    def expand_graphs(self):
        """Grow covis to (K+1)^2 (expandGraphs :992)."""
        k = len(self.keyframes)
        g = np.zeros((k, k), np.int32)
        g[: self.covis.shape[0], : self.covis.shape[1]] = self.covis
        self.covis = g

    def local_kf_set(self) -> np.ndarray:
        """formLocalMap (:1005): KFs covisible with the newest (covis >=
        min_lm_cov_graph) or within the last min_kf_local_map KFs."""
        k = len(self.keyframes)
        newest = k - 1
        local = np.zeros(k, bool)
        local[max(0, k - self.cfg.min_kf_local_map):] = True
        if k > 1:
            local |= self.covis[newest] >= self.cfg.min_lm_cov_graph
        active = np.asarray([kf.active for kf in self.keyframes])
        return local & active


# ---------------------------------------------------------------------------
# Device-side helpers (jitted once per shape)
# ---------------------------------------------------------------------------


import functools


def _np_transform_plucker(T: np.ndarray, L: np.ndarray) -> np.ndarray:
    """Host-side Pluecker transform (matches core.plucker.transform_plucker:
    n' = R n + t x (R d); d' = R d).  The map-maintenance loops run this
    per landmark; an eager device op per call (~0.4 s/op on the axon
    tunnel, verify SKILL.md) made mapping dispatch-bound."""
    R, t = T[:3, :3], T[:3, 3]
    n = L[..., :3] @ R.T
    d = L[..., 3:] @ R.T
    return np.concatenate([n + np.cross(t, d), d], axis=-1)


def _np_normalize_plucker(L: np.ndarray) -> np.ndarray:
    dn = np.linalg.norm(L[..., 3:], axis=-1, keepdims=True)
    return L / np.where(dn > 1e-12, dn, 1.0)


_orth_batch = jax.jit(jax.vmap(plucker_to_orth))
_plucker_from_orth_batch = jax.jit(jax.vmap(orth_to_plucker))


def _pad_bucket(n: int, lo: int = 256) -> int:
    """Round a dynamic candidate count up to a power-of-two bucket so the
    jitted matchers compile O(log N) distinct shapes instead of one fresh
    program per keyframe (remote compiles cost seconds on this runtime)."""
    b = lo
    while b < n:
        b *= 2
    return b


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if len(a) >= n:
        return a[:n]
    pad = np.zeros((n - len(a),) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad])


def _np_hamming(descs: np.ndarray) -> np.ndarray:
    """Tiny all-pairs Hamming in numpy (per-landmark descriptor election
    runs on a handful of observations; device dispatch would dominate)."""
    bits = np.unpackbits(descs.view(np.uint8), axis=-1)
    return (bits[:, None, :] != bits[None, :, :]).sum(-1)


class MapHandler:
    """Host orchestrator of keyframe insertion and local BA."""

    def __init__(self, cam: StereoCamera, cfg: MapConfig = MapConfig(),
                 ba_cfg: Optional[ba_mod.BAConfig] = None,
                 tracker_cfg=None):
        self.cam = cam
        self.cfg = cfg
        self.ba_cfg = ba_cfg or ba_mod.BAConfig()
        self.tracker_cfg = tracker_cfg  # for hasRefinement; None = defaults
        self.map = SlamMap(cfg)
        self._ba_jit = jax.jit(ba_mod.bundle_adjust, static_argnums=2)
        self._refine_jit = None  # built lazily (has_refinement only)

        # Fused association programs: each remote dispatch/fetch costs
        # ~10-30 ms here, so KF2KF and Map2KF run as ONE program + ONE
        # device_get each instead of per-modality chains.
        cam_, win_, nnr_ = self.cam, self.cfg.match_window, self.cfg.nnr
        use_lines_ = self.cfg.use_lines

        def _kf2kf_prog(T_rel, pP, pdesc, pvalid, kdesc, kuv, kvalid,
                        pls_desc, pls_mid, pls_valid,
                        kls_desc, kls_mid, kls_valid):
            Pc = lie.transform_point(T_rel, pP)
            proj = cam_.project(Pc)
            ok_prev = pvalid & (Pc[..., 2] > 0)
            mask_w = M.window_pair_mask(proj, kuv, ok_prev, kvalid,
                                        win_, win_)
            m_w = M.match_descriptors(pdesc, kdesc, mask_w, nnr_)
            # global fallback candidates computed in the same pass
            mask_g = ok_prev[:, None] & kvalid[None, :]
            m_g = M.match_descriptors(pdesc, kdesc, mask_g, nnr_)
            if not use_lines_:  # static: line work dropped at trace time
                return m_w.idx, m_g.idx, None
            lmask = M.window_pair_mask(pls_mid, kls_mid, pls_valid,
                                       kls_valid, win_ * 2.0, win_ * 2.0)
            m_l = M.match_descriptors(pls_desc, kls_desc, lmask, nnr_)
            return m_w.idx, m_g.idx, m_l.idx

        self._kf2kf_prog = jax.jit(_kf2kf_prog)

        def _map2kf_prog(T_c_w, candP, cand_desc, cand_valid,
                         kdesc, kuv, kfree, candL, lcand_desc, kls_desc):
            Pc = lie.transform_point(T_c_w, candP)
            proj = cam_.project(Pc)
            inside = (cand_valid & (Pc[..., 2] > 0)
                      & (proj[..., 0] >= 0) & (proj[..., 0] < cam_.width)
                      & (proj[..., 1] >= 0) & (proj[..., 1] < cam_.height))
            mask = M.window_pair_mask(proj, kuv, inside, kfree, win_, win_)
            m = M.match_descriptors(cand_desc, kdesc, mask, nnr_)
            if not use_lines_:
                return m.idx, proj, None, None
            Lc = transform_plucker(T_c_w, candL)
            l_img = jnp.einsum("ij,nj->ni", cam_.plucker_K, Lc[..., :3])
            dists = hamming_distance_matrix(lcand_desc, kls_desc)
            return m.idx, proj, l_img, dists

        self._map2kf_prog = jax.jit(_map2kf_prog)

    # -- public API (mapHandler.cpp initialize :50 / addKeyFrame :121) ----

    def initialize(self, pose: np.ndarray, feats: StereoFeatures):
        kf = KeyframeRecord(0, pose, feats)
        self.map.keyframes.append(kf)
        self.map.expand_graphs()
        # every stereo feature of KF0 seeds a landmark (reference behavior:
        # initial KF features become the initial map)
        self._spawn_landmarks(kf)

    def add_keyframe(self, pose: np.ndarray, feats: StereoFeatures,
                     run_ba: bool = True):
        kf = KeyframeRecord(len(self.map.keyframes), pose, feats)
        self.map.keyframes.append(kf)
        self.map.expand_graphs()
        self._match_kf2kf(kf)
        if self.cfg.has_refinement:
            self._refine_kf_pose(kf)
        self._match_map2kf(kf)
        self._spawn_landmarks(kf)  # leftovers become new landmarks
        if run_ba:
            self.local_bundle_adjustment()
        self.cull_landmarks()
        if (self.cfg.cull_kf_every > 0
                and kf.id % self.cfg.cull_kf_every == 0):
            self.cull_redundant_keyframes(self.cfg.max_common_fts_kf)
        return kf

    # -- association ------------------------------------------------------

    def _match_kf2kf(self, kf: KeyframeRecord):
        """Project the previous KF's features into the new KF and match
        (matchKF2KFPoints :237 / Lines :368)."""
        prev = self.map.keyframes[-2]
        T_c_w_new = np.linalg.inv(kf.T_w_k)
        T_rel = T_c_w_new @ prev.T_w_k  # prev-cam -> new-cam

        # one device program + one fetch for both modalities
        idx_w, idx_g, idx_l = jax.device_get(self._kf2kf_prog(
            jnp.asarray(T_rel, jnp.float32), jnp.asarray(prev.pt_P),
            jnp.asarray(prev.pt_desc), jnp.asarray(prev.pt_valid),
            jnp.asarray(kf.pt_desc), jnp.asarray(kf.pt_uv),
            jnp.asarray(kf.pt_valid),
            jnp.asarray(prev.ls_desc),
            jnp.asarray(0.5 * (prev.ls_sp + prev.ls_ep)),
            jnp.asarray(prev.ls_valid),
            jnp.asarray(kf.ls_desc),
            jnp.asarray(0.5 * (kf.ls_sp + kf.ls_ep)),
            jnp.asarray(kf.ls_valid)))
        # windowed -> global fallback when too few matches (:277-281)
        idx = idx_w if (idx_w >= 0).sum() >= self.cfg.min_pt_matches else idx_g
        shared = 0
        for i1, i2 in enumerate(idx):
            if i2 < 0:
                continue
            lm = prev.pt_lm[i1]
            if lm < 0:
                # create a landmark from the prev-KF stereo triangulation
                Pw = prev.T_w_k[:3, :3] @ prev.pt_P[i1] + prev.T_w_k[:3, 3]
                # chi^2 creation gate: reprojection into the NEW kf
                if not self._point_chi2_ok(Pw, kf, i2):
                    continue
                lm = self.map.new_point(Pw, prev.pt_desc[i1], prev.id, i1)
                prev.pt_lm[i1] = lm
            self.map.add_point_obs(lm, kf.id, i2)
            kf.pt_lm[i2] = lm
            shared += 1
        self._bump_covis(kf, shared)

        if not self.cfg.use_lines:
            return
        # lines (matched in the same fused program above)
        idx = idx_l
        shared_l = 0
        for i1, i2 in enumerate(idx):
            if i2 < 0:
                continue
            lm = prev.ls_lm[i1]
            if lm < 0:
                # lift the prev-KF camera-frame Pluecker line to world and
                # renormalize ||d||=1 (mapHandler.cpp:451-459)
                Lw = _np_normalize_plucker(
                    _np_transform_plucker(prev.T_w_k, prev.ls_NDc[i1]))
                if not self._line_chi2_ok(Lw, kf, i2):
                    continue
                R, t = prev.T_w_k[:3, :3], prev.T_w_k[:3, 3]
                ep_w = np.stack([R @ prev.ls_sP[i1] + t,
                                 R @ prev.ls_eP[i1] + t])
                lm = self.map.new_line(Lw, prev.ls_desc[i1], prev.id, i1,
                                       ep_w=ep_w)
                prev.ls_lm[i1] = lm
            self.map.add_line_obs(lm, kf.id, i2)
            kf.ls_lm[i2] = lm
            shared_l += 1
        self._bump_covis(kf, shared_l)

    def _refine_kf_pose(self, kf: KeyframeRecord):
        """hasRefinement (:937-977): re-run the StVO robust pose optimizer
        on the KF pair and overwrite the new KF's pose with the result."""
        from ..frontend.features import TrackedLines, TrackedPoints
        from ..frontend.tracker import TrackerConfig, optimize_pose

        prev = self.map.keyframes[-2]
        if self._refine_jit is None:
            tcfg = self.tracker_cfg or TrackerConfig()
            tcfg = tcfg._replace(plucker_lines=self.cfg.plucker_lines,
                                 use_lines=self.cfg.use_lines)
            self._refine_jit = jax.jit(
                lambda p, l, cam: optimize_pose(p, l, cam, tcfg))

        # correspondences: the landmark links just made by _match_kf2kf
        # (prev feature i1 and kf feature i2 share kf.pt_lm/ls_lm)
        n = len(prev.pt_valid)
        obs = np.zeros((n, 2), np.float32)
        val = np.zeros(n, bool)
        lm_to_new = {lm: i2 for i2, lm in enumerate(kf.pt_lm) if lm >= 0}
        for i1 in range(n):
            lm = prev.pt_lm[i1]
            if lm >= 0 and lm in lm_to_new:
                obs[i1] = kf.pt_uv[lm_to_new[lm]]
                val[i1] = True
        pts = TrackedPoints(
            P=jnp.asarray(prev.pt_P), obs=jnp.asarray(obs),
            sigma2=jnp.asarray(prev.pt_sigma2),
            valid=jnp.asarray(val), inlier=jnp.asarray(val))

        nl = len(prev.ls_valid)
        sobs = np.zeros((nl, 2), np.float32)
        eobs = np.zeros((nl, 2), np.float32)
        le = np.zeros((nl, 3), np.float32)
        lval = np.zeros(nl, bool)
        lm_to_new_l = {lm: i2 for i2, lm in enumerate(kf.ls_lm) if lm >= 0}
        for i1 in range(nl):
            lm = prev.ls_lm[i1]
            if lm >= 0 and lm in lm_to_new_l:
                i2 = lm_to_new_l[lm]
                sp, ep = kf.ls_sp[i2], kf.ls_ep[i2]
                lo = np.cross(np.append(sp, 1.0), np.append(ep, 1.0))
                nrm = np.hypot(lo[0], lo[1])
                if nrm < 1e-9:
                    continue
                sobs[i1], eobs[i1], le[i1] = sp, ep, lo / nrm
                lval[i1] = True
        ls = TrackedLines(
            sP=jnp.asarray(prev.ls_sP), eP=jnp.asarray(prev.ls_eP),
            sp=jnp.asarray(prev.ls_sp), ep=jnp.asarray(prev.ls_ep),
            NDc=jnp.asarray(prev.ls_NDc), sobs=jnp.asarray(sobs),
            eobs=jnp.asarray(eobs), le_obs=jnp.asarray(le),
            sigma2=jnp.asarray(prev.ls_sigma2),
            valid=jnp.asarray(lval), inlier=jnp.asarray(lval))

        est, _, _ = self._refine_jit(pts, ls, self.cam)
        if bool(est.good):
            DT = np.asarray(est.DT, np.float64)  # new-cam <- prev-cam
            kf.T_w_k = prev.T_w_k @ np.linalg.inv(DT)

    def _match_map2kf(self, kf: KeyframeRecord):
        """Track local-map landmarks not yet matched into the new KF
        (matchMap2KFPoints :697 / Lines :799)."""
        local_kf = self.map.local_kf_set()
        mp = self.map
        T_c_w = np.linalg.inv(kf.T_w_k)
        # candidate landmarks: local, valid, not already observed in kf
        already = set(kf.pt_lm[kf.pt_lm >= 0].tolist())
        cand = [i for i in range(len(mp.pt_valid))
                if mp.pt_valid[i] and i not in already
                and any(local_kf[k] for k, _ in mp.pt_obs[i])]
        use_lines = self.cfg.use_lines
        already_l = set(kf.ls_lm[kf.ls_lm >= 0].tolist()) if use_lines else set()
        cand_l = ([i for i in range(len(mp.ls_valid))
                   if mp.ls_valid[i] and i not in already_l
                   and any(local_kf[k] for k, _ in mp.ls_obs[i])]
                  if use_lines else [])
        if not cand and not cand_l:
            return

        # one fused program + one fetch for both modalities
        nb = _pad_bucket(len(cand))
        nbl = _pad_bucket(len(cand_l), lo=64)
        cvalid = np.arange(nb) < len(cand)
        free = kf.pt_valid & (kf.pt_lm < 0)
        idx, proj, l_img, dist_mat = jax.device_get(self._map2kf_prog(
            jnp.asarray(T_c_w, jnp.float32),
            jnp.asarray(_pad_rows(mp.pt_w[cand], nb)
                        if cand else np.zeros((nb, 3))),
            jnp.asarray(_pad_rows(mp.pt_desc[cand], nb)
                        if cand else np.zeros((nb, 8), np.uint32)),
            jnp.asarray(cvalid),
            jnp.asarray(kf.pt_desc), jnp.asarray(kf.pt_uv),
            jnp.asarray(free),
            jnp.asarray(_pad_rows(mp.ls_w[cand_l], nbl)
                        if cand_l else np.zeros((nbl, 6))),
            jnp.asarray(_pad_rows(mp.ls_desc[cand_l], nbl)
                        if cand_l else np.zeros((nbl, 8), np.uint32)),
            jnp.asarray(kf.ls_desc)))
        if cand:
            shared = 0
            for ci, i2 in enumerate(idx[: len(cand)]):
                if i2 < 0:
                    continue
                # epipolar-style gate: projected distance (:778)
                if np.linalg.norm(proj[ci] - kf.pt_uv[i2]) > self.cfg.match_window:
                    continue
                lm = cand[ci]
                self.map.add_point_obs(lm, kf.id, i2)
                kf.pt_lm[i2] = lm
                shared += 1
            self._bump_covis(kf, shared)

        if cand_l:
            l_img = l_img[: len(cand_l)]
            dist_mat = dist_mat[: len(cand_l)]
            cand = cand_l
            free = kf.ls_valid & (kf.ls_lm < 0)
            for ci in range(len(cand)):
                ln = l_img[ci]
                nrm = np.hypot(ln[0], ln[1])
                if nrm < 1e-9:
                    continue
                d_s = np.abs(ln[0] * kf.ls_sp[:, 0] + ln[1] * kf.ls_sp[:, 1] + ln[2]) / nrm
                d_e = np.abs(ln[0] * kf.ls_ep[:, 0] + ln[1] * kf.ls_ep[:, 1] + ln[2]) / nrm
                gate = free & (d_s < self.cfg.match_window) & (d_e < self.cfg.match_window)
                if not gate.any():
                    continue
                dists = np.where(gate, dist_mat[ci], 1 << 20)
                i2 = int(dists.argmin())
                if dists[i2] >= (1 << 20):
                    continue
                if max(d_s[i2], d_e[i2]) > self.cfg.max_kf_epip_l * 20:
                    continue
                self.map.add_line_obs(cand[ci], kf.id, i2)
                kf.ls_lm[i2] = cand[ci]
                free[i2] = False  # a feature feeds at most one landmark

    def _spawn_landmarks(self, kf: KeyframeRecord):
        """Unmatched stereo features of the newest KF seed new landmarks."""
        for i in range(len(kf.pt_valid)):
            if kf.pt_valid[i] and kf.pt_lm[i] < 0:
                Pw = kf.T_w_k[:3, :3] @ kf.pt_P[i] + kf.T_w_k[:3, 3]
                kf.pt_lm[i] = self.map.new_point(Pw, kf.pt_desc[i], kf.id, i)
        if self.cfg.use_lines:
            for i in range(len(kf.ls_valid)):
                if kf.ls_valid[i] and kf.ls_lm[i] < 0:
                    Lw = _np_normalize_plucker(
                        _np_transform_plucker(kf.T_w_k, kf.ls_NDc[i]))
                    R, t = kf.T_w_k[:3, :3], kf.T_w_k[:3, 3]
                    ep_w = np.stack([R @ kf.ls_sP[i] + t,
                                     R @ kf.ls_eP[i] + t])
                    kf.ls_lm[i] = self.map.new_line(Lw, kf.ls_desc[i],
                                                    kf.id, i, ep_w=ep_w)

    def _bump_covis(self, kf: KeyframeRecord, shared: int):
        if len(self.map.keyframes) >= 2 and shared:
            self.map.covis[kf.id, kf.id - 1] += shared
            self.map.covis[kf.id - 1, kf.id] += shared

    def _point_chi2_ok(self, Pw, kf: KeyframeRecord, feat_idx) -> bool:
        """Reprojection chi^2 creation gate (mapHandler.cpp:489-494)."""
        T_c_w = np.linalg.inv(kf.T_w_k)
        Pc = T_c_w[:3, :3] @ Pw + T_c_w[:3, 3]
        if Pc[2] <= 0:
            return False
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        u = cx + fx * Pc[0] / Pc[2]
        v = cy + fy * Pc[1] / Pc[2]
        err = np.array([u, v]) - kf.pt_uv[feat_idx]
        return float(err @ err) <= CHI2_GATE * 4.0

    def _line_chi2_ok(self, Lw, kf: KeyframeRecord, feat_idx) -> bool:
        T_c_w = np.linalg.inv(kf.T_w_k)
        Lc = _np_transform_plucker(T_c_w, np.asarray(Lw))
        K_L = np.asarray(self.cam.plucker_K)
        l = K_L @ Lc[:3]
        nrm = np.hypot(l[0], l[1])
        if nrm < 1e-9:
            return False
        sp, ep = kf.ls_sp[feat_idx], kf.ls_ep[feat_idx]
        e0 = (l[0] * sp[0] + l[1] * sp[1] + l[2]) / nrm
        e1 = (l[0] * ep[0] + l[1] * ep[1] + l[2]) / nrm
        return e0 * e0 + e1 * e1 <= CHI2_GATE * 4.0

    # -- bundle adjustment -------------------------------------------------

    def build_local_ba(self):
        """Assemble the padded BAProblem over the local map (the array-ized
        localBundleAdjustmentForPlukerWithG2O graph build :5870-6049)."""
        cfg = self.cfg
        mp = self.map
        local = mp.local_kf_set()
        K = cfg.local_ba_kf
        kf_ids = [k.id for k in mp.keyframes]
        # local KFs last; fixed set = non-local observers + KF0
        local_ids = [i for i in kf_ids if local[i]][-K:]
        slot_of = {kf: s for s, kf in enumerate(local_ids)}

        # landmarks observed by local KFs
        pt_ids = [i for i in range(len(mp.pt_valid)) if mp.pt_valid[i]
                  and sum(1 for k, _ in mp.pt_obs[i] if k in slot_of) >= 2]
        ls_ids = [i for i in range(len(mp.ls_valid)) if mp.ls_valid[i]
                  and sum(1 for k, _ in mp.ls_obs[i] if k in slot_of) >= 2]
        pt_ids = pt_ids[: cfg.ba_points]
        ls_ids = ls_ids[: cfg.ba_lines]
        if not cfg.plucker_lines:
            # endpoint mode: each line takes two 3-DoF slots of the point
            # table (levMarquardtOptimizationLBA :1429-1445 layout)
            room = (cfg.ba_points - len(pt_ids)) // 2
            ls_ids = ls_ids[: max(room, 0)]
        pslot = {p: s for s, p in enumerate(pt_ids)}
        lslot = {p: s for s, p in enumerate(ls_ids)}

        dtype = np.float32
        T = np.tile(np.eye(4, dtype=dtype), (K, 1, 1))
        pose_valid = np.zeros(K, bool)
        pose_fixed = np.zeros(K, bool)
        for kfid, s in slot_of.items():
            T[s] = np.linalg.inv(mp.keyframes[kfid].T_w_k)
            pose_valid[s] = True
            # gauge: fix the oldest local KF (and KF0 whenever present)
            pose_fixed[s] = kfid == local_ids[0] or kfid == 0

        points = np.zeros((cfg.ba_points, 3), dtype)
        point_valid = np.zeros(cfg.ba_points, bool)
        for p, s in pslot.items():
            points[s] = mp.pt_w[p]
            point_valid[s] = True

        lines_orth = np.zeros((cfg.ba_lines, 4), dtype)
        lines_scale = np.ones(cfg.ba_lines, dtype)
        line_valid = np.zeros(cfg.ba_lines, bool)
        ep_base = len(pt_ids)  # first endpoint slot in the point table
        if cfg.plucker_lines and ls_ids:
            # one batched device call for ALL orth conversions (a per-line
            # eager op would be dispatch-bound on the remote TPU)
            Lws = mp.ls_w[ls_ids]
            scales = np.linalg.norm(Lws, axis=-1)
            orths = np.asarray(_orth_batch(
                jnp.asarray(Lws / scales[:, None])))
            for p, s in lslot.items():
                lines_scale[s] = scales[s]
                lines_orth[s] = orths[s]
                line_valid[s] = True
        else:
            for p, s in lslot.items():
                points[ep_base + 2 * s] = mp.ls_epw[p, 0]
                points[ep_base + 2 * s + 1] = mp.ls_epw[p, 1]
                point_valid[ep_base + 2 * s] = True
                point_valid[ep_base + 2 * s + 1] = True

        p_cam = np.zeros(cfg.ba_pobs, np.int32)
        p_lm = np.zeros(cfg.ba_pobs, np.int32)
        p_uv = np.zeros((cfg.ba_pobs, 2), dtype)
        p_sig = np.ones(cfg.ba_pobs, dtype)
        p_val = np.zeros(cfg.ba_pobs, bool)
        n = 0
        obs_refs_p = []
        for p, s in pslot.items():
            for kfid, fi in mp.pt_obs[p]:
                if kfid not in slot_of or n >= cfg.ba_pobs:
                    continue
                rec = mp.keyframes[kfid]
                p_cam[n] = slot_of[kfid]
                p_lm[n] = s
                p_uv[n] = rec.pt_uv[fi]
                p_sig[n] = rec.pt_sigma2[fi]
                p_val[n] = True
                obs_refs_p.append((p, kfid, fi))
                n += 1

        l_cam = np.zeros(cfg.ba_lobs, np.int32)
        l_lm = np.zeros(cfg.ba_lobs, np.int32)
        l_sobs = np.zeros((cfg.ba_lobs, 2), dtype)
        l_eobs = np.zeros((cfg.ba_lobs, 2), dtype)
        l_sig = np.ones(cfg.ba_lobs, dtype)
        l_val = np.zeros(cfg.ba_lobs, bool)
        nl = 0
        obs_refs_l = []
        p_lo = None
        p_is_line = None
        if cfg.plucker_lines:
            for p, s in lslot.items():
                for kfid, fi in mp.ls_obs[p]:
                    if kfid not in slot_of or nl >= cfg.ba_lobs:
                        continue
                    rec = mp.keyframes[kfid]
                    l_cam[nl] = slot_of[kfid]
                    l_lm[nl] = s
                    l_sobs[nl] = rec.ls_sp[fi]
                    l_eobs[nl] = rec.ls_ep[fi]
                    l_sig[nl] = rec.ls_sigma2[fi]
                    l_val[nl] = True
                    obs_refs_l.append((p, kfid, fi))
                    nl += 1
        else:
            # endpoint mode: each line obs yields two rows of the point
            # table — projected endpoint to observed image line
            p_lo = np.zeros((cfg.ba_pobs, 3), dtype)
            p_is_line = np.zeros(cfg.ba_pobs, bool)
            for p, s in lslot.items():
                for kfid, fi in mp.ls_obs[p]:
                    if kfid not in slot_of or n + 1 >= cfg.ba_pobs:
                        continue
                    rec = mp.keyframes[kfid]
                    sp, ep = rec.ls_sp[fi], rec.ls_ep[fi]
                    lo = np.cross(np.append(sp, 1.0), np.append(ep, 1.0))
                    nrm = np.hypot(lo[0], lo[1])
                    if nrm < 1e-9:
                        continue
                    lo = lo / nrm
                    for eslot in (ep_base + 2 * s, ep_base + 2 * s + 1):
                        p_cam[n] = slot_of[kfid]
                        p_lm[n] = eslot
                        p_lo[n] = lo
                        p_is_line[n] = True
                        p_sig[n] = rec.ls_sigma2[fi]
                        p_val[n] = True
                        n += 1
                    obs_refs_l.append((p, kfid, fi, n - 2))

        prob = ba_mod.BAProblem(
            T_c_w=jnp.asarray(T), pose_fixed=jnp.asarray(pose_fixed),
            pose_valid=jnp.asarray(pose_valid),
            points=jnp.asarray(points), point_valid=jnp.asarray(point_valid),
            lines_orth=jnp.asarray(lines_orth),
            lines_scale=jnp.asarray(lines_scale),
            line_valid=jnp.asarray(line_valid),
            p_cam=jnp.asarray(p_cam), p_lm=jnp.asarray(p_lm),
            p_uv=jnp.asarray(p_uv), p_sigma2=jnp.asarray(p_sig),
            p_valid=jnp.asarray(p_val),
            l_cam=jnp.asarray(l_cam), l_lm=jnp.asarray(l_lm),
            l_sobs=jnp.asarray(l_sobs), l_eobs=jnp.asarray(l_eobs),
            l_sigma2=jnp.asarray(l_sig), l_valid=jnp.asarray(l_val),
            p_lo=None if p_lo is None else jnp.asarray(p_lo),
            p_is_line=None if p_is_line is None else jnp.asarray(p_is_line),
        )
        meta = dict(local_ids=local_ids, pt_ids=pt_ids, ls_ids=ls_ids,
                    obs_refs_p=obs_refs_p, obs_refs_l=obs_refs_l,
                    plucker=cfg.plucker_lines, ep_base=ep_base)
        return prob, meta

    def local_bundle_adjustment(self):
        """Run the two-round chi^2-gated BA and write back
        (:6119-6319)."""
        if len(self.map.keyframes) < 2:
            return None
        prob, meta = self.build_local_ba()
        res = self._ba_jit(prob, self.cam, self.ba_cfg)
        self._write_back(res, meta)
        return res

    def _write_back(self, res: ba_mod.BAResult, meta):
        mp = self.map
        # fetch only the leaves write-back consumes, in one transfer
        (T_c_w, points, orth, scale, p_active, l_active) = jax.device_get(
            (res.problem.T_c_w, res.problem.points, res.problem.lines_orth,
             res.problem.lines_scale, res.p_active, res.l_active))
        for s, kfid in enumerate(meta["local_ids"]):
            mp.keyframes[kfid].T_w_k = np.linalg.inv(
                np.asarray(T_c_w[s], np.float64))
        points = np.asarray(points)
        for s, p in enumerate(meta["pt_ids"]):
            mp.pt_w[p] = points[s]
        if meta.get("plucker", True):
            if meta["ls_ids"]:
                nls = len(meta["ls_ids"])
                Lws = np.asarray(_plucker_from_orth_batch(
                    jnp.asarray(orth[:nls]))) * scale[:nls, None]
                Lws = _np_normalize_plucker(Lws)
                for s, p in enumerate(meta["ls_ids"]):
                    mp.ls_w[p] = Lws[s]
        else:
            # endpoint mode: optimized endpoints come back through the
            # point table; refresh the Pluecker form (n = sP x eP,
            # d = eP - sP, renormalized ||d||=1) for projection-based
            # matching
            ep_base = meta["ep_base"]
            for s, p in enumerate(meta["ls_ids"]):
                sP = np.asarray(points[ep_base + 2 * s], np.float64)
                eP = np.asarray(points[ep_base + 2 * s + 1], np.float64)
                mp.ls_epw[p] = np.stack([sP, eP])
                d = eP - sP
                nd = np.linalg.norm(d)
                if np.isfinite(nd) and nd > 1e-9:
                    mp.ls_w[p] = np.concatenate([np.cross(sP, eP) / nd,
                                                 d / nd])
        # prune gated-out observations (:6154-6293)
        p_active = np.asarray(p_active)
        for n, (p, kfid, fi) in enumerate(meta["obs_refs_p"]):
            if not p_active[n]:
                try:
                    mp.pt_obs[p].remove((kfid, fi))
                    mp.keyframes[kfid].pt_lm[fi] = -1
                except ValueError:
                    pass
        l_active = np.asarray(l_active)
        for n, ref in enumerate(meta["obs_refs_l"]):
            if meta.get("plucker", True):
                p, kfid, fi = ref
                bad = not l_active[n]
            else:
                p, kfid, fi, row = ref
                bad = not (p_active[row] and p_active[row + 1])
            if bad:
                try:
                    mp.ls_obs[p].remove((kfid, fi))
                    mp.keyframes[kfid].ls_lm[fi] = -1
                except ValueError:
                    pass

    # -- culling -----------------------------------------------------------

    def cull_landmarks(self):
        """removeBadMapLandmarks (:3732): kill non-local landmarks older
        than cull_age KFs with fewer than min_lm_obs observations."""
        mp = self.map
        newest = len(mp.keyframes) - 1
        for i in range(len(mp.pt_valid)):
            if (mp.pt_valid[i]
                    and newest - mp.pt_last_kf[i] > self.cfg.cull_age
                    and len(mp.pt_obs[i]) < self.cfg.min_lm_obs):
                mp.pt_valid[i] = False
        for i in range(len(mp.ls_valid)):
            if (mp.ls_valid[i]
                    and newest - mp.ls_last_kf[i] > self.cfg.cull_age
                    and len(mp.ls_obs[i]) < self.cfg.min_lm_obs):
                mp.ls_valid[i] = False

    def refresh_landmark_descriptors(self):
        """Median-descriptor election (mapFeatures.cpp
        updateAverageDescDir :52-140): each landmark's representative
        descriptor becomes the observation descriptor with minimal summed
        Hamming distance to the others.  Batched on device per landmark."""
        mp = self.map
        for lm in range(len(mp.pt_valid)):
            obs = mp.pt_obs[lm]
            if not mp.pt_valid[lm] or len(obs) < 3:
                continue
            descs = np.stack([self.map.keyframes[k].pt_desc[fi]
                              for k, fi in obs])
            D = _np_hamming(descs)
            mp.pt_desc[lm] = descs[int(D.sum(1).argmin())]
        for lm in range(len(mp.ls_valid)):
            obs = mp.ls_obs[lm]
            if not mp.ls_valid[lm] or len(obs) < 3:
                continue
            descs = np.stack([self.map.keyframes[k].ls_desc[fi]
                              for k, fi in obs])
            D = _np_hamming(descs)
            mp.ls_desc[lm] = descs[int(D.sum(1).argmin())]

    def cull_redundant_keyframes(self, max_common: float = 0.9):
        """removeRedundantKFs (:3899-4047): deactivate keyframes whose
        tracked landmarks are >= max_common shared with other keyframes;
        their observations are dropped from the landmark tables (keyframe
        poses stay, flagged inactive, excluded from local maps and BA).
        KF0 and the two newest KFs are never culled."""
        mp = self.map
        k = len(mp.keyframes)
        removed = []
        for kf in mp.keyframes[1:max(1, k - 2)]:
            if not kf.active:
                continue
            lm_ids = [lm for lm in kf.pt_lm if lm >= 0 and mp.pt_valid[lm]]
            if len(lm_ids) < 10:
                continue
            shared = sum(
                1 for lm in lm_ids
                if sum(1 for kfi, _ in mp.pt_obs[lm]
                       if kfi != kf.id and mp.keyframes[kfi].active) >= 2)
            if shared / len(lm_ids) >= max_common:
                kf.active = False
                removed.append(kf.id)
                for lm in range(len(mp.pt_valid)):
                    mp.pt_obs[lm] = [(kfi, fi) for kfi, fi in mp.pt_obs[lm]
                                     if kfi != kf.id]
                for lm in range(len(mp.ls_valid)):
                    mp.ls_obs[lm] = [(kfi, fi) for kfi, fi in mp.ls_obs[lm]
                                     if kfi != kf.id]
                mp.covis[kf.id, :] = 0
                mp.covis[:, kf.id] = 0
        return removed

    # -- trajectory export -------------------------------------------------

    def keyframe_trajectory(self, include_inactive: bool = True):
        return [kf.T_w_k for kf in self.map.keyframes
                if include_inactive or kf.active]
