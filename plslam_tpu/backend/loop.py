"""Loop closing: BoW retrieval, relative-pose verification, pose-graph
correction, landmark fusion.

Behavioral spec: reference ``src/mapHandler.cpp`` — insertKFBowVectorP/L/PL
(:4118-4239, conf_matrix rows), lookForLoopCandidates (:4241-4301),
isLoopClosure (:4303-4411), computeRelativePoseRobustGN (:4677-5068) with
its acceptance gates (:4988-5023), loopClosureOptimizationCovGraphG2O
(:5301-5531), loopClosureFuseLandmarks (:5533-5807).

Used only in the endpoint-line baseline configuration: the Pluecker mode
keeps loop closing disabled (README.md:12; enforced in pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.camera import StereoCamera
from ..frontend.features import TrackedLines, TrackedPoints
from ..frontend import tracker as trk
from ..ops import matching as M
from ..ops.descriptors import hamming_distance_matrix
from . import pgo as pgo_mod
from . import vocab as vocab_mod
from .mapping import KeyframeRecord, MapHandler


@dataclass
class LoopConfig:
    lc_kf_dist: int = 50        # min KFs back for a candidate (:4260)
    lc_nkf_closest: int = 4     # temporally-near support count (:4297)
    lc_support_ratio: float = 0.8
    lc_res: float = 1.0         # max residual of the relative pose (lc_res)
    lc_unc: float = 0.01        # max covariance eigenvalue bound (lc_unc)
    lc_trs: float = 1.5         # max translation (lc_trs)
    lc_rot: float = 35.0        # max rotation degrees (lc_rot)
    min_pt_matches: int = 12
    vocab_k: int = 8
    vocab_depth: int = 3
    vocabulary_file: str = ""   # pre-trained DBoW2 yml(.gz); "" = online
    vocabulary_file_l: str = "" # line-descriptor vocabulary (dbow_voc_l)
    use_line_bow: bool = True   # combined P+L scoring (insertKFBowVectorPL)
    pgo_graph: str = "covisibility"  # or "essential" (:5070 vs :5301)
    min_lm_ess_graph: int = 150      # essential-graph edge threshold
    pgo_iters: int = 15
    fuse_dist: float = 0.1      # max_point_point_error


class LoopCloser:
    """Host orchestrator; BoW scoring, matching, GN, and PGO run on device."""

    def __init__(self, cam: StereoCamera, mapper: MapHandler,
                 cfg: LoopConfig = LoopConfig()):
        self.cam = cam
        self.mapper = mapper
        self.cfg = cfg
        self.voc: vocab_mod.Vocabulary | None = None
        self.voc_l: vocab_mod.Vocabulary | None = None
        self.bow: list[dict] = []             # per-KF BoW records
        self.conf: np.ndarray = np.zeros((0, 0), np.float32)
        self.closed_at: int = -10 ** 9
        self._tf = None
        self._tf_l = None

    # -- BoW bookkeeping ---------------------------------------------------

    def _ensure_vocab(self):
        """Load a pre-trained DBoW2 vocabulary when configured
        (mapHandler.cpp:41-44, SlamConfig vocabulary_p), else train online
        from accumulated KF descriptors (the corpus is the map itself)."""
        if self.voc is not None:
            return True
        if self.cfg.vocabulary_file:
            self.voc = vocab_mod.load_dbow2_vocabulary(
                self.cfg.vocabulary_file)
        else:
            descs = [kf.pt_desc[kf.pt_valid]
                     for kf in self.mapper.map.keyframes]
            corpus = (np.concatenate(descs) if descs
                      else np.zeros((0, 8), np.uint32))
            if len(corpus) < 500:
                return False
            self.voc = vocab_mod.train_vocabulary(
                corpus, k=self.cfg.vocab_k, depth=self.cfg.vocab_depth,
                iters=4)
        voc = self.voc
        self._tf = jax.jit(lambda d, v: vocab_mod.transform(voc, d, v))
        # line vocabulary (dbow_voc_l) for the combined P+L scoring
        if self.cfg.use_line_bow:
            if self.cfg.vocabulary_file_l:
                self.voc_l = vocab_mod.load_dbow2_vocabulary(
                    self.cfg.vocabulary_file_l)
            else:
                ldescs = [kf.ls_desc[kf.ls_valid]
                          for kf in self.mapper.map.keyframes]
                lcorpus = (np.concatenate(ldescs) if ldescs
                           else np.zeros((0, 8), np.uint32))
                if len(lcorpus) >= 100:
                    self.voc_l = vocab_mod.train_vocabulary(
                        lcorpus, k=self.cfg.vocab_k,
                        depth=max(self.cfg.vocab_depth - 1, 2), iters=4)
            if self.voc_l is not None:
                voc_l = self.voc_l
                self._tf_l = jax.jit(
                    lambda d, v: vocab_mod.transform(voc_l, d, v))
        # back-fill vectors for all *previous* KFs (the caller appends the
        # newest one itself — keep bow/conf aligned with keyframe ids)
        prev = self.mapper.map.keyframes[:-1]
        self.bow = [self._bow_of(kf) for kf in prev]
        k = len(self.bow)
        self.conf = np.zeros((k, k), np.float32)
        for i in range(k):
            row = self._score_against(self.bow[i], self.bow[:i])
            self.conf[i, :i] = row
            self.conf[:i, i] = row
        return True

    def _bow_of(self, kf: KeyframeRecord) -> dict:
        """BoW record with the feature-count and spatial-dispersion weights
        of insertKFBowVectorPL (:4182-4213)."""
        rec = {"p": np.asarray(self._tf(jnp.asarray(kf.pt_desc),
                                        jnp.asarray(kf.pt_valid)))}
        uv = kf.pt_uv[kf.pt_valid]
        rec["n_pt"] = int(len(uv))
        rec["std_pt"] = float(uv[:, 0].std() + uv[:, 1].std()) if len(uv) else 0.0
        if self._tf_l is not None:
            rec["l"] = np.asarray(self._tf_l(jnp.asarray(kf.ls_desc),
                                             jnp.asarray(kf.ls_valid)))
            mid = 0.5 * (kf.ls_sp + kf.ls_ep)[kf.ls_valid]
            rec["n_ls"] = int(len(mid))
            rec["std_ls"] = (float(mid[:, 0].std() + mid[:, 1].std())
                             if len(mid) else 0.0)
        else:
            rec["l"] = None
            rec["n_ls"] = 0
            rec["std_ls"] = 0.0
        return rec

    def _score_against(self, a: dict, db: list[dict]) -> np.ndarray:
        """Combined scores of record ``a`` against a list of records — the
        two summed strategies of insertKFBowVectorPL (:4221-4228:
        feature-count-weighted and dispersion-weighted mixes of the point
        and line BoW scores).  Pure numpy: the vectors are host-resident
        and per-pair device dispatches would stall the mapping worker."""
        if not db:
            return np.zeros(0, np.float32)
        P = np.stack([b["p"] for b in db])                  # (D, Wp)
        sp = 1.0 - 0.5 * np.abs(P - a["p"][None]).sum(-1)   # L1 score
        has_l = a["l"] is not None and all(b["l"] is not None for b in db)
        if not has_l:
            return (2.0 * sp).astype(np.float32)
        L = np.stack([b["l"] for b in db])
        sl = 1.0 - 0.5 * np.abs(L - a["l"][None]).sum(-1)
        n_pt, n_ls = a["n_pt"], a["n_ls"]
        n_pl = max(n_pt + n_ls, 1)
        std_pt, std_ls = a["std_pt"], a["std_ls"]
        std_pl = max(std_pt + std_ls, 1e-9)
        return ((sp * n_pt + sl * n_ls) / n_pl
                + (sp * std_pt + sl * std_ls) / std_pl).astype(np.float32)

    def on_new_keyframe(self) -> dict | None:
        """Call after MapHandler.add_keyframe: update the conf matrix and
        attempt one loop closure.  Returns a report dict when a loop was
        closed (loopClosure :4053-4116)."""
        if not self._ensure_vocab():
            return None
        mp = self.mapper.map
        kf = mp.keyframes[-1]
        if len(self.bow) < len(mp.keyframes) - 1:
            # KFs added before vocab training already back-filled
            pass
        v = self._bow_of(kf)
        self.bow.append(v)
        k = len(self.bow)
        conf = np.zeros((k, k), np.float32)
        conf[: k - 1, : k - 1] = self.conf
        row = self._score_against(v, self.bow[: k - 1])
        conf[k - 1, : k - 1] = row
        conf[: k - 1, k - 1] = row
        self.conf = conf

        cand = self._look_for_candidates(kf.id)
        if cand is None:
            return None
        ok, T_rel = self._verify_candidate(kf.id, cand)
        if not ok:
            return None
        report = self._close(kf.id, cand, T_rel)
        self.closed_at = kf.id
        return report

    # -- candidate gating (:4241-4301) ------------------------------------

    def _look_for_candidates(self, kf_id: int):
        cfg = self.cfg
        if kf_id - self.closed_at < cfg.lc_kf_dist // 2:
            return None
        old = kf_id - cfg.lc_kf_dist
        if old < 1:
            return None
        scores = self.conf[kf_id, : old]
        if scores.size == 0:
            return None
        best = int(scores.argmax())
        best_score = scores[best]
        # must beat the min covisible-KF score (:4260-4279)
        covis = self.mapper.map.covis[kf_id]
        cov_ids = np.where(covis > 0)[0]
        if len(cov_ids):
            min_cov = float(self.conf[kf_id, cov_ids].min())
            if best_score <= min_cov:
                return None
        # temporal support (:4283-4297)
        near = scores[max(0, best - 5): best + 6]
        support = int((near >= cfg.lc_support_ratio * best_score).sum())
        if support < min(cfg.lc_nkf_closest, len(near)):
            return None
        return best

    # -- geometric verification (:4303-4411, :4677-5068) -------------------

    def _verify_candidate(self, kf_id: int, cand_id: int):
        mp = self.mapper.map
        kf = mp.keyframes[kf_id]
        old = mp.keyframes[cand_id]
        # brute-force descriptor match (point modality)
        mask = jnp.asarray(old.pt_valid)[:, None] & jnp.asarray(kf.pt_valid)[None, :]
        res = M.match_mutual_nnr(
            hamming_distance_matrix(jnp.asarray(old.pt_desc),
                                    jnp.asarray(kf.pt_desc)),
            mask, 0.9)
        idx = np.asarray(res.idx)
        pairs = [(i, j) for i, j in enumerate(idx) if j >= 0]
        if len(pairs) < self.cfg.min_pt_matches:
            return False, None
        # robust GN relative pose: old-KF 3D points vs new-KF observations
        n = len(old.pt_valid)
        P = np.zeros((n, 3), np.float32)
        obs = np.zeros((n, 2), np.float32)
        valid = np.zeros(n, bool)
        for i, j in pairs:
            P[i] = old.pt_P[i]
            obs[i] = kf.pt_uv[j]
            valid[i] = True
        pts = TrackedPoints(P=jnp.asarray(P), obs=jnp.asarray(obs),
                            sigma2=jnp.ones(n, jnp.float32),
                            valid=jnp.asarray(valid),
                            inlier=jnp.asarray(valid))
        ls = self._match_lines_for_verification(old, kf)
        cfgT = trk.TrackerConfig(use_lines=ls is not None,
                                 plucker_lines=False)
        if ls is None:
            ls = _empty_lines(8)
        est, _, _ = jax.jit(trk.optimize_pose, static_argnums=3)(
            pts, ls, self.cam, cfgT)
        if not bool(est.good):
            return False, None
        # acceptance gates (:4988-5023)
        DT = np.asarray(est.DT, np.float64)   # maps old-frame pts -> new frame
        xi = np.asarray(lie.log_se3(jnp.asarray(DT)))
        t_norm = float(np.linalg.norm(xi[:3]))
        r_deg = float(np.degrees(np.linalg.norm(xi[3:])))
        cov_max = float(np.abs(np.asarray(est.cov)).max())
        err = float(est.err)
        if (err > self.cfg.lc_res or cov_max > self.cfg.lc_unc
                or t_norm > self.cfg.lc_trs or r_deg > self.cfg.lc_rot):
            return False, None
        return True, DT

    def _match_lines_for_verification(self, old: KeyframeRecord,
                                      kf: KeyframeRecord):
        """Line modality of isLoopClosure (:4303-4411): brute-force mutual
        NNR over the two KFs' line descriptors feeding the relative-pose
        GN alongside the points (endpoint residuals; the tracker's
        absolute line gate rejects wrong matches at the points-only
        round-1 pose)."""
        nl = len(old.ls_valid)
        if nl == 0 or not old.ls_valid.any() or not kf.ls_valid.any():
            return None
        mask = (jnp.asarray(old.ls_valid)[:, None]
                & jnp.asarray(kf.ls_valid)[None, :])
        res = M.match_mutual_nnr(
            hamming_distance_matrix(jnp.asarray(old.ls_desc),
                                    jnp.asarray(kf.ls_desc)),
            mask, 0.9)
        idx = np.asarray(res.idx)
        if (idx >= 0).sum() < 3:
            return None
        sobs = np.zeros((nl, 2), np.float32)
        eobs = np.zeros((nl, 2), np.float32)
        le = np.zeros((nl, 3), np.float32)
        lval = np.zeros(nl, bool)
        for i1, i2 in enumerate(idx):
            if i2 < 0:
                continue
            sp, ep = kf.ls_sp[i2], kf.ls_ep[i2]
            lo = np.cross(np.append(sp, 1.0), np.append(ep, 1.0))
            nrm = np.hypot(lo[0], lo[1])
            if nrm < 1e-9:
                continue
            sobs[i1], eobs[i1], le[i1] = sp, ep, lo / nrm
            lval[i1] = True
        return TrackedLines(
            sP=jnp.asarray(old.ls_sP), eP=jnp.asarray(old.ls_eP),
            sp=jnp.asarray(old.ls_sp), ep=jnp.asarray(old.ls_ep),
            NDc=jnp.asarray(old.ls_NDc), sobs=jnp.asarray(sobs),
            eobs=jnp.asarray(eobs), le_obs=jnp.asarray(le),
            sigma2=jnp.asarray(old.ls_sigma2),
            valid=jnp.asarray(lval), inlier=jnp.asarray(lval))

    # -- pose-graph correction + fusion (:5301-5531, :5533-5807) -----------

    def _close(self, kf_id: int, cand_id: int, T_rel: np.ndarray) -> dict:
        mp = self.mapper.map
        K = len(mp.keyframes)
        T_old = np.stack([k.T_w_k for k in mp.keyframes])
        e_i, e_j, e_T, e_w = [], [], [], []
        # consecutive odometry edges
        for i in range(K - 1):
            e_i.append(i)
            e_j.append(i + 1)
            e_T.append(np.linalg.inv(T_old[i]) @ T_old[i + 1])
            e_w.append(1.0)
        # covisibility edges (covis >= min_lm_cov_graph, :5380)
        # graph variant (:5070-5299 essential / :5301-5531 covisibility):
        # the essential graph keeps only strong edges and fixes the LC
        # target; the covisibility graph fixes only KF0
        essential = self.cfg.pgo_graph == "essential"
        th = (self.cfg.min_lm_ess_graph if essential
              else self.mapper.cfg.min_lm_cov_graph)
        for i in range(K):
            for j in range(i + 2, K):
                if mp.covis[i, j] >= th:
                    e_i.append(i)
                    e_j.append(j)
                    e_T.append(np.linalg.inv(T_old[i]) @ T_old[j])
                    e_w.append(1.0)
        # the loop edge: T_rel maps cand-frame points into kf frame, i.e.
        # T_cand^w-1... relative pose measurement Z = T_cand^-1 T_kf = inv(T_rel)
        e_i.append(cand_id)
        e_j.append(kf_id)
        e_T.append(np.linalg.inv(T_rel))
        e_w.append(float(len(e_i)))  # strong information on the loop edge

        fixed = ((jnp.arange(K) == 0) | (jnp.arange(K) == cand_id)
                 if essential else jnp.arange(K) == 0)
        g = pgo_mod.PoseGraph(
            T_w_k=jnp.asarray(T_old),
            fixed=fixed,
            valid=jnp.ones(K, bool),
            e_i=jnp.asarray(e_i, jnp.int32),
            e_j=jnp.asarray(e_j, jnp.int32),
            e_T=jnp.asarray(np.stack(e_T)),
            e_info=jnp.asarray(e_w, jnp.float64),
            e_valid=jnp.ones(len(e_i), bool),
        )
        g2 = jax.jit(pgo_mod.optimize, static_argnums=1)(g, self.cfg.pgo_iters)
        T_new = np.asarray(g2.T_w_k)

        # rigid landmark correction by owner KF (:5219-5287)
        owner_pt = np.asarray([obs[0][0] if obs else 0 for obs in mp.pt_obs])
        if len(owner_pt):
            mp.pt_w = np.asarray(pgo_mod.correct_landmarks(
                jnp.asarray(T_old), jnp.asarray(T_new),
                jnp.asarray(owner_pt, jnp.int32), jnp.asarray(mp.pt_w)))
        owner_ls = np.asarray([obs[0][0] if obs else 0 for obs in mp.ls_obs])
        if len(owner_ls):
            mp.ls_w = np.asarray(pgo_mod.correct_plucker_landmarks(
                jnp.asarray(T_old), jnp.asarray(T_new),
                jnp.asarray(owner_ls, jnp.int32), jnp.asarray(mp.ls_w)))
            # endpoints move rigidly with their owner KF too
            for i, own in enumerate(owner_ls):
                D = T_new[own] @ np.linalg.inv(T_old[own])
                mp.ls_epw[i] = (D[:3, :3] @ mp.ls_epw[i].T).T + D[:3, 3]
        for i, kf in enumerate(mp.keyframes):
            kf.T_w_k = T_new[i]

        fused = self._fuse_landmarks(kf_id, cand_id)
        drift = float(np.linalg.norm(
            T_new[kf_id][:3, 3] - T_old[kf_id][:3, 3]))
        return {"kf": kf_id, "candidate": cand_id, "fused": fused,
                "correction": drift}

    def _fuse_landmarks(self, kf_id: int, cand_id: int) -> int:
        """Merge duplicate point landmarks seen from both loop ends
        (loopClosureFuseLandmarks :5533-5807, the fuse-duplicates case)."""
        mp = self.mapper.map
        kf = mp.keyframes[kf_id]
        old = mp.keyframes[cand_id]
        fused = 0
        for i in range(len(old.pt_valid)):
            li = old.pt_lm[i]
            if li < 0 or not mp.pt_valid[li]:
                continue
            for j in range(len(kf.pt_valid)):
                lj = kf.pt_lm[j]
                if lj < 0 or lj == li or not mp.pt_valid[lj]:
                    continue
                if np.linalg.norm(mp.pt_w[li] - mp.pt_w[lj]) < self.cfg.fuse_dist:
                    # merge lj into li
                    mp.pt_obs[li].extend(mp.pt_obs[lj])
                    for kfi, fi in mp.pt_obs[lj]:
                        mp.keyframes[kfi].pt_lm[fi] = li
                    mp.pt_obs[lj] = []
                    mp.pt_valid[lj] = False
                    fused += 1
                    break
        return fused


def _empty_lines(n: int) -> TrackedLines:
    z2 = jnp.zeros((n, 2), jnp.float32)
    z3 = jnp.zeros((n, 3), jnp.float32)
    return TrackedLines(
        sP=z3, eP=z3, sp=z2, ep=z2, NDc=jnp.zeros((n, 6), jnp.float32),
        sobs=z2, eobs=z2, le_obs=z3, sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.zeros(n, bool), inlier=jnp.zeros(n, bool))
