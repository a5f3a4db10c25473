"""Sequence-block (kf-axis) sharded global bundle adjustment.

The second distribution axis named by SURVEY.md §2.4/§5 and BASELINE
config 5: the keyframe trajectory is partitioned into contiguous blocks,
one per device.  Each device runs the full two-round Schur BA
(backend/ba.py) on ITS block — its keyframes, plus every landmark those
keyframes observe.  A landmark is OWNED by the block of its first
observer (mapFeatures kf_obs_list[0] semantics); non-owning blocks keep
it fixed (its observations still constrain their poses, they just don't
move it), which anchors neighboring blocks to each other through the
shared boundary landmarks.  Between rounds the owned landmark updates are
combined with one ``psum`` over the mesh (the only collective — the pose
blocks never need to be exchanged because no observation crosses a block
boundary), and every block re-seeds from the consensus table.

This is block-Gauss-Seidel over the trajectory: wall-clock scales with
the largest block instead of the whole sequence, every device program is
fixed-shape, and the consensus traffic is one landmark-table all-reduce
per round over ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import logging

from ..backend import ba as ba_mod
from ..core.camera import StereoCamera

log = logging.getLogger("plslam_tpu.dist_gba")

AXIS = "kf"


class BlockedGBA(NamedTuple):
    """Host-assembled inputs: block problems stacked on a leading axis."""

    prob: ba_mod.BAProblem          # every leaf (B, ...)
    pt_gid: np.ndarray              # (B, cap_pts) global point id (0 pad)
    own_pt: np.ndarray              # (B, cap_pts) this block owns the slot
    ls_gid: np.ndarray              # (B, cap_ls)
    own_ls: np.ndarray              # (B, cap_ls)
    pt_glob: np.ndarray             # (Ng[+2*Lg], 3) global point table
    #                                 (endpoint mode appends 2 endpoint
    #                                 rows per line after the Ng points)
    ls_orth_glob: np.ndarray        # (Lg, 4) global line orth table
    ls_scale_glob: np.ndarray       # (Lg,)
    block_kfs: list                 # per-block keyframe id lists
    pt_ids_glob: np.ndarray         # (Ng,) map row of each global slot
    ls_ids_glob: np.ndarray         # (Lg,)
    plucker: bool                   # line parameterization of the blocks


def partition_map(mapper, n_blocks: int) -> BlockedGBA:
    """Split the keyframe sequence into n contiguous blocks and assemble
    one padded BAProblem per block (globalBundleAdjustment :3022-3126
    re-partitioned along the trajectory).  Both line modes: Pluecker
    lines are consensus-reduced as 4-DoF orth rows; endpoint lines
    (the reference's GBA parameterization, mapHandler.cpp:3128-3731)
    ride the POINT consensus table as endpoint-pair rows, exactly as
    they ride the point table inside each block's BAProblem."""
    mp = mapper.map
    cfg = mapper.cfg
    plucker = cfg.plucker_lines
    kf_ids = [k.id for k in mp.keyframes if k.active]
    blocks = np.array_split(np.asarray(kf_ids), n_blocks)
    block_of_kf = np.zeros(len(mp.keyframes), np.int64)
    for b, ids in enumerate(blocks):
        block_of_kf[ids] = b

    # global landmark tables: every landmark with >=2 obs anywhere
    allmask = np.zeros(len(mp.keyframes), bool)
    allmask[kf_ids] = True
    pt_ids, ls_ids = mapper._ba_landmark_ids(allmask)
    g_of_pt = np.full(mp.n_pt, -1, np.int64)
    g_of_pt[pt_ids] = np.arange(len(pt_ids))
    g_of_ls = np.full(mp.n_ls, -1, np.int64)
    g_of_ls[ls_ids] = np.arange(len(ls_ids))

    # per-(landmark, block) observation counts decide OWNERSHIP: the
    # block with the most observations optimizes the landmark, and only
    # if it holds >=2 there (a single in-block observation cannot
    # constrain depth; such straddling landmarks stay consensus-pinned
    # anchors in every block that sees them, and are counted below —
    # never silently dropped)
    def blk_counts(tb, n_lm):
        sel = tb.valid[: tb.n] & allmask[tb.kf[: tb.n]]
        cnt = np.zeros((n_lm, n_blocks), np.int64)
        np.add.at(cnt, (tb.lm[: tb.n][sel],
                        block_of_kf[tb.kf[: tb.n][sel]]), 1)
        return cnt

    cnt_pt = blk_counts(mp.pobs, mp.n_pt)[pt_ids]
    cnt_ls = blk_counts(mp.lobs, mp.n_ls)[ls_ids]
    pt_owner = (cnt_pt.argmax(axis=1) if len(pt_ids)
                else np.zeros(0, np.int64))
    ls_owner = (cnt_ls.argmax(axis=1) if len(ls_ids)
                else np.zeros(0, np.int64))
    pt_ownable = cnt_pt.max(axis=1) >= 2 if len(pt_ids) else pt_owner > 0
    ls_ownable = cnt_ls.max(axis=1) >= 2 if len(ls_ids) else ls_owner > 0
    n_pin_pt = int((~pt_ownable).sum()) if len(pt_ids) else 0
    n_pin_ls = int((~ls_ownable).sum()) if len(ls_ids) else 0
    if n_pin_pt or n_pin_ls:
        log.info("kf-block GBA: %d point / %d line landmarks straddle "
                 "blocks with <2 obs in any single block — kept as pinned "
                 "anchors, not optimized", n_pin_pt, n_pin_ls)

    cap_k = max(len(ids) for ids in blocks)
    Ng = len(pt_ids)
    # endpoint mode: every line consumes two extra point-table slots in
    # its block, so the point capacity available to actual points shrinks
    # (the same invariant as global_bundle_adjustment's cap_p_eff)
    cap_pt_eff = (cfg.ba_points if plucker
                  else max(cfg.ba_points - 2 * cfg.ba_lines,
                           cfg.ba_points // 2))
    probs, gids_p, owns_p, gids_l, owns_l = [], [], [], [], []
    for b, ids in enumerate(blocks):
        slotmask = np.zeros(len(mp.keyframes), bool)
        slotmask[ids] = True
        # min_obs=1: single-observation anchors still constrain this
        # block's poses through the consensus-pinned landmark state
        b_pt, b_ls = mapper._ba_landmark_ids(slotmask, min_obs=1)
        b_pt = b_pt[g_of_pt[b_pt] >= 0]
        b_ls = b_ls[g_of_ls[b_ls] >= 0]
        # capacity: owned landmarks first, then anchors; log any drop
        o_p = pt_ownable[g_of_pt[b_pt]] & (pt_owner[g_of_pt[b_pt]] == b)
        o_l = ls_ownable[g_of_ls[b_ls]] & (ls_owner[g_of_ls[b_ls]] == b)
        b_pt = np.concatenate([b_pt[o_p], b_pt[~o_p]])
        b_ls = np.concatenate([b_ls[o_l], b_ls[~o_l]])
        if len(b_pt) > cap_pt_eff or len(b_ls) > cfg.ba_lines:
            log.warning(
                "kf-block GBA block %d over capacity: %d/%d points, "
                "%d/%d lines — dropping trailing anchors", b,
                len(b_pt), cap_pt_eff, len(b_ls), cfg.ba_lines)
        b_pt = b_pt[: cap_pt_eff]
        b_ls = b_ls[: cfg.ba_lines]
        prob, meta = mapper._assemble_problem(
            list(ids), b_pt, b_ls, cfg.ba_points, cfg.ba_lines,
            cfg.ba_pobs, cfg.ba_lobs, fix_rule="local", cap_k=cap_k)
        # non-owned landmarks stay valid=False: their observations still
        # constrain this block's poses (Hcc terms) but the landmark state
        # is pinned to the consensus table
        own_p = np.zeros(cfg.ba_points, bool)
        own_p[: len(b_pt)] = (pt_ownable[g_of_pt[b_pt]]
                              & (pt_owner[g_of_pt[b_pt]] == b))
        own_l = np.zeros(cfg.ba_lines, bool)
        own_l[: len(b_ls)] = (ls_ownable[g_of_ls[b_ls]]
                              & (ls_owner[g_of_ls[b_ls]] == b))
        gp = np.zeros(cfg.ba_points, np.int32)
        gp[: len(b_pt)] = g_of_pt[b_pt]
        gl = np.zeros(cfg.ba_lines, np.int32)
        gl[: len(b_ls)] = g_of_ls[b_ls]
        if not plucker:
            if len(b_ls):
                # endpoint pairs live in the point table from ep_base:
                # their global consensus rows are Ng + 2*g(+1), owned
                # with the line
                ep_base = meta["ep_base"]
                sl = np.arange(len(b_ls))
                gsl = g_of_ls[b_ls]
                for off in (0, 1):
                    rows = ep_base + 2 * sl + off
                    gp[rows] = Ng + 2 * gsl + off
                    own_p[rows] = own_l[: len(b_ls)]
            # the orth consensus is a no-op here (1-row dummy table):
            # keep its gids/ownership zero so the scatter stays in bounds
            own_l = np.zeros(cfg.ba_lines, bool)
            gl = np.zeros(cfg.ba_lines, np.int32)
        prob = prob._replace(
            point_valid=np.asarray(prob.point_valid) & own_p,
            line_valid=np.asarray(prob.line_valid) & own_l)
        probs.append(prob)
        gids_p.append(gp)
        owns_p.append(own_p)
        gids_l.append(gl)
        owns_l.append(own_l)

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    pt_glob = mp.pt_w[pt_ids].astype(np.float32)
    if plucker:
        Lws = mp.ls_w[ls_ids]
        scales = (np.linalg.norm(Lws, axis=-1) if len(ls_ids)
                  else np.zeros(0))
        if len(ls_ids):
            from ..backend.mapping import _orth_batch

            orth = np.asarray(_orth_batch(jnp.asarray(
                (Lws / np.maximum(scales, 1e-12)[:, None]
                 ).astype(np.float32))))
        else:
            orth = np.zeros((0, 4), np.float32)
    else:
        # endpoint rows join the point consensus table; the orth table is
        # a 1-row dummy so the (no-op) line consensus psum stays
        # shape-valid with all own_ls False
        scales = np.zeros(len(ls_ids))
        orth = np.zeros((1, 4), np.float32)
        if len(ls_ids):
            pt_glob = np.concatenate(
                [pt_glob,
                 mp.ls_epw[ls_ids].reshape(-1, 3).astype(np.float32)])
    return BlockedGBA(
        prob=stacked, pt_gid=np.stack(gids_p), own_pt=np.stack(owns_p),
        ls_gid=np.stack(gids_l), own_ls=np.stack(owns_l),
        pt_glob=pt_glob,
        ls_orth_glob=orth.astype(np.float32),
        ls_scale_glob=scales.astype(np.float32),
        block_kfs=[list(ids) for ids in blocks],
        pt_ids_glob=pt_ids, ls_ids_glob=ls_ids, plucker=plucker)


def make_kf_block_gba(mesh: Mesh, cam: StereoCamera,
                      cfg: ba_mod.BAConfig, rounds: int = 2,
                      endpoint_lines: bool = False):
    """Jitted shard_map program: per-block two-round Schur BA + landmark
    consensus psum between rounds.  ``endpoint_lines`` selects the
    endpoint-parameterized problem layout (p_lo/p_is_line present)."""
    # p_lo/p_is_line are None in Pluecker mode — they must be None (not a
    # spec leaf) so the in_specs treedef matches the argument's; in
    # endpoint mode they are real (B, cap_pobs) leaves sharded like the
    # rest
    none_fields = () if endpoint_lines else ("p_lo", "p_is_line")
    pspec = ba_mod.BAProblem(**{
        f: (None if f in none_fields else P(AXIS))
        for f in ba_mod.BAProblem._fields})

    # small (2-4 KF) blocks re-triangulate owned landmarks from very short
    # baselines: raise the landmark-block Tikhonov floor so rank-deficient
    # directions (endpoint along-line, 2-view depth) can't absorb f32
    # rounding noise as meter-scale drift (see BAConfig.tikhonov)
    cfg = cfg._replace(tikhonov=max(cfg.tikhonov, 1e-4))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspec, P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(), P()), check_vma=False)
    def run(prob, pt_gid, own_pt, ls_gid, own_ls, pt_glob, ls_orth_glob):
        sq = lambda x: None if x is None else jnp.squeeze(x, 0)  # noqa: E731
        prob = jax.tree.map(sq, prob)
        pt_gid = sq(pt_gid)
        own_pt = sq(own_pt)
        ls_gid = sq(ls_gid)
        own_ls = sq(own_ls)
        T = prob.T_c_w
        for _ in range(rounds):
            seeded_p = pt_glob[pt_gid]
            seeded_l = ls_orth_glob[ls_gid]
            pr = prob._replace(T_c_w=T, points=seeded_p,
                               lines_orth=seeded_l)
            res = ba_mod.bundle_adjust(pr, cam, cfg)
            T = res.problem.T_c_w
            dp = jnp.where(own_pt[:, None],
                           res.problem.points - seeded_p, 0.0)
            upd = jnp.zeros_like(pt_glob).at[pt_gid].add(dp)
            pt_glob = pt_glob + jax.lax.psum(upd, AXIS)
            dl = jnp.where(own_ls[:, None],
                           res.problem.lines_orth - seeded_l, 0.0)
            updl = jnp.zeros_like(ls_orth_glob).at[ls_gid].add(dl)
            ls_orth_glob = ls_orth_glob + jax.lax.psum(updl, AXIS)
        return T[None], pt_glob, ls_orth_glob

    return jax.jit(run)


def distributed_global_bundle_adjustment(mapper, mesh: Mesh,
                                         rounds: int = 2):
    """Run the kf-block sharded GBA on a mesh and write results back into
    the map (poses, points, lines)."""
    from ..backend.mapping import (_np_normalize_plucker,
                                   _plucker_from_orth_batch)

    n_blocks = mesh.devices.size
    blk = partition_map(mapper, n_blocks)
    run = make_kf_block_gba(mesh, mapper.cam, mapper.ba_cfg, rounds,
                            endpoint_lines=not blk.plucker)

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    prob_dev = jax.tree.map(lambda x: put(x, P(AXIS)), blk.prob)
    T_blocks, pt_glob, ls_orth = jax.device_get(run(
        prob_dev, put(blk.pt_gid, P(AXIS)), put(blk.own_pt, P(AXIS)),
        put(blk.ls_gid, P(AXIS)), put(blk.own_ls, P(AXIS)),
        put(blk.pt_glob, P()), put(blk.ls_orth_glob, P())))

    mp = mapper.map
    for b, ids in enumerate(blk.block_kfs):
        for s, kfid in enumerate(ids):
            mp.keyframes[kfid].T_w_k = np.linalg.inv(
                np.asarray(T_blocks[b][s], np.float64))
    Ng = len(blk.pt_ids_glob)
    pt_glob = np.asarray(pt_glob, np.float64)
    if Ng:
        mp.pt_w[blk.pt_ids_glob] = pt_glob[:Ng]
    if len(blk.ls_ids_glob):
        ls_ids = blk.ls_ids_glob
        if blk.plucker:
            Lw = np.asarray(_plucker_from_orth_batch(jnp.asarray(ls_orth)))
            Lw = Lw * blk.ls_scale_glob[:, None]
            mp.ls_w[ls_ids] = _np_normalize_plucker(Lw.astype(np.float64))
        else:
            # endpoint mode: optimized endpoints come back through the
            # point consensus table; refresh ls_epw and the Pluecker form
            # (mapHandler.cpp:3128-3731 write-back semantics)
            ep = pt_glob[Ng:].reshape(-1, 2, 3)
            mp.ls_epw[ls_ids] = ep
            d = ep[:, 1] - ep[:, 0]
            nd = np.linalg.norm(d, axis=-1)
            ok = np.isfinite(nd) & (nd > 1e-9)
            Lw = np.concatenate([np.cross(ep[:, 0], ep[:, 1]), d], 1)
            mp.ls_w[ls_ids[ok]] = Lw[ok] / nd[ok, None]
    return blk
