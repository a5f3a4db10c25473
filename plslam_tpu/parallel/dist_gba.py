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
    pt_glob: np.ndarray             # (Ng, 3) global point table
    ls_orth_glob: np.ndarray        # (Lg, 4) global line orth table
    ls_scale_glob: np.ndarray       # (Lg,)
    block_kfs: list                 # per-block keyframe id lists
    pt_ids_glob: np.ndarray         # (Ng,) map row of each global slot
    ls_ids_glob: np.ndarray         # (Lg,)


def partition_map(mapper, n_blocks: int) -> BlockedGBA:
    """Split the keyframe sequence into n contiguous blocks and assemble
    one padded BAProblem per block (globalBundleAdjustment :3022-3126
    re-partitioned along the trajectory)."""
    mp = mapper.map
    cfg = mapper.cfg
    assert cfg.plucker_lines, "kf-block GBA implemented for Pluecker mode"
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
        if len(b_pt) > cfg.ba_points or len(b_ls) > cfg.ba_lines:
            log.warning(
                "kf-block GBA block %d over capacity: %d/%d points, "
                "%d/%d lines — dropping trailing anchors", b,
                len(b_pt), cfg.ba_points, len(b_ls), cfg.ba_lines)
        b_pt = b_pt[: cfg.ba_points]
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
        prob = prob._replace(
            point_valid=np.asarray(prob.point_valid) & own_p,
            line_valid=np.asarray(prob.line_valid) & own_l)
        gp = np.zeros(cfg.ba_points, np.int32)
        gp[: len(b_pt)] = g_of_pt[b_pt]
        gl = np.zeros(cfg.ba_lines, np.int32)
        gl[: len(b_ls)] = g_of_ls[b_ls]
        probs.append(prob)
        gids_p.append(gp)
        owns_p.append(own_p)
        gids_l.append(gl)
        owns_l.append(own_l)

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *probs)
    Lws = mp.ls_w[ls_ids]
    scales = np.linalg.norm(Lws, axis=-1) if len(ls_ids) else np.zeros(0)
    if len(ls_ids):
        from ..backend.mapping import _orth_batch

        orth = np.asarray(_orth_batch(jnp.asarray(
            (Lws / np.maximum(scales, 1e-12)[:, None]).astype(np.float32))))
    else:
        orth = np.zeros((0, 4), np.float32)
    return BlockedGBA(
        prob=stacked, pt_gid=np.stack(gids_p), own_pt=np.stack(owns_p),
        ls_gid=np.stack(gids_l), own_ls=np.stack(owns_l),
        pt_glob=mp.pt_w[pt_ids].astype(np.float32),
        ls_orth_glob=orth.astype(np.float32),
        ls_scale_glob=scales.astype(np.float32),
        block_kfs=[list(ids) for ids in blocks],
        pt_ids_glob=pt_ids, ls_ids_glob=ls_ids)


def make_kf_block_gba(mesh: Mesh, cam: StereoCamera,
                      cfg: ba_mod.BAConfig, rounds: int = 2):
    """Jitted shard_map program: per-block two-round Schur BA + landmark
    consensus psum between rounds."""
    # p_lo/p_is_line are None in Pluecker mode — they must be None (not a
    # spec leaf) so the in_specs treedef matches the argument's
    pspec = ba_mod.BAProblem(**{
        f: (None if f in ("p_lo", "p_is_line") else P(AXIS))
        for f in ba_mod.BAProblem._fields})

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
    run = make_kf_block_gba(mesh, mapper.cam, mapper.ba_cfg, rounds)

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
    if len(blk.pt_ids_glob):
        mp.pt_w[blk.pt_ids_glob] = np.asarray(pt_glob, np.float64)
    if len(blk.ls_ids_glob):
        Lw = np.asarray(_plucker_from_orth_batch(jnp.asarray(ls_orth)))
        Lw = Lw * blk.ls_scale_glob[:, None]
        mp.ls_w[blk.ls_ids_glob] = _np_normalize_plucker(
            Lw.astype(np.float64))
    return blk
