"""Distributed Schur-complement bundle adjustment over a device mesh.

The reference has no distributed story (threads only, SURVEY.md §2.4); this
is the scaling design mandated by BASELINE.json: landmarks and their
observations are sharded across devices along the "lm" mesh axis, each
device assembles its partial camera-Hessian and Schur-correction blocks,
and the small reduced camera system is combined with ``psum`` over ICI and
solved replicated; landmark back-substitution stays local to each shard.

Implementation: ``shard_map`` over a 1-axis mesh.  The per-shard math
reuses backend/ba.py's residual/Jacobian kernels on a shard-local
BAProblem view (global pose array, local landmark slices).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import ba as ba_mod
from ..core import lie, linalg
from ..core.camera import StereoCamera
from ..core.plucker import orth_plus

AXIS = "lm"


def _local_assemble(prob: ba_mod.BAProblem, cam: StereoCamera,
                    cfg: ba_mod.BAConfig, lam, p_active, l_active):
    """Shard-local assembly + Schur partials.  Runs inside shard_map: prob
    holds the full (replicated) poses but only this shard's landmarks/obs.
    Returns partial (S, rhs) for psum plus local landmark terms."""
    a = ba_mod.assemble(prob, cam, cfg, p_active, l_active)
    K = a.Hcc.shape[0]
    dtype = a.Hcc.dtype
    Hpp_inv, _ = ba_mod._damped_inv(a.Hpp, lam, prob.point_valid, 3,
                                    ba_mod.point_block_floor(prob, cfg))
    Hll_inv, _ = ba_mod._damped_inv(a.Hll, lam, prob.line_valid, 4,
                                    cfg.tikhonov)

    S_partial = jnp.zeros((K, K, 6, 6), dtype)
    S_partial = S_partial - jnp.einsum("kpab,pbc,qpdc->kqad", a.Wp, Hpp_inv, a.Wp)
    S_partial = S_partial - jnp.einsum("klab,lbc,qldc->kqad", a.Wl, Hll_inv, a.Wl)
    rhs_partial = a.bc - jnp.einsum("kpab,pbc,pc->ka", a.Wp, Hpp_inv, a.bp)
    rhs_partial = rhs_partial - jnp.einsum("klab,lbc,lc->ka", a.Wl, Hll_inv, a.bl)
    return a, Hpp_inv, Hll_inv, S_partial, rhs_partial


def _dist_lm_iteration(prob, cam, cfg, lam, p_active, l_active):
    """One distributed LM iteration (runs under shard_map)."""
    a, Hpp_inv, Hll_inv, S_partial, rhs_partial = _local_assemble(
        prob, cam, cfg, lam, p_active, l_active)
    K = a.Hcc.shape[0]
    dtype = a.Hcc.dtype
    # combine partial camera blocks across shards (the ICI reduction)
    Hcc = jax.lax.psum(a.Hcc, AXIS)
    S = jax.lax.psum(S_partial, AXIS)
    rhs = jax.lax.psum(rhs_partial, AXIS)
    I6 = jnp.eye(6, dtype=dtype)
    Hcc_d = Hcc + lam * Hcc * I6
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)

    free = prob.pose_valid & ~prob.pose_fixed
    fmask = free.astype(dtype)
    S = S * fmask[:, None, None, None] * fmask[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(I6 * (1.0 - fmask)[:, None, None])
    rhs = rhs * fmask[:, None]

    Smat = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    Smat = Smat + 1e-10 * jnp.eye(6 * K, dtype=dtype)
    dpose = linalg.solve_spd(Smat, rhs.reshape(-1)).reshape(K, 6)
    dpose = dpose * fmask[:, None]

    # local landmark back-substitution
    tp = a.bp - jnp.einsum("kpab,ka->pb", a.Wp, dpose)
    dpoint = jnp.einsum("pbc,pc->pb", Hpp_inv, tp)
    tl = a.bl - jnp.einsum("klab,ka->lb", a.Wl, dpose)
    dline = jnp.einsum("lbc,lc->lb", Hll_inv, tl)
    return dpose, dpoint, dline


def _dist_cost(prob, cam, cfg, p_active, l_active):
    """Cauchy cost, matching assemble()'s IRLS weights (the LM
    accept/reject test must use the same objective the step minimized)."""
    e_p, _, _ = ba_mod.point_obs_residuals(prob, cam)
    e_l, _, _ = ba_mod.line_obs_residuals(prob, cam)
    c = jnp.sum(jnp.where(p_active,
                          ba_mod.cauchy_cost(e_p) * prob.p_sigma2, 0.0))
    c = c + jnp.sum(jnp.where(l_active,
                              ba_mod.cauchy_cost(e_l) * prob.l_sigma2, 0.0))
    return jax.lax.psum(c, AXIS)


def make_dist_bundle_adjust(mesh: Mesh, cam: StereoCamera,
                            cfg: ba_mod.BAConfig, iters: int = 10):
    """Build the jitted shard_map BA step for a given mesh.

    The returned function takes a BAProblem whose landmark/observation
    arrays are sharded along their leading axis (use
    ``shard_problem(mesh, prob)``) and runs ``iters`` accepted/rejected LM
    iterations of the distributed Schur solve.
    """

    # replicated leaves: poses + validity; sharded leaves: landmarks + obs
    pspec = ba_mod.BAProblem(
        T_c_w=P(), pose_fixed=P(), pose_valid=P(),
        points=P(AXIS), point_valid=P(AXIS),
        lines_orth=P(AXIS), lines_scale=P(AXIS), line_valid=P(AXIS),
        p_cam=P(AXIS), p_lm=P(AXIS), p_uv=P(AXIS), p_sigma2=P(AXIS),
        p_valid=P(AXIS),
        l_cam=P(AXIS), l_lm=P(AXIS), l_sobs=P(AXIS), l_eobs=P(AXIS),
        l_sigma2=P(AXIS), l_valid=P(AXIS),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(pspec,),
        out_specs=(pspec, P()), check_vma=False)
    def run(prob: ba_mod.BAProblem):
        p_active = prob.p_valid
        l_active = prob.l_valid
        lam0 = jnp.asarray(cfg.lambda_init, prob.points.dtype)
        cost0 = _dist_cost(prob, cam, cfg, p_active, l_active)

        def body(carry, _):
            prob, lam, cost = carry
            dpose, dpoint, dline = _dist_lm_iteration(
                prob, cam, cfg, lam, p_active, l_active)
            T_new = jax.vmap(lambda d, T: lie.exp_se3(-d) @ T)(dpose, prob.T_c_w)
            cand = prob._replace(
                T_c_w=T_new,
                points=prob.points - dpoint,
                lines_orth=jax.vmap(orth_plus)(prob.lines_orth, -dline))
            new_cost = _dist_cost(cand, cam, cfg, p_active, l_active)
            ok = (new_cost < cost) & jnp.isfinite(new_cost)
            prob = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(ok, (1,) * new.ndim), new, old), cand, prob)
            lam = jnp.clip(jnp.where(ok, lam / cfg.lambda_factor,
                                     lam * cfg.lambda_factor), 1e-9, 1e6)
            cost = jnp.where(ok, new_cost, cost)
            return (prob, lam, cost), None

        (prob, _, cost), _ = jax.lax.scan(
            body, (prob, lam0, cost0), None, length=iters)
        return prob, cost

    return jax.jit(run)


def shard_problem(mesh: Mesh, prob: ba_mod.BAProblem) -> ba_mod.BAProblem:
    """Device_put each leaf with its distributed sharding.  Landmark slot
    indices (p_lm / l_lm) must already be *shard-local* (host assembly
    groups observations by landmark shard)."""
    n = mesh.devices.size

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ba_mod.BAProblem(
        T_c_w=put(prob.T_c_w, P()),
        pose_fixed=put(prob.pose_fixed, P()),
        pose_valid=put(prob.pose_valid, P()),
        points=put(prob.points, P(AXIS)),
        point_valid=put(prob.point_valid, P(AXIS)),
        lines_orth=put(prob.lines_orth, P(AXIS)),
        lines_scale=put(prob.lines_scale, P(AXIS)),
        line_valid=put(prob.line_valid, P(AXIS)),
        p_cam=put(prob.p_cam, P(AXIS)),
        p_lm=put(prob.p_lm, P(AXIS)),
        p_uv=put(prob.p_uv, P(AXIS)),
        p_sigma2=put(prob.p_sigma2, P(AXIS)),
        p_valid=put(prob.p_valid, P(AXIS)),
        l_cam=put(prob.l_cam, P(AXIS)),
        l_lm=put(prob.l_lm, P(AXIS)),
        l_sobs=put(prob.l_sobs, P(AXIS)),
        l_eobs=put(prob.l_eobs, P(AXIS)),
        l_sigma2=put(prob.l_sigma2, P(AXIS)),
        l_valid=put(prob.l_valid, P(AXIS)),
    )
