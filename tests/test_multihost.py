"""Multi-host (DCN x ICI) mesh variants of the distributed solvers, run
on the virtual 8-CPU platform reshaped 2 hosts x 4 devices — the axis
structure (hierarchical multi-axis psum) a real pod run would compile
(SURVEY.md §5 distributed backend; VERDICT r3 next-round #9)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _map_fixtures import World, lateral_poses, make_camera, render_features
from plslam_tpu.backend import ba
from plslam_tpu.backend.mapping import MapConfig, MapHandler
from plslam_tpu.core import lie
from plslam_tpu.parallel import multihost


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.local_devices(backend="cpu")) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    return multihost.make_multihost_mesh(2, 4)


def test_mesh_layout(mesh2d):
    assert mesh2d.axis_names == ("dcn", "ici")
    assert mesh2d.devices.shape == (2, 4)


def _toy_problem(K=6, P=64, rng=None):
    rng = rng or np.random.default_rng(0)
    from plslam_tpu.core.camera import euroc_default_camera

    cam = euroc_default_camera(jnp.float64)
    xi = np.concatenate([rng.uniform(-0.2, 0.2, (K, 3)),
                         rng.uniform(-0.03, 0.03, (K, 3))], 1)
    T_w_c = np.asarray(jax.vmap(lie.exp_se3)(jnp.asarray(xi)))
    T_c_w = np.linalg.inv(T_w_c)
    Pw = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                   rng.uniform(3, 9, P)], -1)
    obs_k = 4
    start = rng.integers(0, K - obs_k + 1, P)
    p_cam = (start[:, None] + np.arange(obs_k)[None]).reshape(-1)
    p_lm = np.repeat(np.arange(P), obs_k)
    Pc = np.einsum("nij,nj->ni", T_c_w[p_cam, :3, :3], Pw[p_lm]) \
        + T_c_w[p_cam, :3, 3]
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    p_uv = np.stack([cx + fx * Pc[:, 0] / Pc[:, 2],
                     cy + fy * Pc[:, 1] / Pc[:, 2]], -1)
    pert = rng.normal(size=(K, 6)) * 0.01
    pert[0] = 0
    T_init = np.asarray(jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(
        jnp.asarray(pert), jnp.asarray(T_c_w)))
    n = len(p_cam)
    prob = ba.BAProblem(
        T_c_w=jnp.asarray(T_init), pose_fixed=jnp.arange(K) == 0,
        pose_valid=jnp.ones(K, bool),
        points=jnp.asarray(Pw + rng.normal(size=Pw.shape) * 0.01),
        point_valid=jnp.ones(P, bool),
        lines_orth=jnp.zeros((8, 4)), lines_scale=jnp.ones(8),
        line_valid=jnp.zeros(8, bool),
        p_cam=jnp.asarray(p_cam, jnp.int32),
        p_lm=jnp.asarray(p_lm, jnp.int32), p_uv=jnp.asarray(p_uv),
        p_sigma2=jnp.ones(n), p_valid=jnp.ones(n, bool),
        l_cam=jnp.zeros(8, jnp.int32), l_lm=jnp.zeros(8, jnp.int32),
        l_sobs=jnp.zeros((8, 2)), l_eobs=jnp.zeros((8, 2)),
        l_sigma2=jnp.ones(8), l_valid=jnp.zeros(8, bool))
    return cam, prob, p_lm


def test_dist_ba_2d_matches_single_device(mesh2d):
    """Landmark-sharded BA over the 2-axis mesh == single-device solve
    (the psum is hierarchical but algebraically the same reduction)."""
    cam, prob, p_lm_g = _toy_problem(P=64)
    P_shard = 64 // 8
    run = multihost.make_dist_bundle_adjust_2d(mesh2d, cam, ba.BAConfig(),
                                               iters=3)
    sharded = multihost.shard_problem_2d(
        mesh2d, prob._replace(p_lm=jnp.asarray(
            np.asarray(prob.p_lm) % P_shard, jnp.int32)))
    out, cost = run(sharded)
    jax.block_until_ready(out)
    ref, ref_cost = ba.lm_rounds(prob, cam, ba.BAConfig(),
                                 prob.p_valid, prob.l_valid, 3)
    dT = np.abs(np.asarray(out.T_c_w) - np.asarray(ref.T_c_w)).max()
    assert np.isfinite(float(cost))
    assert dT < 1e-6, dT     # f64 on CPU: bit-level-ish agreement


def test_dist_gba_2d_on_real_map(mesh2d):
    """kf-block GBA over the (host, device) mesh reduces landmark error
    and stays finite (the exact sharded solve under the 2-axis layout)."""
    cam = make_camera()
    world = World(n_pts=260, n_ls=12, seed=9)
    cfg = MapConfig(ba_points=512, ba_lines=64, ba_pobs=8192, ba_lobs=512)
    mapper = MapHandler(cam, cfg)
    poses = lateral_poses(12, step=0.04)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    mp = mapper.map
    rng = np.random.default_rng(1)
    eligible = np.where(mp.pt_valid & (mp.pt_nobs >= 2))[0]
    truth = mp.pt_w[eligible].copy()
    mp.pt_w[eligible] = truth + rng.normal(0, 0.03, truth.shape)
    pre = np.median(np.linalg.norm(mp.pt_w[eligible] - truth, axis=1))
    multihost.distributed_gba_2d(mapper, mesh2d)
    post = np.median(np.linalg.norm(mp.pt_w[eligible] - truth, axis=1))
    assert post < 0.5 * pre, (pre, post)
    assert np.isfinite(np.stack([k.T_w_k for k in mp.keyframes])).all()
