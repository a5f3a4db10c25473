"""Checkpoint/resume: save a populated map, reload it into a fresh
MapHandler, and verify the restored state supports further BA."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from plslam_tpu.backend.mapping import MapConfig, MapHandler
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io.checkpoint import load_map, save_map
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.frontend.frame import FrontendConfig, extract_stereo_features

import jax

CAM_KW = dict(dtype=jnp.float32)


def build_small_map():
    scene = SyntheticScene(seed=9)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy, scene.b,
                              width=scene.width, height=scene.height, **CAM_KW)
    fcfg = FrontendConfig(n_points=256, n_lines=64, fast_th=15.0)
    extract = jax.jit(lambda il, ir: extract_stereo_features(il, ir, cam, fcfg))
    mapper = MapHandler(cam, MapConfig(local_ba_kf=4, ba_points=1024,
                                       ba_pobs=4096))
    poses = circular_trajectory(4, step_t=0.15)
    for i, T in enumerate(poses):
        il, ir = scene.render_stereo(T)
        feats = extract(jnp.asarray(il), jnp.asarray(ir))
        if i == 0:
            mapper.initialize(T, feats)
        else:
            mapper.add_keyframe(T, feats, run_ba=False)
    return cam, mapper


def test_save_load_roundtrip():
    cam, mapper = build_small_map()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "map.npz")
        save_map(path, mapper)
        fresh = MapHandler(cam, mapper.cfg)
        load_map(path, fresh)
        a, b = mapper.map, fresh.map
        assert len(a.keyframes) == len(b.keyframes)
        np.testing.assert_array_equal(a.covis, b.covis)
        np.testing.assert_allclose(a.pt_w, b.pt_w)
        np.testing.assert_array_equal(a.pt_desc, b.pt_desc)
        assert a.pt_obs == b.pt_obs
        assert a.ls_obs == b.ls_obs
        for ka, kb in zip(a.keyframes, b.keyframes):
            np.testing.assert_allclose(ka.T_w_k, kb.T_w_k)
            np.testing.assert_array_equal(ka.pt_lm, kb.pt_lm)


def test_resumed_map_supports_ba():
    cam, mapper = build_small_map()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "map.npz")
        save_map(path, mapper)
        fresh = MapHandler(cam, mapper.cfg)
        load_map(path, fresh)
        res = fresh.local_bundle_adjustment()
        assert res is not None
        assert np.isfinite(float(res.cost))


def test_pipeline_autocheckpoint_and_resume(tmp_path):
    """Auto-checkpoint every N keyframes, then resume into a fresh pipeline
    and keep processing."""
    import jax.numpy as jnp

    from plslam_tpu.backend.mapping import MapConfig
    from plslam_tpu.config import PLSLAMConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
    from plslam_tpu.pipeline import PLSLAM

    scene = SyntheticScene(seed=5)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy,
                              scene.b, width=scene.width, height=scene.height,
                              dtype=jnp.float32)
    cfg = PLSLAMConfig(orb_nfeatures=512, lsd_nfeatures=128, orb_fast_th=15,
                       min_entropy_ratio=0.99, multithread_slam=False,
                       checkpoint_every_kf=2,
                       checkpoint_dir=str(tmp_path / "ckpt"))
    mc = MapConfig(local_ba_kf=8, ba_points=2048, ba_lines=256,
                   ba_pobs=8192, ba_lobs=2048)
    slam = PLSLAM(cam, cfg, mc)
    poses = circular_trajectory(6, step_t=0.12, step_r=0.015)
    for i, T in enumerate(poses):
        il, ir = scene.render_stereo(T)
        slam.process(jnp.asarray(il), jnp.asarray(ir), timestamp=0.05 * i)
    slam.finish(run_gba=False)
    ckpts = sorted((tmp_path / "ckpt").glob("map_kf*.npz"))
    assert len(ckpts) >= 1

    # resume: load the newest checkpoint into a fresh pipeline and run GBA
    slam2 = PLSLAM(cam, PLSLAMConfig(multithread_slam=False), mc)
    slam2.load_checkpoint(str(ckpts[-1]))
    n_kf = len(slam2.mapper.map.keyframes)
    assert n_kf >= 2
    if n_kf >= 3:
        slam2.global_bundle_adjustment()
    traj = slam2.keyframe_trajectory()
    assert len(traj) == n_kf


def test_loop_closer_state_roundtrip(tmp_path):
    """Vocabulary, BoW records, and conf matrix survive a checkpoint so
    resume neither retrains k-means nor rescans O(K^2) pairs."""
    import os

    import jax.numpy as jnp

    from plslam_tpu.backend import vocab as vocab_mod
    from plslam_tpu.backend.loop import LoopCloser, LoopConfig
    from plslam_tpu.io.checkpoint import load_map, save_map

    cam, mapper = build_small_map()
    lc = LoopCloser(cam, mapper, LoopConfig(vocab_k=4, vocab_depth=2))
    # force online training on the (small) map corpus
    descs = np.concatenate([kf.pt_desc[kf.pt_valid]
                            for kf in mapper.map.keyframes])
    lc.voc = vocab_mod.train_vocabulary(descs, k=4, depth=2, iters=2)
    import jax
    voc = lc.voc
    lc._tf = jax.jit(lambda d, v: vocab_mod.transform(voc, d, v))
    lc.bow = [lc._bow_of(kf) for kf in mapper.map.keyframes]
    k = len(lc.bow)
    lc.conf = np.arange(k * k, dtype=np.float32).reshape(k, k)
    lc.closed_at = 7

    path = os.path.join(tmp_path, "map.npz")
    save_map(path, mapper, loop_closer=lc)

    fresh_mapper = type(mapper)(cam, mapper.cfg)
    fresh_lc = LoopCloser(cam, fresh_mapper, LoopConfig(vocab_k=4,
                                                        vocab_depth=2))
    load_map(path, fresh_mapper, loop_closer=fresh_lc)
    assert fresh_lc.voc is not None
    assert fresh_lc.closed_at == 7
    np.testing.assert_array_equal(fresh_lc.conf, lc.conf)
    assert len(fresh_lc.bow) == k
    np.testing.assert_allclose(fresh_lc.bow[0]["p"], lc.bow[0]["p"])
    # _ensure_vocab must be a no-op now (no retraining)
    assert fresh_lc._ensure_vocab() is True
    # and the restored vocabulary transforms identically
    kf = fresh_mapper.map.keyframes[0]
    a = np.asarray(fresh_lc._tf(jnp.asarray(kf.pt_desc),
                                jnp.asarray(kf.pt_valid)))
    b = np.asarray(lc._tf(jnp.asarray(kf.pt_desc),
                          jnp.asarray(kf.pt_valid)))
    np.testing.assert_allclose(a, b)
