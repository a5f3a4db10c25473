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
