"""Per-frame diagnosis overlay (plotStereoFrame analog): the pipeline flag
must produce overlay PNGs + a residual JSONL without touching tracking."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("matplotlib")


def test_overlay_stream(tmp_path):
    from plslam_tpu.config import PLSLAMConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
    from plslam_tpu.pipeline import PLSLAM

    scene = SyntheticScene(n_points=260, n_lines=32, seed=2)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy,
                              scene.b, width=scene.width,
                              height=scene.height)
    import dataclasses

    cfg = dataclasses.replace(
        PLSLAMConfig(orb_nfeatures=512, lsd_nfeatures=64, orb_fast_th=15,
                     multithread_slam=False),
        overlay_every=2, overlay_dir=str(tmp_path / "ov"))
    slam = PLSLAM(cam, cfg)
    for i, T in enumerate(circular_trajectory(6, step_t=0.05)):
        il, ir = scene.render_stereo(T, noise=1.0)
        slam.process(jnp.asarray(il), jnp.asarray(ir), 0.05 * i)
    slam.finish(run_gba=False)

    pngs = sorted(os.listdir(tmp_path / "ov"))
    assert any(p.endswith(".png") for p in pngs), pngs
    recs = [json.loads(l) for l in
            open(tmp_path / "ov" / "residuals.jsonl")]
    assert recs and all("pt" in r and "ls" in r for r in recs)
    # tracked inliers carry finite residuals
    some = [v for r in recs for (_, v, inl) in r["pt"] if inl]
    assert some and all(np.isfinite(v) for v in some)
