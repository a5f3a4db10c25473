"""scripts/run_euroc.py end-to-end on a rendered KITTI-layout dataset with
the reference's actual kitti00-02.yaml parameter file."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.join(os.path.dirname(__file__), "..")
KITTI_PARAMS = "/root/reference/config/dataset_params/kitti00-02.yaml"


@pytest.mark.skipif(not os.path.exists(KITTI_PARAMS),
                    reason="reference params not mounted")
def test_cli_runs_kitti_layout(tmp_path):
    from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory

    for sub in ("image_2", "image_3"):
        (tmp_path / sub).mkdir()
    scene = SyntheticScene(n_points=400, n_lines=40, seed=1,
                           width=1241, height=376, fx=718.856, fy=718.856,
                           cx=607.1928, cy=185.2157, baseline=0.537165719)
    for i, T in enumerate(circular_trajectory(6, step_t=0.08)):
        il, ir = scene.render_stereo(T)
        cv2.imwrite(str(tmp_path / "image_2" / f"{i:06d}.png"),
                    il.astype(np.uint8))
        cv2.imwrite(str(tmp_path / "image_3" / f"{i:06d}.png"),
                    ir.astype(np.uint8))
    out = tmp_path / "traj.txt"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_euroc.py"),
         str(tmp_path), "--params", KITTI_PARAMS, "--out", str(out),
         "--no-gba"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-1500:]
    lines = out.read_text().strip().splitlines()
    assert len(lines) >= 2
    assert len(lines[0].split()) == 8  # TUM: t x y z qx qy qz qw
