"""Native C++ ATE tool vs the python evaluator."""

import json
import os
import subprocess
import tempfile

import numpy as np
import pytest

from plslam_tpu.io.trajectory import ate_rmse, save_tum

TOOL = os.path.join(os.path.dirname(__file__), "..", "plslam_tpu", "native",
                    "evaluate_ate")


@pytest.fixture(scope="module", autouse=True)
def build_tool():
    if not os.path.exists(TOOL):
        subprocess.run(["make", "-C", os.path.dirname(TOOL), "evaluate_ate"],
                       check=True)


def _traj(n, seed, drift=0.0):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, 3] = pos + drift * np.arange(n)[:, None] * np.array([1, 0, 0])
    return T


def test_native_matches_python():
    gt = _traj(40, 0)
    est = _traj(40, 0, drift=0.01)
    # rigidly rotate the estimate: alignment must remove it
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    est_r = est.copy()
    est_r[:, :3, 3] = est[:, :3, 3] @ R.T + np.array([1.0, -2.0, 0.5])
    ts = 0.05 * np.arange(40)
    with tempfile.TemporaryDirectory() as d:
        pe = os.path.join(d, "est.txt")
        pg = os.path.join(d, "gt.txt")
        save_tum(pe, ts, est_r)
        save_tum(pg, ts, gt)
        out = subprocess.run([TOOL, pe, pg], capture_output=True, text=True,
                             check=True)
        r = json.loads(out.stdout)
    want = ate_rmse(est_r[:, :3, 3], gt[:, :3, 3], align=True)
    assert r["n_pairs"] == 40
    assert abs(r["ate_rmse"] - want) < 1e-4, (r, want)


def test_native_no_align():
    gt = _traj(20, 1)
    est = gt.copy()
    est[:, 0, 3] += 0.5  # constant offset
    ts = 0.05 * np.arange(20)
    with tempfile.TemporaryDirectory() as d:
        pe, pg = os.path.join(d, "e.txt"), os.path.join(d, "g.txt")
        save_tum(pe, ts, est)
        save_tum(pg, ts, gt)
        out = subprocess.run([TOOL, pe, pg, "--no-align"],
                             capture_output=True, text=True, check=True)
        r = json.loads(out.stdout)
    assert abs(r["ate_rmse"] - 0.5) < 1e-6
