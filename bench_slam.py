"""Secondary benchmark: full SLAM pipeline (tracking + threaded mapping +
local BA) frames/s, and local-BA solver iterations/s, on the available
accelerator.  bench.py remains the headline single metric; this script
prints one JSON line per metric for the BASELINE.md table.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from plslam_tpu.backend import ba as ba_mod
from plslam_tpu.backend.mapping import MapConfig
from plslam_tpu.config import PLSLAMConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.pipeline import PLSLAM

N_FRAMES = 16


def bench_slam():
    scene = SyntheticScene(n_points=600, n_lines=60, seed=0,
                           width=752, height=480,
                           fx=435.2, fy=435.2, cx=367.4, cy=252.2)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy,
                              scene.b, width=scene.width, height=scene.height)
    cfg = PLSLAMConfig(orb_nfeatures=1200, lsd_nfeatures=256,
                       min_entropy_ratio=0.99)   # KF-heavy: stress mapping
    slam = PLSLAM(cam, cfg, MapConfig(local_ba_kf=8, ba_points=2048,
                                      ba_lines=256, ba_pobs=8192,
                                      ba_lobs=2048))
    poses = circular_trajectory(N_FRAMES + 4, step_t=0.05)
    frames = [scene.render_stereo(T, noise=1.0) for T in poses]
    dev = [(jnp.asarray(il), jnp.asarray(ir)) for il, ir in frames]
    # warmup (compiles)
    for i in range(4):
        slam.process(*dev[i], timestamp=0.05 * i)
    slam.wait_until_idle()
    t0 = time.time()
    for i in range(4, 4 + N_FRAMES):
        slam.process(*dev[i], timestamp=0.05 * i)
    slam.wait_until_idle()
    dt = time.time() - t0
    n_kf = len(slam.mapper.map.keyframes)
    slam.finish(run_gba=False)
    return N_FRAMES / dt, n_kf


def bench_ba_iters():
    """LM iterations/s of the Schur-complement local BA at the default
    local-map problem size."""
    import sys
    sys.path.insert(0, ".")
    from tests.test_ba import make_problem

    prob, _, _, _ = make_problem(K=8, P=512, L=64)
    prob = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
        prob)
    cfg = ba_mod.BAConfig()
    run = jax.jit(lambda p: ba_mod.lm_rounds(p, _CAM32, cfg, p.p_valid,
                                             p.l_valid, 10))
    r = run(prob)
    np.asarray(jax.tree.leaves(r)[0])
    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        r = run(prob)
    np.asarray(jax.tree.leaves(r)[0])
    return 10 * n_rep / (time.time() - t0)


_CAM32 = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074,
                             dtype=jnp.float32)


def main():
    fps, n_kf = bench_slam()
    print(json.dumps({"metric": "full_slam_frames_per_s",
                      "value": round(fps, 3), "unit": "frames/s",
                      "vs_baseline": round(fps / 20.0, 3)}))
    iters = bench_ba_iters()
    print(json.dumps({"metric": "local_ba_lm_iterations_per_s",
                      "value": round(iters, 2), "unit": "iters/s",
                      "vs_baseline": None}))
    print(f"# keyframes mapped during bench: {n_kf}")


if __name__ == "__main__":
    main()
