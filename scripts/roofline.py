"""Speed-of-light analysis of the per-frame hot programs on the real chip.

For each of the three per-frame VO programs (point detect+describe, line
detect+LBD, fused match+track) and the local-BA solver, reports:

  - wall time per call, measured by QUEUE THROUGHPUT under forced sync
    (enqueue N calls on distinct inputs, force completion of ALL of them
    through one scalar-reducing fetch, divide by N).  This is the only
    reliable timing on this runtime: ``jax.block_until_ready`` is a no-op
    on the axon tunnel and per-call scalar fetches add ~30 ms of tunnel
    latency that has nothing to do with the chip (verify SKILL.md).
  - XLA's static cost model (compiled.cost_analysis): FLOPs + HBM bytes.
  - achieved GFLOP/s and GB/s, and utilization vs the chip's peaks.

The utilization table this prints backs BASELINE.md's speed-of-light
section (SURVEY.md §5 promised kernel-level analysis; the reference has
only a chrono Timer, src2/timer.cpp).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from plslam_tpu.backend import ba as ba_mod
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.frame import FrontendConfig
from plslam_tpu.frontend.tracker import TrackerConfig
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.vo import VisualOdometry, _match_and_track

# peak numbers for the benched chip (TPU v5 lite / v5e): 197 TFLOP/s bf16
# MXU (f32 ~1/4 of that through the MXU), 819 GB/s HBM
PEAKS = {
    "TPU v5 lite": {"flops_bf16": 197e12, "flops_f32": 49e12, "hbm": 819e9},
}
N = 24


def forced_time(fn, inputs, reducer, n=N):
    """Amortized seconds/call with ALL n executions forced to complete."""
    outs = [fn(x) for x in inputs]
    float(reducer(outs))                      # warm + sync
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    float(reducer(outs))
    return (time.perf_counter() - t0) / n


def cost_of(lowered):
    ca = lowered.compile().cost_analysis()
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    dev = jax.devices()[0]
    peaks = PEAKS.get(dev.device_kind, PEAKS["TPU v5 lite"])
    scene = SyntheticScene(n_points=600, n_lines=60, seed=0,
                           width=752, height=480,
                           fx=435.2, fy=435.2, cx=367.4, cy=252.2)
    cam = StereoCamera.create(scene.fx, scene.fy, scene.cx, scene.cy,
                              scene.b, width=scene.width,
                              height=scene.height)
    fcfg = FrontendConfig(n_points=1200, n_lines=256)
    tcfg = TrackerConfig()
    vo = VisualOdometry(cam, fcfg, tcfg)
    poses = circular_trajectory(3, step_t=0.05)
    il, ir = scene.render_stereo(poses[0], noise=1.0)
    vo.initialize(jnp.asarray(il), jnp.asarray(ir))
    il, ir = scene.render_stereo(poses[1], noise=1.0)
    base = jnp.stack([jnp.asarray(il), jnp.asarray(ir)])
    stacks = [base + 0.01 * i for i in range(N)]
    th = vo.state.fast_th

    rows = []

    # -- stage 1: point detect + describe (batched L/R stack) --
    fn = lambda im: vo._det_pts(im, th)
    red = jax.jit(lambda rs: sum(r[0].score.sum() + r[1].sum() for r in rs))
    t = forced_time(fn, stacks, red)
    fl, by = cost_of(vo._det_pts.lower(base, th))
    rows.append(("point detect+describe", t, fl, by))

    # -- stage 2: line detect + LBD --
    fn = lambda im: vo._det_ls(im)
    red = jax.jit(lambda rs: sum(r[0].sp.sum() + r[1].sum() for r in rs))
    t = forced_time(fn, stacks, red)
    fl, by = cost_of(vo._det_ls.lower(base))
    rows.append(("line detect+LBD", t, fl, by))

    # -- stage 3: fused stereo match + f2f + GN track --
    kp_pair = vo._det_pts(base, th)
    seg_pair = vo._det_ls(base)
    st = vo.state
    fn = lambda kp: _match_and_track(kp, seg_pair, st, cam, fcfg, tcfg,
                                     vo.params)
    kps = [jax.tree.map(lambda x: x, vo._det_pts(s, th)) for s in stacks]
    red = jax.jit(lambda rs: sum(r[0].T_f_w.sum() + r[0].err for r in rs))
    t = forced_time(fn, kps, red)
    fl, by = cost_of(_match_and_track.lower(kp_pair, seg_pair, st, cam,
                                            fcfg, tcfg, vo.params))
    rows.append(("match+f2f+GN track", t, fl, by))

    # -- local BA solver (default local problem size) --
    sys.path.insert(0, ".")
    from tests.test_ba import make_problem

    prob, _, _, _ = make_problem(K=8, P=512, L=64)
    prob = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
        prob)
    cam32 = StereoCamera.create(435.2, 435.2, 367.4, 252.2, 0.110074,
                                dtype=jnp.float32)
    bacfg = ba_mod.BAConfig()
    run = jax.jit(lambda p: ba_mod.lm_rounds(p, cam32, bacfg, p.p_valid,
                                             p.l_valid, 10))
    probs = [jax.tree.map(lambda x: x, prob) for _ in range(N)]
    red = jax.jit(lambda rs: sum(jnp.asarray(
        jax.tree.leaves(r)[0]).sum() for r in rs))
    t = forced_time(run, probs, red)
    fl, by = cost_of(run.lower(prob))
    rows.append(("local BA (10 LM iters, 8KF/512pt/64ls)", t, fl, by))

    print(f"# device: {dev.device_kind}  peaks: "
          f"{peaks['flops_f32']/1e12:.0f} TFLOP/s f32, "
          f"{peaks['hbm']/1e9:.0f} GB/s HBM")
    hdr = (f"{'stage':40s} {'ms':>7s} {'GFLOP':>8s} {'MB':>8s} "
           f"{'GFLOP/s':>9s} {'GB/s':>7s} {'%FLOP':>6s} {'%BW':>5s}")
    print(hdr)
    for name, t, fl, by in rows:
        fr = fl / t
        br = by / t
        print(f"{name:40s} {t*1e3:7.2f} {fl/1e9:8.2f} {by/1e6:8.1f} "
              f"{fr/1e9:9.1f} {br/1e9:7.1f} "
              f"{100*fr/peaks['flops_f32']:6.1f} {100*br/peaks['hbm']:5.1f}")
    tot = sum(r[1] for r in rows[:3])
    print(f"# per-frame device total (3 stages): {tot*1e3:.2f} ms "
          f"-> {1.0/tot:.1f} frames/s compute ceiling")


if __name__ == "__main__":
    main()
