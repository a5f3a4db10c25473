"""Line-matching quality harness: wrong-match rate of LBD f2f matching on
rendered synthetic scenes with known 3D line ground truth.

For each of several scenes/motions: detect+describe lines in two views,
match with the production f2f gating, then associate every detected
segment to its ground-truth 3D line (projected angle + midpoint distance).
A match is CORRECT when both segments map to the same GT line.  Prints
per-config precision/recall-style counts so descriptor changes can be
judged quantitatively (round-1 review weak #8: patch-LBD wrong-match rate
visible on low-texture scenes).

Run on CPU: JAX_PLATFORMS=cpu python scripts/line_match_quality.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from plslam_tpu.frontend.frame import FrontendConfig, _detect_describe_lines
from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory
from plslam_tpu.ops import matching as M


def _gt_assoc(scene, T_w_c, sp, ep, valid, ang_tol=0.12, dist_tol=3.5):
    """Greedy association of detected segments to GT lines in one view.
    Returns (K,) GT index or -1."""
    T_c_w = np.linalg.inv(T_w_c)
    ua, va, za = scene.project(T_c_w, scene.LA)
    ub, vb, zb = scene.project(T_c_w, scene.LB)
    front = (za > 0.3) & (zb > 0.3)
    ga = np.stack([ua, va], -1)
    gb = np.stack([ub, vb], -1)
    gd = gb - ga
    gn = np.linalg.norm(gd, axis=-1)
    gdir = gd / np.maximum(gn[:, None], 1e-9)

    out = np.full(len(sp), -1, np.int64)
    mid = 0.5 * (np.asarray(sp) + np.asarray(ep))
    ddet = np.asarray(ep) - np.asarray(sp)
    ddet = ddet / np.maximum(np.linalg.norm(ddet, axis=-1, keepdims=True),
                             1e-9)
    for i in range(len(sp)):
        if not valid[i]:
            continue
        cosang = np.abs(ddet[i] @ gdir.T)
        rel = mid[i] - ga
        # distance of detected midpoint to the GT infinite line
        dist = np.abs(rel[:, 0] * (-gdir[:, 1]) + rel[:, 1] * gdir[:, 0])
        # and the midpoint must project inside the GT span (+ margin)
        t = rel[:, 0] * gdir[:, 0] + rel[:, 1] * gdir[:, 1]
        inside = (t > -10) & (t < gn + 10)
        cand = front & inside & (cosang > np.cos(ang_tol)) & (dist < dist_tol)
        if cand.any():
            out[i] = int(np.argmin(np.where(cand, dist, 1e9)))
    return out


def _make_mask(mode, cfg, sa, sb):
    """Candidate-window variants: 'full' = symmetric point-to-segment
    (production, the LineIterator full-raster analog), 'oneside' = the r3
    behavior (endpoints of set 1 vs segment 2 only), 'midpoint' = midpoint
    rectangle windows (the r3 fused-association behavior)."""
    import jax.numpy as jnp

    if mode == "full":
        return M.line_pair_mask(sa.sp, sa.ep, sb.sp, sb.ep,
                                sa.valid, sb.valid,
                                radius=cfg.line_window,
                                min_dir_cos=cfg.line_sim_th)
    v1 = sa.ep - sa.sp
    v2 = sb.ep - sb.sp
    n1 = jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-12)
    n2 = jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-12)
    cos = jnp.abs((v1 / n1) @ (v2 / n2).T)
    if mode == "oneside":
        r2 = cfg.line_window ** 2
        near = ((M._point_segment_dist2(sa.sp, sb.sp, sb.ep) <= r2)
                | (M._point_segment_dist2(sa.ep, sb.sp, sb.ep) <= r2))
    else:  # midpoint
        near = M.window_pair_mask(
            0.5 * (sa.sp + sa.ep), 0.5 * (sb.sp + sb.ep),
            sa.valid, sb.valid, cfg.line_window, cfg.line_window)
    return (near & (cos >= cfg.line_sim_th)
            & sa.valid[:, None] & sb.valid[None, :])


def run(cfg: FrontendConfig, n_scenes=6, n_steps=3, label="",
        long_lines=False, mask_mode="full", twoway_px=0.0):
    det = jax.jit(lambda im: _detect_describe_lines(im, cfg))
    match = jax.jit(lambda da, db, mask: M.match_descriptors(
        da, db, mask, 0.9))
    tot_m, tot_ok, tot_det = 0, 0, 0
    for seed in range(n_scenes):
        scene = SyntheticScene(n_points=250, n_lines=48, seed=seed)
        if long_lines:
            # stretch every 3D segment 3x about its midpoint: long image
            # segments are where midpoint/one-sided windows lose candidates
            mid = 0.5 * (scene.LA + scene.LB)
            scene.LA = mid + 3.0 * (scene.LA - mid)
            scene.LB = mid + 3.0 * (scene.LB - mid)
        poses = circular_trajectory(n_steps + 1, step_t=0.07, step_r=0.012)
        views = []
        for T in poses:
            il, _ = scene.render_stereo(T, noise=1.5)
            seg, desc = det(jnp.asarray(il))
            gt = _gt_assoc(scene, T, seg.sp, seg.ep, np.asarray(seg.valid))
            views.append((seg, desc, gt, T))
        for (sa, da, ga, _), (sb, db, gb, _) in zip(views, views[1:]):
            mask = _make_mask(mask_mode, cfg, sa, sb)
            res = match(da, db, mask)
            idx = res.idx
            if twoway_px > 0:
                idx = M.line_twoway_gate(sa.sp, sa.ep, sb.sp, sb.ep,
                                         idx, twoway_px)
            idx = np.asarray(idx)
            for i, j in enumerate(idx):
                if j < 0 or ga[i] < 0:
                    continue
                tot_m += 1
                tot_ok += int(ga[i] == gb[j])
            tot_det += int((ga >= 0).sum())
    wrong = tot_m - tot_ok
    print(f"{label:30s} matches={tot_m:4d} correct={tot_ok:4d} "
          f"wrong={wrong:3d} ({100.0 * wrong / max(tot_m, 1):.1f}%) "
          f"gt-visible detections={tot_det}")
    return tot_m, tot_ok


if __name__ == "__main__":
    run(FrontendConfig(), label="baseline (full-segment)")
    run(FrontendConfig(), label="PRODUCTION (+twoway 25px)", twoway_px=25.0)
    run(FrontendConfig(), label="baseline oneside", mask_mode="oneside")
    run(FrontendConfig(), label="baseline midpoint", mask_mode="midpoint")
    run(FrontendConfig(), label="long-lines full-segment", long_lines=True)
    run(FrontendConfig(), label="long-lines +twoway 25px", long_lines=True,
        twoway_px=25.0)
    run(FrontendConfig(), label="long-lines oneside", long_lines=True,
        mask_mode="oneside")
    run(FrontendConfig(), label="long-lines midpoint", long_lines=True,
        mask_mode="midpoint")
