"""Per-frame diagnosis overlays — the plotStereoFrame /
plotStereoFrameProjerr analog (reference src2/stereoFrame.cpp:655,
src2/stereoFrameHandler.cpp:1615-1872: match lines and per-term residual
inspection drawn over the frame).

The fused per-frame program keeps tracked sets on device, so the overlay
path RECOMPUTES the f2f association + residuals at the final pose for the
frames it renders (debug cadence, one small fetch per rendered frame) and
draws:

- point features: green = tracked inlier, red = rejected, gray = no match,
  with the f2f motion segment from the previous frame and a per-feature
  reprojection-residual color ramp;
- line features: same classes for segments, residual = max endpoint-to-
  line distance;
- a JSONL residual dump per rendered frame (the optimizePoseDebug analog)
  for offline triage of a bad sequence.

Driven by PLSLAMConfig.overlay_every / ``run_euroc.py --overlay-every N``.
"""

from __future__ import annotations

import json
import os

import numpy as np


def compute_frame_diagnostics(prev_feats, curr_feats, DT, cam, tcfg):
    """Tracked sets + per-feature residuals at the final pose (host copies).

    Returns a dict of numpy arrays: point uv/prev-uv/valid/inlier/residual
    and line sp/ep/valid/inlier/residual."""
    import jax
    import jax.numpy as jnp

    from .frontend import f2f
    from .frontend import tracker as trk

    @jax.jit
    def _diag(prev, curr, DT):
        pts, ls, pidx, lidx = f2f.track_frame_to_frame(prev, curr)
        r_p, _ = trk.point_residuals(DT, pts, cam)
        if tcfg.plucker_lines:
            r_l, _, _, _ = trk.line_residuals_plucker(DT, ls, cam)
        else:
            r_l, _, _, _ = trk.line_residuals_endpoint(DT, ls, cam)
        pts2, ls2 = trk.remove_outliers(DT, pts, ls, cam, tcfg)
        pj = jnp.clip(pidx, 0, curr.points.uv.shape[0] - 1)
        lj = jnp.clip(lidx, 0, curr.lines.sp.shape[0] - 1)
        return dict(
            p_prev=prev.points.uv, p_uv=curr.points.uv[pj],
            p_valid=pts.valid, p_inlier=pts2.inlier & pts.valid,
            p_res=jnp.where(pts.valid, r_p, 0.0),
            l_sp=curr.lines.sp[lj], l_ep=curr.lines.ep[lj],
            l_prev_sp=prev.lines.sp, l_prev_ep=prev.lines.ep,
            l_valid=ls.valid, l_inlier=ls2.inlier & ls.valid,
            l_res=jnp.where(ls.valid, r_l, 0.0),
        )

    out = _diag(prev_feats, curr_feats, jnp.asarray(DT, jnp.float32))
    return {k: np.asarray(v) for k, v in out.items()}


def render_frame_overlay(img, diag: dict, path: str, frame_id: int = 0,
                         res_cap: float = 4.0, title: str | None = None):
    """Draw the overlay onto the (H, W) grayscale frame and save a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(img)
    H, W = img.shape
    fig, ax = plt.subplots(figsize=(W / 96, H / 96), dpi=96)
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    ramp = matplotlib.colormaps["plasma"]

    pv, pi = diag["p_valid"], diag["p_inlier"]
    uv, prev = diag["p_uv"], diag["p_prev"]
    res = diag["p_res"]
    for i in np.where(pv)[0]:
        color = (ramp(min(res[i] / res_cap, 1.0)) if pi[i]
                 else (1.0, 0.15, 0.15, 0.9))
        ax.plot([prev[i, 0], uv[i, 0]], [prev[i, 1], uv[i, 1]],
                "-", lw=0.6, color=color, alpha=0.6)
        ax.plot(uv[i, 0], uv[i, 1], "o", ms=2.4, mec="none", mfc=color)

    lv, li = diag["l_valid"], diag["l_inlier"]
    sp, ep = diag["l_sp"], diag["l_ep"]
    lres = diag["l_res"]
    for i in np.where(lv)[0]:
        color = (ramp(min(lres[i] / res_cap, 1.0)) if li[i]
                 else (1.0, 0.15, 0.15, 0.9))
        ax.plot([sp[i, 0], ep[i, 0]], [sp[i, 1], ep[i, 1]], "-",
                lw=1.6, color=color)

    n_in = int(pi.sum()) + int(li.sum())
    n_tr = int(pv.sum()) + int(lv.sum())
    ax.set_title(title or
                 f"frame {frame_id}: {n_in}/{n_tr} inliers  "
                 f"(res ramp 0..{res_cap:.0f} px, red = rejected)",
                 fontsize=9)
    ax.set_xlim(0, W)
    ax.set_ylim(H, 0)
    ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", pad_inches=0.02)
    plt.close(fig)


def dump_residuals_jsonl(diag: dict, path: str, frame_id: int):
    """Append one JSON line of per-feature residuals (optimizePoseDebug
    analog, stereoFrameHandler.cpp:1699-1872) for offline triage."""
    pv = diag["p_valid"]
    lv = diag["l_valid"]
    rec = {
        "frame": frame_id,
        "pt": [[int(i), round(float(diag["p_res"][i]), 3),
                bool(diag["p_inlier"][i])] for i in np.where(pv)[0]],
        "ls": [[int(i), round(float(diag["l_res"][i]), 3),
                bool(diag["l_inlier"][i])] for i in np.where(lv)[0]],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
