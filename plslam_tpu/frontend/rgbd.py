"""RGB-D feature extraction variant.

Behavioral spec: reference ``src2/stereoFrame.cpp`` extractRGBDFeatures
(:704-850): detect on the intensity image only; read per-feature depth
from the registered depth map; synthesize disparity disp = fx*b/depth
(TUM convention, :752); depth-range gate (Config::rgbdMinDepth/MaxDepth);
lines take per-endpoint depths with the same disparity-ratio filter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import StereoCamera
from ..core.plucker import plane_from_points, plucker_from_planes
from ..ops.image import bilinear_sample
from .features import LineSet, PointSet, StereoFeatures
from .frame import FrontendConfig, _detect_describe_lines, _detect_describe_points


def extract_rgbd_features(
    img: jax.Array,
    depth: jax.Array,
    cam: StereoCamera,
    cfg: FrontendConfig = FrontendConfig(),
    min_depth: float = 0.3,
    max_depth: float = 10.0,
    fast_th=None,
) -> StereoFeatures:
    """Intensity + depth image -> padded feature sets (same containers as
    the stereo path, so the whole tracking/mapping stack runs unchanged)."""
    kp, desc = _detect_describe_points(img, cfg, fast_th)
    d = bilinear_sample(depth, kp.xy)
    ok = kp.valid & (d > min_depth) & (d < max_depth)
    disp = cam.fx * cam.b / jnp.maximum(d, 1e-6)  # :752
    P = cam.back_project(kp.xy, jnp.where(ok, disp, 1.0))
    points = PointSet(
        uv=kp.xy, disp=jnp.where(ok, disp, 1.0), P=P, desc=desc,
        sigma2=jnp.ones(kp.xy.shape[0], img.dtype), valid=ok)

    seg, ldesc = _detect_describe_lines(img, cfg)
    ds = bilinear_sample(depth, seg.sp)
    de = bilinear_sample(depth, seg.ep)
    d_ok = ((ds > min_depth) & (ds < max_depth)
            & (de > min_depth) & (de < max_depth))
    disp_s = cam.fx * cam.b / jnp.maximum(ds, 1e-6)
    disp_e = cam.fx * cam.b / jnp.maximum(de, 1e-6)
    ratio = (jnp.minimum(disp_s, disp_e)
             / jnp.maximum(jnp.maximum(disp_s, disp_e), 1e-9))
    ok_l = seg.valid & d_ok & (ratio >= cfg.ls_min_disp_ratio)
    disp_s = jnp.where(ok_l, disp_s, 1.0)
    disp_e = jnp.where(ok_l, disp_e, 1.0)
    sP = cam.back_project(seg.sp, disp_s)
    eP = cam.back_project(seg.ep, disp_e)
    n = seg.sp.shape[0]
    sph = jnp.concatenate([seg.sp, jnp.ones((n, 1), img.dtype)], axis=-1)
    eph = jnp.concatenate([seg.ep, jnp.ones((n, 1), img.dtype)], axis=-1)
    le = jnp.cross(sph, eph)
    le = le / jnp.maximum(jnp.linalg.norm(le[:, :2], axis=-1, keepdims=True), 1e-9)
    # Pluecker directly through the two back-projected 3D endpoints
    Lc = jnp.concatenate([jnp.cross(sP, eP), eP - sP], axis=-1)
    lines = LineSet(
        sp=seg.sp, ep=seg.ep, sdisp=disp_s, edisp=disp_e, sP=sP, eP=eP,
        le=le, angle=seg.angle, NDc=Lc, desc=ldesc,
        sigma2=jnp.ones(n, img.dtype), valid=ok_l)
    return StereoFeatures(points=points, lines=lines)
