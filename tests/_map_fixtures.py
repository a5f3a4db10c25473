"""Hand-controlled synthetic worlds rendered straight into StereoFeatures.

Unlike io.synthetic (which rasterizes images and runs the full front-end),
these fixtures project known 3D landmarks with unique random descriptors, so
mapping-layer tests control exactly which keyframes co-observe what.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.frontend.features import LineSet, PointSet, StereoFeatures

WIDTH, HEIGHT = 752, 480


def make_camera(dtype=jnp.float32) -> StereoCamera:
    return StereoCamera.create(458.0, 457.0, 376.0, 240.0, 0.11,
                               width=WIDTH, height=HEIGHT, dtype=dtype)


class World:
    """Random 3D points and segments in front of the origin camera."""

    def __init__(self, n_pts: int = 120, n_ls: int = 12, seed: int = 3,
                 depth=(4.0, 9.0), spread=3.0):
        rng = np.random.default_rng(seed)
        self.pts = np.stack([
            rng.uniform(-spread, spread, n_pts),
            rng.uniform(-spread * 0.6, spread * 0.6, n_pts),
            rng.uniform(depth[0], depth[1], n_pts)], axis=-1)
        self.pt_desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
        A = np.stack([
            rng.uniform(-spread, spread, n_ls),
            rng.uniform(-spread * 0.6, spread * 0.6, n_ls),
            rng.uniform(depth[0], depth[1], n_ls)], axis=-1)
        B = A + np.stack([rng.uniform(-1.5, 1.5, n_ls),
                          rng.uniform(-1.5, 1.5, n_ls),
                          rng.uniform(-0.4, 0.4, n_ls)], axis=-1)
        self.ls_A, self.ls_B = A, B
        self.ls_desc = rng.integers(0, 2 ** 32, (n_ls, 8), dtype=np.uint32)


def render_features(world: World, T_w_c: np.ndarray,
                    cam: StereoCamera) -> StereoFeatures:
    """Project the world into the camera at T_w_c (camera->world)."""
    T_c_w = np.linalg.inv(T_w_c)
    R, t = T_c_w[:3, :3], T_c_w[:3, 3]
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)

    def proj(Pw):
        Pc = Pw @ R.T + t
        z = np.maximum(Pc[:, 2], 1e-9)
        uv = np.stack([cx + fx * Pc[:, 0] / z, cy + fy * Pc[:, 1] / z], -1)
        ok = ((Pc[:, 2] > 0.1) & (uv[:, 0] >= 8) & (uv[:, 0] < WIDTH - 8)
              & (uv[:, 1] >= 8) & (uv[:, 1] < HEIGHT - 8))
        return Pc, uv, ok

    Pc, uv, ok = proj(world.pts)
    n = len(world.pts)
    points = PointSet(
        uv=jnp.asarray(uv, jnp.float32),
        disp=jnp.ones(n, jnp.float32),
        P=jnp.asarray(Pc, jnp.float32),
        desc=jnp.asarray(world.pt_desc),
        sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.asarray(ok),
    )

    aC, auv, aok = proj(world.ls_A)
    bC, buv, bok = proj(world.ls_B)
    lok = aok & bok
    le = np.cross(np.concatenate([auv, np.ones((len(auv), 1))], 1),
                  np.concatenate([buv, np.ones((len(buv), 1))], 1))
    nrm = np.hypot(le[:, 0], le[:, 1])
    le = le / np.maximum(nrm, 1e-9)[:, None]
    NDc = np.concatenate([np.cross(aC, bC), bC - aC], axis=-1)
    m = len(world.ls_A)
    lines = LineSet(
        sp=jnp.asarray(auv, jnp.float32), ep=jnp.asarray(buv, jnp.float32),
        sdisp=jnp.ones(m, jnp.float32), edisp=jnp.ones(m, jnp.float32),
        sP=jnp.asarray(aC, jnp.float32), eP=jnp.asarray(bC, jnp.float32),
        le=jnp.asarray(le, jnp.float32),
        angle=jnp.asarray(np.arctan2(buv[:, 1] - auv[:, 1],
                                     buv[:, 0] - auv[:, 0]), jnp.float32),
        NDc=jnp.asarray(NDc, jnp.float32),
        desc=jnp.asarray(world.ls_desc),
        sigma2=jnp.ones(m, jnp.float32),
        valid=jnp.asarray(lok),
    )
    return StereoFeatures(points=points, lines=lines)


class RingWorld:
    """A large shared world along a circular corridor: points and segments
    scattered on an outer cylindrical wall.  Every pose on the ring sees a
    local subset, so consecutive keyframes genuinely co-observe (covis
    graph, local maps, Map2KF reobservation) and a full revolution is a
    genuine revisit (loop closure at reference-scale gating)."""

    def __init__(self, n_pts: int = 3000, n_ls: int = 300, seed: int = 5,
                 radius: float = 8.0, depth=(3.0, 8.0), height: float = 2.5):
        rng = np.random.default_rng(seed)
        self.radius = radius
        phi = rng.uniform(0, 2 * np.pi, n_pts)
        rp = radius + rng.uniform(depth[0], depth[1], n_pts)
        self.pts = np.stack([rp * np.cos(phi),
                             rng.uniform(-height, height, n_pts),
                             rp * np.sin(phi)], axis=-1)
        self.pt_desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
        phi = rng.uniform(0, 2 * np.pi, n_ls)
        rl = radius + rng.uniform(depth[0], depth[1], n_ls)
        A = np.stack([rl * np.cos(phi),
                      rng.uniform(-height, height, n_ls),
                      rl * np.sin(phi)], axis=-1)
        # wall-tangent segments (mix of horizontal and vertical)
        tang = np.stack([-np.sin(phi), np.zeros(n_ls), np.cos(phi)], -1)
        vert = np.stack([np.zeros(n_ls), np.ones(n_ls), np.zeros(n_ls)], -1)
        is_v = rng.uniform(size=n_ls) < 0.4
        d = np.where(is_v[:, None], vert, tang)
        B = A + d * rng.uniform(0.8, 2.0, n_ls)[:, None]
        self.ls_A, self.ls_B = A, B
        self.ls_desc = rng.integers(0, 2 ** 32, (n_ls, 8), dtype=np.uint32)

    def pose_at(self, theta: float) -> np.ndarray:
        """Camera->world pose on the ring at angle theta, looking radially
        outward (z = outward, y = world +y i.e. image-down, x = y cross z)."""
        p = self.radius * np.array([np.cos(theta), 0.0, np.sin(theta)])
        z = np.array([np.cos(theta), 0.0, np.sin(theta)])
        y = np.array([0.0, 1.0, 0.0])
        x = np.cross(y, z)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, p
        return T


_RING_DESC_RNG = np.random.default_rng(1234)


def _desc_noise(desc: np.ndarray, n_bits: int) -> np.ndarray:
    """Flip ``n_bits`` random bits per 256-bit descriptor — real binary
    descriptors vary a few bits between sightings of the same feature.
    Without this, identical descriptors saturate BoW scores at the exact
    revisit KF (score 2.0) while neighbors stay far below the
    0.8*best temporal-support bar (lookForLoopCandidates :4286), so a
    SHARP vocabulary paradoxically kills every loop candidate."""
    if n_bits <= 0 or not len(desc):
        return desc
    out = desc.copy()
    words = _RING_DESC_RNG.integers(0, 8, (len(desc), n_bits))
    bits = _RING_DESC_RNG.integers(0, 32, (len(desc), n_bits))
    for j in range(n_bits):
        out[np.arange(len(desc)), words[:, j]] ^= (
            np.uint32(1) << bits[:, j].astype(np.uint32))
    return out


def render_ring_features(world: RingWorld, T_w_c: np.ndarray,
                         cam: StereoCamera, cap_pt: int = 160,
                         cap_ls: int = 24,
                         desc_noise_bits: int = 6) -> StereoFeatures:
    """Project the ring world into the camera and keep the ``cap`` features
    closest to the image center, padded to fixed capacity.  Feature slot ->
    world-id association changes per KF, so descriptor matching does real
    work (unlike render_features' fixed slots).  Each sighting's
    descriptor gets ``desc_noise_bits`` random bit flips (see
    _desc_noise)."""
    T_c_w = np.linalg.inv(T_w_c)
    R, t = T_c_w[:3, :3], T_c_w[:3, 3]
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    bl = float(cam.b)

    def proj(Pw):
        Pc = Pw @ R.T + t
        z = np.maximum(Pc[:, 2], 1e-9)
        uv = np.stack([cx + fx * Pc[:, 0] / z, cy + fy * Pc[:, 1] / z], -1)
        ok = ((Pc[:, 2] > 0.5) & (uv[:, 0] >= 8) & (uv[:, 0] < WIDTH - 8)
              & (uv[:, 1] >= 8) & (uv[:, 1] < HEIGHT - 8))
        return Pc, uv, ok

    Pc, uv, ok = proj(world.pts)
    d2 = (uv[:, 0] - cx) ** 2 + (uv[:, 1] - cy) ** 2
    d2[~ok] = np.inf
    sel = np.argsort(d2)[:cap_pt]
    sel = sel[np.isfinite(d2[sel])]
    n = len(sel)
    p_uv = np.zeros((cap_pt, 2), np.float32)
    p_P = np.zeros((cap_pt, 3), np.float32)
    p_desc = np.zeros((cap_pt, 8), np.uint32)
    p_disp = np.ones(cap_pt, np.float32)
    p_uv[:n] = uv[sel]
    p_P[:n] = Pc[sel]
    p_desc[:n] = _desc_noise(world.pt_desc[sel], desc_noise_bits)
    p_disp[:n] = fx * bl / np.maximum(Pc[sel, 2], 1e-9)
    pts = PointSet(
        uv=jnp.asarray(p_uv), disp=jnp.asarray(p_disp), P=jnp.asarray(p_P),
        desc=jnp.asarray(p_desc), sigma2=jnp.ones(cap_pt, jnp.float32),
        valid=jnp.asarray(np.arange(cap_pt) < n))

    aC, auv, aok = proj(world.ls_A)
    bC, buv, bok = proj(world.ls_B)
    lok = aok & bok
    mid2 = ((0.5 * (auv + buv) - np.array([cx, cy])) ** 2).sum(-1)
    mid2[~lok] = np.inf
    lsel = np.argsort(mid2)[:cap_ls]
    lsel = lsel[np.isfinite(mid2[lsel])]
    m = len(lsel)
    l_sp = np.zeros((cap_ls, 2), np.float32)
    l_ep = np.zeros((cap_ls, 2), np.float32)
    l_sP = np.zeros((cap_ls, 3), np.float32)
    l_eP = np.zeros((cap_ls, 3), np.float32)
    l_le = np.zeros((cap_ls, 3), np.float32)
    l_nd = np.zeros((cap_ls, 6), np.float32)
    l_desc = np.zeros((cap_ls, 8), np.uint32)
    if m:
        a2, b2 = auv[lsel], buv[lsel]
        le = np.cross(np.concatenate([a2, np.ones((m, 1))], 1),
                      np.concatenate([b2, np.ones((m, 1))], 1))
        le = le / np.maximum(np.hypot(le[:, 0], le[:, 1]), 1e-9)[:, None]
        l_sp[:m], l_ep[:m] = a2, b2
        l_sP[:m], l_eP[:m] = aC[lsel], bC[lsel]
        l_le[:m] = le
        l_nd[:m] = np.concatenate([np.cross(aC[lsel], bC[lsel]),
                                   bC[lsel] - aC[lsel]], axis=-1)
        l_desc[:m] = _desc_noise(world.ls_desc[lsel], desc_noise_bits)
    ang = np.arctan2(l_ep[:, 1] - l_sp[:, 1], l_ep[:, 0] - l_sp[:, 0])
    lines = LineSet(
        sp=jnp.asarray(l_sp), ep=jnp.asarray(l_ep),
        sdisp=jnp.ones(cap_ls, jnp.float32),
        edisp=jnp.ones(cap_ls, jnp.float32),
        sP=jnp.asarray(l_sP), eP=jnp.asarray(l_eP),
        le=jnp.asarray(l_le), angle=jnp.asarray(ang, jnp.float32),
        NDc=jnp.asarray(l_nd), desc=jnp.asarray(l_desc),
        sigma2=jnp.ones(cap_ls, jnp.float32),
        valid=jnp.asarray(np.arange(cap_ls) < m))
    return StereoFeatures(points=pts, lines=lines)


def lateral_poses(n: int, step: float = 0.05) -> list[np.ndarray]:
    """n camera->world poses translating along +x, identity rotation."""
    out = []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = step * i
        out.append(T)
    return out
