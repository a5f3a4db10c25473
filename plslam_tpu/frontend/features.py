"""Fixed-capacity feature containers (struct-of-arrays pytrees).

The reference stores features as vectors of heap-allocated PointFeature /
LineFeature objects (include2/stereoFeatures.h:30-129).  Here each frame's
features live in padded arrays with validity masks so the whole tracking
pipeline is one fixed-shape XLA program.

``sigma2`` follows the reference convention (stereoFeatures.cpp:41-56):
inverse variance weight scale_factor^(-2*level) for a feature detected at
pyramid ``level``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PointSet(NamedTuple):
    """Stereo-matched point features of one frame."""

    uv: jax.Array        # (N, 2) left-image pixel
    disp: jax.Array      # (N,) stereo disparity
    P: jax.Array         # (N, 3) back-projected 3D point (camera frame)
    desc: jax.Array      # (N, 8) uint32 packed 256-bit descriptor
    sigma2: jax.Array    # (N,) inverse-variance pyramid weight
    valid: jax.Array     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]

    @classmethod
    def empty(cls, n: int, dtype=jnp.float32) -> "PointSet":
        return cls(
            uv=jnp.zeros((n, 2), dtype),
            disp=jnp.ones((n,), dtype),
            P=jnp.zeros((n, 3), dtype),
            desc=jnp.zeros((n, 8), jnp.uint32),
            sigma2=jnp.ones((n,), dtype),
            valid=jnp.zeros((n,), bool),
        )


class LineSet(NamedTuple):
    """Stereo-matched line-segment features of one frame."""

    sp: jax.Array        # (N, 2) start point (left image)
    ep: jax.Array        # (N, 2) end point
    sdisp: jax.Array     # (N,) disparity at start point
    edisp: jax.Array     # (N,) disparity at end point
    sP: jax.Array        # (N, 3) 3D start point
    eP: jax.Array        # (N, 3) 3D end point
    le: jax.Array        # (N, 3) image line equation, ||(a,b)|| = 1
    angle: jax.Array     # (N,) segment angle
    NDc: jax.Array       # (N, 6) Pluecker line in this camera frame
    desc: jax.Array      # (N, 8) uint32 packed LBD descriptor
    sigma2: jax.Array    # (N,)
    valid: jax.Array     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.sp.shape[0]

    @classmethod
    def empty(cls, n: int, dtype=jnp.float32) -> "LineSet":
        return cls(
            sp=jnp.zeros((n, 2), dtype),
            ep=jnp.zeros((n, 2), dtype),
            sdisp=jnp.ones((n,), dtype),
            edisp=jnp.ones((n,), dtype),
            sP=jnp.zeros((n, 3), dtype),
            eP=jnp.zeros((n, 3), dtype),
            le=jnp.zeros((n, 3), dtype),
            angle=jnp.zeros((n,), dtype),
            NDc=jnp.zeros((n, 6), dtype),
            desc=jnp.zeros((n, 8), jnp.uint32),
            sigma2=jnp.ones((n,), dtype),
            valid=jnp.zeros((n,), bool),
        )


class StereoFeatures(NamedTuple):
    """All features of one stereo frame (the array-ized StereoFrame)."""

    points: PointSet
    lines: LineSet


class TrackedPoints(NamedTuple):
    """Frame-to-frame point correspondences feeding pose optimization.

    Mirrors matched_pt (stereoFrameHandler.cpp:144-152): 3D point P in the
    *previous* frame paired with its observed pixel in the *current* frame.
    """

    P: jax.Array         # (N, 3) 3D in prev frame
    obs: jax.Array       # (N, 2) observed pixel in curr frame
    sigma2: jax.Array    # (N,)
    valid: jax.Array     # (N,) candidate mask (never changes in a solve)
    inlier: jax.Array    # (N,) inlier mask (updated by outlier rejection)


class TrackedLines(NamedTuple):
    """Frame-to-frame line correspondences (matched_ls,
    stereoFrameHandler.cpp:166-180)."""

    sP: jax.Array        # (N, 3) 3D endpoints in prev frame
    eP: jax.Array
    sp: jax.Array        # (N, 2) prev-frame 2D endpoints (overlap weight)
    ep: jax.Array
    NDc: jax.Array       # (N, 6) Pluecker line in prev camera frame
    sobs: jax.Array      # (N, 2) observed 2D endpoints in curr frame
    eobs: jax.Array
    le_obs: jax.Array    # (N, 3) observed image-line equation in curr frame
    sigma2: jax.Array
    valid: jax.Array
    inlier: jax.Array
