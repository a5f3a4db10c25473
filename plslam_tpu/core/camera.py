"""Rectified pinhole stereo camera model.

Behavioral spec: reference ``src2/pinholeStereoCamera.cpp`` (projection :235,
backProjection :225, backProjection_unit :215, the Pluecker line-projection
intrinsic K_L :123-125) — re-expressed as a JAX pytree of scalars so every
geometric op is batched and jit-friendly.

The rectification maps themselves are computed on the host once per dataset
(io/rectify.py); on-device remap is ops/remap.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StereoCamera(NamedTuple):
    """Intrinsics of an ideal (rectified, horizontal) stereo pair."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    b: jax.Array  # baseline in meters
    width: int = 752
    height: int = 480

    @classmethod
    def create(cls, fx, fy, cx, cy, b, width=752, height=480, dtype=jnp.float32):
        c = jnp.asarray
        return cls(
            c(fx, dtype=dtype), c(fy, dtype=dtype), c(cx, dtype=dtype),
            c(cy, dtype=dtype), c(b, dtype=dtype), int(width), int(height),
        )

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    @property
    def plucker_K(self) -> jax.Array:
        """Line-projection intrinsic K_L (pinholeStereoCamera.cpp:123-125):

        K_L = [[fy, 0, 0], [0, fx, 0], [-fy*cx, -fx*cy, fx*fy]]

        so that the image line is l = K_L @ n_c for a camera-frame Pluecker
        moment n_c.
        """
        z = jnp.zeros_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fy, z, z]),
                jnp.stack([z, self.fx, z]),
                jnp.stack([-self.fy * self.cx, -self.fx * self.cy, self.fx * self.fy]),
            ]
        )

    def project(self, P: jax.Array) -> jax.Array:
        """3D camera-frame point(s) -> pixel (u, v) (projection :235)."""
        return jnp.stack(
            [
                self.cx + self.fx * P[..., 0] / P[..., 2],
                self.cy + self.fy * P[..., 1] / P[..., 2],
            ],
            axis=-1,
        )

    def back_project(self, uv: jax.Array, disp: jax.Array) -> jax.Array:
        """Pixel + disparity -> 3D point (backProjection :225).

        depth = b*fx/disp.  The reference divides both pixel offsets by fx
        (valid only when fx == fy, which holds for its rectified data); here
        the y term uses fy so the model is exact for fx != fy too.
        """
        depth = self.b * self.fx / disp
        return jnp.stack(
            [
                depth * (uv[..., 0] - self.cx) / self.fx,
                depth * (uv[..., 1] - self.cy) / self.fy,
                depth,
            ],
            axis=-1,
        )

    def back_project_unit(self, uv: jax.Array) -> jax.Array:
        """Pixel -> normalized-plane ray [x, y, 1] (backProjection_unit :215)."""
        return jnp.stack(
            [
                (uv[..., 0] - self.cx) / self.fx,
                (uv[..., 1] - self.cy) / self.fy,
                jnp.ones_like(uv[..., 0]),
            ],
            axis=-1,
        )

    def project_line(self, L_cam: jax.Array) -> jax.Array:
        """Camera-frame Pluecker line -> 2D image line l = K_L n (homogeneous)."""
        return jnp.einsum("ij,...j->...i", self.plucker_K, L_cam[..., :3])


def euroc_default_camera(dtype=jnp.float32) -> StereoCamera:
    """Rectified EuRoC MAV intrinsics (values after cv2.stereoRectify of the
    shipped euroc_params.yaml calibration; used for synthetic tests)."""
    return StereoCamera.create(
        fx=435.2, fy=435.2, cx=367.4, cy=252.2, b=0.110074, width=752, height=480,
        dtype=dtype,
    )
