"""Camera model: pinhole intrinsics + reference-frame view matrix.

Equivalent of the reference's GaussianRasterizationSettings construction in
utils/recon_helpers.py:4-27, redesigned as a fully *hashable* NamedTuple of
Python scalars so cameras can be static jit arguments (one compiled program
per resolution, reused across every frame). The OpenGL projection matrix is
not stored: the renderer projects with the same NDC pipeline inline
(opengl_proj @ w2c -> ndc2Pix), including the half-pixel offset.

The SLAM loop always passes camera-frame Gaussians with an identity w2c
(mirroring transform_to_frame + the first-frame camera in the reference);
arbitrary w2c values (viz, offline 3DGS) are supported but each distinct
matrix compiles its own program — pre-transform points instead when
rendering many views.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_IDENTITY4 = ((1.0, 0.0, 0.0, 0.0), (0.0, 1.0, 0.0, 0.0), (0.0, 0.0, 1.0, 0.0), (0.0, 0.0, 0.0, 1.0))


class Camera(NamedTuple):
    """Static, hashable camera description."""

    height: int
    width: int
    fx: float
    fy: float
    cx: float
    cy: float
    w2c: tuple = _IDENTITY4  # nested 4x4 tuple
    near: float = 0.01
    far: float = 100.0

    @property
    def tanfovx(self) -> float:
        return self.width / (2.0 * self.fx)

    @property
    def tanfovy(self) -> float:
        return self.height / (2.0 * self.fy)

    def w2c_array(self) -> jnp.ndarray:
        return jnp.asarray(self.w2c, dtype=jnp.float32)

    def intrinsics_matrix(self) -> np.ndarray:
        k = np.eye(3, dtype=np.float32)
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = self.fx, self.fy, self.cx, self.cy
        return k


def setup_camera(w: int, h: int, k, w2c=None, near: float = 0.01, far: float = 100.0) -> Camera:
    """Build a Camera from intrinsics matrix k (3x3) and w2c (4x4).

    Parity: utils/recon_helpers.py:4-27 (same argument order and defaults).
    """
    k = np.asarray(k)
    if w2c is None:
        w2c_t = _IDENTITY4
    else:
        w2c_t = tuple(tuple(float(v) for v in row) for row in np.asarray(w2c))
    return Camera(
        height=int(h),
        width=int(w),
        fx=float(k[0][0]),
        fy=float(k[1][1]),
        cx=float(k[0][2]),
        cy=float(k[1][2]),
        w2c=w2c_t,
        near=float(near),
        far=float(far),
    )
