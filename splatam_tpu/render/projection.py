"""Per-Gaussian screen-space preprocessing (EWA splatting), pure JAX.

Reimplements the projection stage of the reference's CUDA rasterizer
(diff-gaussian-rasterization-w-depth, consumed as a pip dep —
requirements.txt:16; call signature at utils/slam_helpers.py:131-138):
view transform, NDC projection with the reference's exact OpenGL-matrix
pipeline (utils/recon_helpers.py:9-13 + ndc2Pix), 3D->2D covariance via the
EWA Jacobian with the 1.3*tanfov clamp, the +0.3 screen-space dilation,
conic/radius computation, and 16x16 tile rectangle extents.

Everything here is differentiable; the render op takes this function's VJP
via jax.vjp instead of hand-deriving gradients (the hand-written part of the
backward pass lives in the compositor only).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # BLOCK_X = BLOCK_Y = 16 in the reference rasterizer
NEAR_CLIP = 0.2  # in_frustum threshold p_view.z > 0.2


class Projected(NamedTuple):
    """Differentiable per-Gaussian screen-space quantities ([N, .])."""

    xy: jax.Array  # [N, 2] pixel-space mean
    depth: jax.Array  # [N] camera-frame z (sort key and depth channel)
    conic: jax.Array  # [N, 3] inverse 2D covariance (a, b, c): ax^2+2bxy+cy^2
    opacity: jax.Array  # [N] sigmoid-activated opacity


class ProjectedAux(NamedTuple):
    """Non-differentiable per-Gaussian outputs (treated as constants)."""

    radius: jax.Array  # [N] int32 pixel radius (0 => culled)
    rect_min: jax.Array  # [N, 2] int32 (tx, ty) inclusive tile rect min
    rect_wh: jax.Array  # [N, 2] int32 tile rect extent (wx, wy)
    visible: jax.Array  # [N] bool


def build_cov3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """Sigma = R diag(s^2) R^T for wxyz quats [N,4], scales [N,3] -> [N,3,3]."""
    from splatam_tpu.core.transforms import build_rotation

    rot = build_rotation(quats)
    rs = rot * scales[:, None, :]  # R @ diag(s)
    return rs @ jnp.swapaxes(rs, -1, -2)


def _cov3d_components(quats: jax.Array, scales: jax.Array):
    """Upper-triangular components of R diag(s^2) R^T as six [N] arrays.

    Componentwise (no [N,3,3] intermediates): on TPU, arrays with trailing
    3x3 dims get padded to full (8,128) vector tiles, turning the batched
    tiny matmuls into a ~100x memory blowup. Scalar-per-lane math over [N]
    arrays keeps the VPU fully utilized instead.
    """
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0, s1, s2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
    v00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    v01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    v02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    v11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    v12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    v22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return v00, v01, v02, v11, v12, v22


def project(
    means3d: jax.Array,
    quats: jax.Array,
    logit_opacities: jax.Array,
    scales: jax.Array,
    active: jax.Array,
    w2c: jax.Array,
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
    lim_wh: tuple | None = None,
) -> tuple[Projected, ProjectedAux]:
    """EWA-project all Gaussians. means3d are in the frame that w2c maps
    from (world/reference frame); scales must already be [N, 3].

    lim_wh overrides the (width, height) used for the 1.3*tanfov frustum
    clamp — row-sharded rendering passes the FULL image extent there so
    cov2d is identical to the single-chip projection while the tile grid
    stays local."""
    n = means3d.shape[0]
    rot3 = w2c[:3, :3]
    p_view = means3d @ rot3.T + w2c[:3, 3]
    tz = p_view[:, 2]
    in_front = tz > NEAR_CLIP
    safe_tz = jnp.where(in_front, tz, 1.0)

    # NDC projection, literally mirroring setup_camera's opengl_proj + ndc2Pix
    # so the half-pixel convention matches the reference bit-for-bit.
    p_w = 1.0 / (safe_tz + 1e-7)
    x_ndc = (2.0 * fx / width * p_view[:, 0] - (width - 2.0 * cx) / width * safe_tz) * p_w
    y_ndc = (2.0 * fy / height * p_view[:, 1] - (height - 2.0 * cy) / height * safe_tz) * p_w
    pix_x = ((x_ndc + 1.0) * width - 1.0) * 0.5
    pix_y = ((y_ndc + 1.0) * height - 1.0) * 0.5
    xy = jnp.stack([pix_x, pix_y], axis=-1)

    # 2D covariance: J W Sigma W^T J^T with the reference's frustum clamp.
    s00, s01, s02, s11, s12, s22 = _cov3d_components(quats, scales)
    sigma = [[s00, s01, s02], [s01, s11, s12], [s02, s12, s22]]
    # vrk = W Sigma W^T with W the (constant) view rotation, unrolled so no
    # [N,3,3] arrays are materialized.
    wsig = [
        [sum(rot3[i, k] * sigma[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    def _vrk(i, j):
        return sum(wsig[i][k] * rot3[j, k] for k in range(3))

    lim_w, lim_h = lim_wh if lim_wh is not None else (width, height)
    limx = 1.3 * (lim_w / (2.0 * fx))
    limy = 1.3 * (lim_h / (2.0 * fy))
    txtz = jnp.clip(p_view[:, 0] / safe_tz, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / safe_tz, -limy, limy)
    tx = txtz * safe_tz
    ty = tytz * safe_tz

    inv_z = 1.0 / safe_tz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # cov2d = J V J^T expanded for the sparse J structure.
    v00, v01, v02 = _vrk(0, 0), _vrk(0, 1), _vrk(0, 2)
    v11, v12, v22 = _vrk(1, 1), _vrk(1, 2), _vrk(2, 2)
    c00 = j00 * (j00 * v00 + j02 * v02) + j02 * (j00 * v02 + j02 * v22) + 0.3
    c01 = j11 * (j00 * v01 + j02 * v12) + j12 * (j00 * v02 + j02 * v22)
    c11 = j11 * (j11 * v11 + j12 * v12) + j12 * (j11 * v12 + j12 * v22) + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))
    radius = radius_f.astype(jnp.int32)

    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    # Tile rect from the PER-AXIS extents of the ALPHA-CUTOFF ellipse
    # instead of the reference's isotropic 3*sqrt(lambda_max) circle. Two
    # exact tightenings compose here:
    #   1. per-axis bounds (3-sigma -> sqrt(9*cov_xx/yy)): the axis-aligned
    #      bbox of the ellipse, ~20-30% fewer pairs on anisotropic splats;
    #   2. opacity-aware radius: every backend skips (pixel, splat) pairs
    #      with alpha = op*exp(-power) < 1/255 (the reference renderCUDA's
    #      in-kernel rule), and min-power along the line dx=const is
    #      0.5*dx^2/cov_xx, so pixels with dx^2 > 2*ln(255*op)*cov_xx can
    #      NEVER pass the cutoff — the rect only needs
    #      sqrt(min(2*ln(255*op), 9) * cov_xx). Low-opacity splats (the
    #      bulk of an optimized map) shrink toward zero tiles; a splat with
    #      op <= 1/255 has no passing pixel at all and drops out entirely.
    #      Dropped pairs contributed literally nothing forward OR backward
    #      (the in-kernel skip zeroes both), so rendered images and
    #      gradients are bit-identical.
    # `radius` (the reported screen extent, parity with the reference's
    # radii output) keeps the circle definition above.
    op = jax.nn.sigmoid(logit_opacities)
    cut = jnp.minimum(2.0 * jnp.log(255.0 * jnp.maximum(op, 1e-12)), 9.0)
    cut = jnp.maximum(cut, 0.0)
    rx = jnp.ceil(jnp.sqrt(cut * jnp.maximum(c00, 0.0)))
    ry = jnp.ceil(jnp.sqrt(cut * jnp.maximum(c11, 0.0)))
    # getRect: float divide then C-style trunc-to-int, clamped to the grid.
    rmin_x = jnp.clip(((pix_x - rx) / TILE).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((pix_y - ry) / TILE).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((pix_x + rx + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((pix_y + ry + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    rect_w = jnp.maximum(rmax_x - rmin_x, 0)
    rect_h = jnp.maximum(rmax_y - rmin_y, 0)

    visible = active & in_front & det_ok & (rect_w * rect_h > 0)
    radius = jnp.where(visible, radius, 0)

    proj = Projected(
        xy=xy,
        depth=tz,
        conic=conic,
        opacity=op,
    )
    aux = ProjectedAux(
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_wh=jnp.stack([rect_w, rect_h], axis=-1),
        visible=visible,
    )
    return proj, aux
