"""Quaternion / rigid-transform math (pure JAX, jit-friendly).

Covers the reference's quaternion helpers (utils/slam_helpers.py:21-103,
utils/slam_external.py:25-42) with wxyz quaternion convention throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (matches torch.nn.functional.normalize)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_mult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions, batched over leading dims.

    Parity: utils/slam_helpers.py:21-28.
    """
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], axis=-1)


def build_rotation(q: jax.Array) -> jax.Array:
    """Unit-normalize wxyz quaternion(s) and convert to rotation matrices.

    q: [..., 4] -> [..., 3, 3]. Parity: utils/slam_external.py:25-42.
    """
    q = normalize(q)
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with zero subgradient at x == 0."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] -> wxyz quaternions [..., 4].

    Best-conditioned-candidate algorithm (pytorch3d), mirroring the
    reference's copy at utils/slam_helpers.py:43-103.
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))

    best = jnp.argmax(q_abs, axis=-1)
    one_hot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    return jnp.sum(quat_candidates * one_hot[..., None], axis=-2)


def rt_to_mat4(rot: jax.Array, trans: jax.Array) -> jax.Array:
    """Build a 4x4 rigid transform from a 3x3 rotation and 3-translation."""
    mat = jnp.eye(4, dtype=rot.dtype)
    mat = mat.at[:3, :3].set(rot)
    mat = mat.at[:3, 3].set(trans)
    return mat


def pose_to_w2c(cam_unnorm_rot: jax.Array, cam_tran: jax.Array) -> jax.Array:
    """Per-frame camera pose params (wxyz quat [4], trans [3]) -> 4x4 w2c.

    Parity: the inline construction at scripts/splatam.py:800-806.
    """
    rot = build_rotation(cam_unnorm_rot[None])[0]
    return rt_to_mat4(rot, cam_tran)


def transform_points(mat4: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 4x4 homogeneous transform to [N, 3] points."""
    return pts @ mat4[:3, :3].T + mat4[:3, 3]


def relative_transformation(t1: jax.Array, t2: jax.Array) -> jax.Array:
    """Relative transform t1^-1 @ t2 for [..., 4, 4] rigid transforms.

    Parity: datasets/gradslam_datasets/geometryutils.py:413 (used to
    normalize dataset poses so frame 0 is the identity).
    """
    rot = jnp.swapaxes(t1[..., :3, :3], -1, -2)
    trans = -jnp.einsum("...ij,...j->...i", rot, t1[..., :3, 3])
    rel_rot = rot @ t2[..., :3, :3]
    rel_trans = jnp.einsum("...ij,...j->...i", rot, t2[..., :3, 3]) + trans
    out = jnp.zeros_like(t2)
    out = out.at[..., :3, :3].set(rel_rot)
    out = out.at[..., :3, 3].set(rel_trans)
    out = out.at[..., 3, 3].set(1.0)
    return out
