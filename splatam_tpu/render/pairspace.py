"""Pair-space tracking render: world-frame attrs expanded once per rebin,
projected per-PAIR per iteration, with gradients flowing pairs -> pose.

During tracking the Gaussian parameters are frozen (reference semantics:
transform_to_frame detaches the map, utils/slam_helpers.py:266-288) and only
the camera pose moves. The standard render path still pays, per iteration,
a ~5.9 ms per-pair attribute row-gather plus a ~8.4 ms pairs->gaussian
gradient reduction (grouped gather + segmented scan + end-slot extract) —
all to produce per-gaussian gradients that tracking immediately contracts
into 7 pose numbers.

This module removes both: at rebin time the WORLD-frame per-gaussian rows
(means, cov3d components, opacity, rgb — all constant while tracking) are
gathered into the padded pair layout once (render.api.PairStructure.world16);
each iteration then runs the EWA projection math per pair slot (cheap
streaming elementwise work, no gathers), feeds the same Pallas compositor,
and the backward stops at per-pair gradients which jax.vjp of
`project_pairs` contracts directly into the pose — no per-gaussian
reduction at all.

Numerics: `project_pairs` mirrors render.projection.project expression by
expression, so per-pair attrs match the gather path to fusion-level float
noise. Stale-structure semantics are identical to the standard reuse path
(per-pair alpha from the CURRENT pose, rects from the rebin pose).

World row layout ([16, P_pad], matching composite_pallas.ATTR_W):
  0-2  mean_w xyz   3-8  cov3d (s00,s01,s02,s11,s12,s22)
  9    opacity (sigmoid-activated, active-masked)   10-12  rgb   13-15 pad
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatam_tpu.core.transforms import build_rotation, normalize
from splatam_tpu.render.projection import NEAR_CLIP, _cov3d_components


def pack_world_rows(means3d, unnorm_rotations, logit_opacities, log_scales,
                    rgb_colors, active):
    """[N, 13] world-frame attr rows (constants during tracking).

    log_scales may be [N,1] (isotropic) or [N,3]."""
    n = means3d.shape[0]
    if log_scales.shape[1] == 1:
        log_scales = jnp.tile(log_scales, (1, 3))
    scales = jnp.exp(log_scales)
    quats = normalize(unnorm_rotations)
    s00, s01, s02, s11, s12, s22 = _cov3d_components(quats, scales)
    opacity = jnp.where(
        active, jax.nn.sigmoid(logit_opacities.reshape(n)), 0.0
    )
    # 13 REAL columns; the three ATTR_W pad columns are appended after the
    # pair gather (composite_pallas._pad_cols) — gathering in-graph zero
    # columns is NOT folded by XLA and costs real bandwidth.
    return jnp.stack(
        [
            means3d[:, 0], means3d[:, 1], means3d[:, 2],
            s00, s01, s02, s11, s12, s22,
            opacity,
            rgb_colors[:, 0], rgb_colors[:, 1], rgb_colors[:, 2],
        ],
        axis=1,
    )


def project_pairs(world16, q, t, fx, fy, cx, cy, width: int, height: int,
                  lim_wh: tuple | None = None):
    """EWA-project per PAIR SLOT: world16 [16, P] -> kernel attrs [16, P].

    Differentiable in (q, t) only (world16 is a rebin-time constant).
    Output rows match composite_pallas's attr layout: mx, my, conic a/b/c,
    opacity, then channels (r, g, b, z, z^2), rest zero. Mirrors
    render.projection.project (reference renderCUDA preprocess; the w2c here
    is the tracked pose itself — the SLAM path renders with identity
    camera w2c after transform_to_frame).

    lim_wh overrides the (width, height) used for the 1.3*tanfov frustum
    clamp — row-sharded rendering passes the FULL image extent so cov2d
    matches the single-chip projection while (cy, height) describe the
    local row block (projection.project has the same override)."""
    rmat = build_rotation(normalize(q)[None])[0]
    mw_x, mw_y, mw_z = world16[0], world16[1], world16[2]
    px = rmat[0, 0] * mw_x + rmat[0, 1] * mw_y + rmat[0, 2] * mw_z + t[0]
    py = rmat[1, 0] * mw_x + rmat[1, 1] * mw_y + rmat[1, 2] * mw_z + t[1]
    tz = rmat[2, 0] * mw_x + rmat[2, 1] * mw_y + rmat[2, 2] * mw_z + t[2]
    in_front = tz > NEAR_CLIP
    safe_tz = jnp.where(in_front, tz, 1.0)

    p_w = 1.0 / (safe_tz + 1e-7)
    x_ndc = (2.0 * fx / width * px - (width - 2.0 * cx) / width * safe_tz) * p_w
    y_ndc = (2.0 * fy / height * py - (height - 2.0 * cy) / height * safe_tz) * p_w
    pix_x = ((x_ndc + 1.0) * width - 1.0) * 0.5
    pix_y = ((y_ndc + 1.0) * height - 1.0) * 0.5

    # vrk = R Sigma R^T, componentwise over the six packed cov3d rows.
    sigma = [
        [world16[3], world16[4], world16[5]],
        [world16[4], world16[6], world16[7]],
        [world16[5], world16[7], world16[8]],
    ]
    wsig = [
        [sum(rmat[i, k] * sigma[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]

    def _vrk(i, j):
        return sum(wsig[i][k] * rmat[j, k] for k in range(3))

    lim_w, lim_h = lim_wh if lim_wh is not None else (width, height)
    limx = 1.3 * (lim_w / (2.0 * fx))
    limy = 1.3 * (lim_h / (2.0 * fy))
    txtz = jnp.clip(px / safe_tz, -limx, limx)
    tytz = jnp.clip(py / safe_tz, -limy, limy)
    tx = txtz * safe_tz
    ty = tytz * safe_tz

    inv_z = 1.0 / safe_tz
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    v00, v01, v02 = _vrk(0, 0), _vrk(0, 1), _vrk(0, 2)
    v11, v12, v22 = _vrk(1, 1), _vrk(1, 2), _vrk(2, 2)
    c00 = j00 * (j00 * v00 + j02 * v02) + j02 * (j00 * v02 + j02 * v22) + 0.3
    c01 = j11 * (j00 * v01 + j02 * v12) + j12 * (j00 * v02 + j02 * v22)
    c11 = j11 * (j11 * v11 + j12 * v12) + j12 * (j11 * v12 + j12 * v22) + 0.3

    det = c00 * c11 - c01 * c01
    safe_det = jnp.where(det != 0.0, det, 1.0)
    inv_det = 1.0 / safe_det

    opacity = world16[9]
    zero = jnp.zeros_like(tz)
    return jnp.stack(
        [
            pix_x, pix_y,
            c11 * inv_det, -c01 * inv_det, c00 * inv_det,
            opacity,
            world16[10], world16[11], world16[12],
            tz, tz * tz,
            zero, zero, zero, zero, zero,
        ],
        axis=0,
    )
