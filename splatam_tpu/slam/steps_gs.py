"""Offline 3DGS training programs (GT-pose splatting + clone/split densify).

Parity targets:
  * get_loss_gs (scripts/gaussian_splatting.py:199-235) — 0.8 L1 + 0.2
    (1-SSIM) RGB loss, mean depth L1 over valid-masked render;
  * 3DGS densification (utils/gs_external.py / slam_external.py:191-243) —
    means2D-gradient statistics, clone small / split large, opacity pruning,
    re-architected as masked-buffer scatters with no shape changes;
  * the exponential means3D LR schedule (utils/slam_external.py:246-288),
    evaluated inside the jitted loop.

The training loop runs in jitted chunks of `densify_every` iterations; the
host performs the (rare) densify/prune/capacity-growth steps between
chunks.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.core.camera import Camera
from splatam_tpu.core.gaussians import GaussianMap
from splatam_tpu.core.losses import calc_ssim
from splatam_tpu.core.transforms import build_rotation, normalize
from splatam_tpu.render.api import RenderConfig, render_rgbd_sil
from splatam_tpu.slam import optim
from splatam_tpu.slam.steps import transform_to_frame


@dataclass(frozen=True)
class DensifyConfig:
    """Parity: densify_dict (configs/replica/splatam.py:113-123)."""

    enabled: bool = True
    start_after: int = 500
    remove_big_after: int = 3000
    stop_after: int = 5000
    densify_every: int = 100
    grad_thresh: float = 0.0002
    num_to_split_into: int = 2
    removal_opacity_threshold: float = 0.005
    final_removal_opacity_threshold: float = 0.005
    reset_opacities: bool = False
    reset_opacities_every: int = 3000


class GSVariables(NamedTuple):
    """3DGS densification statistics ([CAP] each)."""

    means2d_grad_accum: jax.Array
    denom: jax.Array
    max_2d_radius: jax.Array

    @staticmethod
    def zeros(capacity: int) -> "GSVariables":
        z = jnp.zeros((capacity,), jnp.float32)
        return GSVariables(z, z, z)


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000):
    """get_expon_lr_func (utils/slam_external.py:255-288) as a pure jax fn."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    return delay * log_lerp


def gs_loss(gm: GaussianMap, q, t, color, depth_gt, cam: Camera, w_im, w_depth,
            rcfg: RenderConfig, means2d_dummy=None):
    """get_loss_gs semantics with the fused renderer."""
    means_cam, rots_cam = transform_to_frame(gm, q, t, True, False)
    out = render_rgbd_sil(
        cam, means_cam, gm.rgb_colors, rots_cam, gm.logit_opacities,
        gm.log_scales, gm.active, config=rcfg, means2d_dummy=means2d_dummy,
    )
    valid = depth_gt != 0.0
    depth = out.depth * valid
    im_loss = 0.8 * jnp.abs(out.im - color).mean() + 0.2 * (1.0 - calc_ssim(out.im, color))
    depth_loss = jnp.abs(depth - depth_gt).mean()
    return w_im * im_loss + w_depth * depth_loss, out


@partial(
    jax.jit,
    static_argnames=("cam", "num_iters", "rcfg", "lrs", "w_im", "w_depth",
                     "lr_sched", "track_stats"),
)
def gs_mapping_chunk(
    gm: GaussianMap,
    gsvars: GSVariables,
    opt_state: optim.AdamState,
    colors: jax.Array,  # [S, H, W, 3] uint8 frame store
    depths: jax.Array,  # [S, H, W]
    iter_slots: jax.Array,  # [num_iters]
    iter_qs: jax.Array,  # [num_iters, 4]
    iter_ts: jax.Array,  # [num_iters, 3]
    start_iter: jax.Array,  # scalar global iteration of chunk start
    cam: Camera,
    num_iters: int,
    rcfg: RenderConfig,
    lrs: tuple,  # (means3D, rgb, rots, opac, scales)
    w_im: float,
    w_depth: float,
    lr_sched: tuple | None,  # (lr_init, lr_final, delay_mult, max_steps) or None
    track_stats: bool,
):
    """One jitted chunk of the offline training loop (between densify ops)."""
    param_tuple = (
        gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
        gm.logit_opacities, gm.log_scales,
    )

    def loss_fn(params, dummy, q, t, color, depth_gt):
        gm_i = gm._replace(
            means3d=params[0], rgb_colors=params[1], unnorm_rotations=params[2],
            logit_opacities=params[3], log_scales=params[4],
        )
        loss, out = gs_loss(gm_i, q, t, color, depth_gt, cam, w_im, w_depth,
                            rcfg, means2d_dummy=dummy)
        return loss, out.radii

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def body(i, carry):
        params, st, gsv, loss_sum = carry
        slot = iter_slots[i]
        color = colors[slot].astype(jnp.float32).transpose(2, 0, 1) / 255.0
        depth_gt = depths[slot]
        dummy = jnp.zeros((gm.capacity, 2), jnp.float32)
        (loss, radii), (grads, d_dummy) = grad_fn(
            params, dummy, iter_qs[i], iter_ts[i], color, depth_gt
        )
        if track_stats:
            seen = radii > 0
            gsv = GSVariables(
                means2d_grad_accum=gsv.means2d_grad_accum
                + jnp.where(seen, jnp.linalg.norm(d_dummy, axis=-1), 0.0),
                denom=gsv.denom + seen.astype(jnp.float32),
                max_2d_radius=jnp.maximum(
                    gsv.max_2d_radius, jnp.where(seen, radii.astype(jnp.float32), 0.0)
                ),
            )
        if lr_sched is not None:
            lr_init, lr_final, delay_mult, max_steps = lr_sched
            lr_means = expon_lr(
                (start_iter + i + 1).astype(jnp.float32), lr_init, lr_final,
                lr_delay_mult=delay_mult, max_steps=max_steps,
            )
        else:
            lr_means = jnp.float32(lrs[0])
        lr_tuple = (lr_means,) + tuple(jnp.float32(lr) for lr in lrs[1:])
        params, st = optim.adam_step(st, params, grads, lr_tuple, eps=1e-15)
        return (params, st, gsv, loss_sum + loss)

    carry0 = (param_tuple, opt_state, gsvars, jnp.float32(0))
    params, st, gsv, loss_sum = jax.lax.fori_loop(0, num_iters, body, carry0)
    new_gm = gm._replace(
        means3d=params[0], rgb_colors=params[1], unnorm_rotations=params[2],
        logit_opacities=params[3], log_scales=params[4],
    )
    return new_gm, gsv, st, loss_sum


def _scatter_rows(gm: GaussianMap, opt_state, src_idx, write_mask, dest,
                  means_override=None, log_scales_override=None):
    """Copy rows src_idx -> dest slots (masked), zeroing Adam moments there."""
    def put(arr, values):
        return arr.at[dest].set(values, mode="drop")

    means = gm.means3d[src_idx] if means_override is None else means_override
    log_scales = (
        gm.log_scales[src_idx] if log_scales_override is None else log_scales_override
    )
    new_gm = gm._replace(
        means3d=put(gm.means3d, means),
        rgb_colors=put(gm.rgb_colors, gm.rgb_colors[src_idx]),
        unnorm_rotations=put(gm.unnorm_rotations, gm.unnorm_rotations[src_idx]),
        logit_opacities=put(gm.logit_opacities, gm.logit_opacities[src_idx]),
        log_scales=put(gm.log_scales, log_scales),
        active=gm.active.at[dest].set(write_mask, mode="drop"),
    )
    if opt_state is not None:
        def zero_dest(x):
            if x.ndim == 0:
                return x
            return x.at[dest].set(jnp.zeros((dest.shape[0],) + x.shape[1:]), mode="drop")

        opt_state = optim.AdamState(
            m=jax.tree.map(zero_dest, opt_state.m),
            v=jax.tree.map(zero_dest, opt_state.v),
            step=opt_state.step,
        )
    return new_gm, opt_state


def _alloc_slots(active, want_mask):
    """Destination slots for new rows: lowest free slots in rank order.

    Returns dest [CAP] (=CAP when not writing) and the overflow count.
    """
    cap = active.shape[0]
    free = ~active
    n_free = jnp.sum(free.astype(jnp.int32))
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(free, free_rank, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    want_rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1
    write = want_mask & (want_rank < n_free)
    dest = jnp.where(write, slot_of_rank[jnp.clip(want_rank, 0, cap - 1)], cap)
    overflow = jnp.sum(want_mask.astype(jnp.int32)) - jnp.sum(write.astype(jnp.int32))
    return dest, write, overflow


@partial(jax.jit, static_argnames=("cfg", "final"))
def densify_3dgs_step(
    gm: GaussianMap,
    gsvars: GSVariables,
    opt_state: optim.AdamState,
    scene_radius: jax.Array,
    rng_key: jax.Array,
    it: jax.Array,  # current global iteration (for remove_big_after)
    cfg: DensifyConfig,
    final: bool,
):
    """One 3DGS clone/split/prune pass over the masked buffers.

    Parity: utils/slam_external.py:191-243 — clone small high-grad
    gaussians, split large high-grad ones into num_to_split_into samples
    drawn from the gaussian itself (removing the original), then prune by
    opacity (and size after remove_big_after). Stats are reset afterwards.
    """
    cap = gm.capacity
    grads = gsvars.means2d_grad_accum / jnp.maximum(gsvars.denom, 1e-20)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    grads = jnp.where(gsvars.denom > 0, grads, 0.0)
    max_scale = jnp.max(jnp.exp(gm.log_scales), axis=1)
    high_grad = (grads >= cfg.grad_thresh) & gm.active
    # Both masks are decided on the pre-clone state: freshly cloned slots
    # carry zero densification stats in the reference (padded_grad,
    # utils/slam_external.py:204-208) and must not split this round.
    to_clone = high_grad & (max_scale <= 0.01 * scene_radius)
    to_split = high_grad & (max_scale > 0.01 * scene_radius)

    # ---- Clone (small gaussians duplicated in place) --------------------
    dest, write, ovf_clone = _alloc_slots(gm.active, to_clone)
    src = jnp.arange(cap)
    gm, opt_state = _scatter_rows(gm, opt_state, src, write, dest)

    # ---- Split (large gaussians -> n samples, original removed) ---------
    n = cfg.num_to_split_into
    stds = jnp.exp(gm.log_scales)
    if stds.shape[1] == 1:
        stds = jnp.tile(stds, (1, 3))
    new_log_scales_all = jnp.log(jnp.exp(gm.log_scales) / (0.8 * n))
    rot = build_rotation(normalize(gm.unnorm_rotations))
    keys = jax.random.split(rng_key, n)
    ovf_split = jnp.int32(0)
    for rep in range(n):
        samples = jax.random.normal(keys[rep], (cap, 3)) * stds
        offset = jnp.einsum("nij,nj->ni", rot, samples)
        dest, write, ovf = _alloc_slots(gm.active, to_split)
        gm, opt_state = _scatter_rows(
            gm, opt_state, src, write, dest,
            means_override=gm.means3d + offset,
            log_scales_override=new_log_scales_all,
        )
        ovf_split = ovf_split + ovf
    gm = gm._replace(active=gm.active & ~to_split)

    # ---- Prune by opacity / size ----------------------------------------
    thresh = (
        cfg.final_removal_opacity_threshold if final else cfg.removal_opacity_threshold
    )
    to_remove = jax.nn.sigmoid(gm.logit_opacities) < thresh
    big = jnp.max(jnp.exp(gm.log_scales), axis=1) > 0.1 * scene_radius
    to_remove = jnp.where(it >= cfg.remove_big_after, to_remove | big, to_remove)
    gm = gm._replace(active=gm.active & ~to_remove)

    return gm, GSVariables.zeros(cap), opt_state, ovf_clone + ovf_split
