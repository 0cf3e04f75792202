"""Jitted SLAM phase programs: loss, tracking, mapping, densification.

Reference semantics from scripts/splatam.py:
  * get_loss (:214-347) — phase-gated gradients (tracking: camera only,
    mapping: Gaussians only) via stop_gradient, silhouette/outlier masks,
    sum-losses for tracking and mean-depth + 0.8 L1 + 0.2 (1-SSIM) for
    mapping.
  * tracking loop (:690-744) — fresh Adam, best-candidate pose (post-step
    pose paired with pre-step loss — a reference quirk preserved here),
    optional one-time 2x iteration extension when the weighted depth loss
    is above depth_loss_thres (:727-738).
  * mapping loop (:828-891) — random keyframe per iteration, pruning
    before the optimizer step (utils/slam_external.py:167-188).
  * add_new_gaussians (:378-420) — silhouette + depth-error triggered
    backprojection, rewritten as a scatter into free capacity slots.

Each phase is ONE jitted program (whole optimization loop inside
lax.while_loop / fori_loop), not one dispatch per iteration.
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
from splatam_tpu.core.transforms import build_rotation, normalize, quat_mult
from splatam_tpu.render.api import RenderConfig, render_rgbd_sil
from splatam_tpu.slam import optim

sg = jax.lax.stop_gradient


@dataclass(frozen=True)
class PhaseConfig:
    """Static per-phase loss configuration (hashable jit argument).

    depth_unc_thres (meters, std; 0 = off = exact reference semantics) is a
    TPU-native extension: mask loss pixels whose rendered splat-depth
    standard deviation sqrt(depth_sq - depth^2) exceeds the threshold.
    Alpha-weighted splat depth is a foreground/background MIXTURE at
    occlusion boundaries; during a sustained pan those mushy pixels apply a
    consistent directional pull that accumulates as yaw drift (measured
    ~1.4 cm over the 120-frame gauntlet). The fused render already pays for
    depth_sq, so the robustifier is free."""

    use_sil_for_loss: bool
    sil_thres: float
    use_l1: bool
    ignore_outlier_depth_loss: bool
    w_im: float
    w_depth: float
    depth_unc_thres: float = 0.0
    # TPU-native extension (0 = off = exact reference semantics): floor, in
    # meters, under the reference's 10x-median outlier threshold. On
    # near-noiseless depth the median error collapses toward 0 and the
    # 10x-median mask rejects nearly every pixel (measured: clean-synthetic
    # ATE 1.63 cm -> 3.58 cm when enabled bare); the floor keeps the
    # mechanism = "reject pixels the map can't explain" without the
    # degenerate collapse.
    outlier_floor: float = 0.0


class LossAux(NamedTuple):
    weighted_depth_loss: jax.Array
    weighted_im_loss: jax.Array
    silhouette: jax.Array
    render_depth: jax.Array
    radii: jax.Array
    overflow: jax.Array
    n_pairs: jax.Array  # actual (gaussian, tile) pairs this render binned


def transform_to_frame(gm: GaussianMap, q: jax.Array, t: jax.Array,
                       gaussians_grad: bool, camera_grad: bool):
    """World->camera transform with phase-gated gradients.

    Parity: utils/slam_helpers.py:252-304. Isotropic maps skip quaternion
    rotation (spherical covariance is rotation invariant).
    """
    cam_rot = normalize(q) if camera_grad else sg(normalize(q))
    cam_tran = t if camera_grad else sg(t)
    pts = gm.means3d if gaussians_grad else sg(gm.means3d)
    rots = gm.unnorm_rotations if gaussians_grad else sg(gm.unnorm_rotations)

    rmat = build_rotation(cam_rot[None])[0]
    means_cam = pts @ rmat.T + cam_tran
    if gm.isotropic:
        rots_cam = rots
    else:
        rots_cam = quat_mult(cam_rot[None], normalize(rots))
    return means_cam, rots_cam


def _median_lower(x: jax.Array) -> jax.Array:
    """torch.median semantics: lower of the two central order statistics."""
    flat = x.reshape(-1)
    k = (flat.shape[0] - 1) // 2
    return jnp.sort(flat)[k]


def get_loss(
    gm: GaussianMap,
    q: jax.Array,
    t: jax.Array,
    color: jax.Array,  # [3, H, W]
    depth_gt: jax.Array,  # [H, W]
    cam: Camera,
    pcfg: PhaseConfig,
    rcfg: RenderConfig,
    tracking: bool,
    mapping: bool,
    do_ba: bool = False,
    means2d_dummy: jax.Array | None = None,
    mesh=None,
    pair_structure=None,
):
    """Reference get_loss (scripts/splatam.py:214-347), fused renders.

    With `mesh` (a 1-D jax.sharding.Mesh), the render runs row-sharded over
    the devices (parallel/spatial.py) and the full image is gathered back,
    so every loss term below (masks, median, SSIM) is bit-identical to the
    single-chip path. `pair_structure` reuses a precomputed binning
    (render.api.PairStructure; single-chip path only)."""
    pairspace_path = (
        tracking
        and not do_ba
        and pair_structure is not None
        and (pair_structure.world16 is not None
             or pair_structure.world8 is not None)
    )
    # Fused isotropic mapping path (render.pallas.fused_iso): the kernels
    # project per pair in-kernel from an 8-column world gather, so the
    # per-iteration O(N) projection + [16, P_pad] attr materialization and
    # their VJPs disappear. Requires no means2d_dummy (the screen-space
    # densification-stats harvest needs per-gaussian pix grads, which the
    # world-space backward does not emit).
    fusedmap_path = (
        mapping
        and not do_ba
        and means2d_dummy is None
        and pair_structure is not None
        and pair_structure.pad_gauss is not None
        and gm.log_scales.shape[1] == 1
        and rcfg.resolve_backend() == "pallas"
    )
    if pairspace_path:
        # Pair-space fast path (pallas backend): the gaussian params are
        # frozen (stop_gradient side of transform_to_frame), so the render
        # projects rebin-time world rows per PAIR and backprops pairs ->
        # pose, skipping the attr gather and the whole pairs->gaussian
        # gradient reduction. Loss semantics below are shared. Under a mesh
        # each shard runs the same math on its own row-block pairs.
        if mesh is not None:
            from splatam_tpu.parallel.spatial import (
                render_rgbd_sil_pairspace_sharded,
            )

            out = render_rgbd_sil_pairspace_sharded(
                mesh, cam, pair_structure, q, t, gm.means3d.shape[0]
            )
        else:
            from splatam_tpu.render.api import render_rgbd_sil_pairspace

            out = render_rgbd_sil_pairspace(
                cam, pair_structure, q, t, gm.means3d.shape[0]
            )
    elif fusedmap_path:
        if mesh is not None:
            from splatam_tpu.parallel.spatial import (
                render_rgbd_sil_mapping_fused_sharded,
            )

            out = render_rgbd_sil_mapping_fused_sharded(
                mesh, cam, pair_structure, gm.means3d, gm.rgb_colors,
                gm.logit_opacities, gm.log_scales, gm.active, sg(q), sg(t),
            )
        else:
            from splatam_tpu.render.api import render_rgbd_sil_mapping_fused

            out = render_rgbd_sil_mapping_fused(
                cam, pair_structure, gm.means3d, gm.rgb_colors,
                gm.logit_opacities, gm.log_scales, gm.active, sg(q), sg(t),
            )
    else:
        if tracking:
            means_cam, rots_cam = transform_to_frame(gm, q, t, False, True)
        elif mapping and do_ba:
            means_cam, rots_cam = transform_to_frame(gm, q, t, True, True)
        elif mapping:
            means_cam, rots_cam = transform_to_frame(gm, q, t, True, False)
        else:
            means_cam, rots_cam = transform_to_frame(gm, q, t, True, False)

        params_grad = mapping or not tracking
        logit_op = gm.logit_opacities if params_grad else sg(gm.logit_opacities)
        log_scales = gm.log_scales if params_grad else sg(gm.log_scales)
        colors = gm.rgb_colors if params_grad else sg(gm.rgb_colors)

        if mesh is not None:
            from splatam_tpu.parallel.spatial import render_rgbd_sil_sharded

            out = render_rgbd_sil_sharded(
                mesh, cam, means_cam, colors, rots_cam, logit_op, log_scales,
                gm.active, rcfg, means2d_dummy=means2d_dummy,
                pair_structure=pair_structure,
            )
        else:
            out = render_rgbd_sil(
                cam,
                means_cam,
                colors,
                rots_cam,
                logit_op,
                log_scales,
                gm.active,
                config=rcfg,
                means2d_dummy=means2d_dummy,
                pair_structure=pair_structure,
            )

    depth = out.depth
    silhouette = out.silhouette
    uncertainty = sg(out.depth_sq - depth * depth)

    nan_mask = ~jnp.isnan(depth) & ~jnp.isnan(uncertainty)
    valid = depth_gt > 0
    if pcfg.ignore_outlier_depth_loss:
        depth_error = jnp.abs(depth_gt - depth) * valid
        thresh = 10.0 * _median_lower(depth_error)
        if pcfg.outlier_floor > 0.0:
            thresh = jnp.maximum(thresh, pcfg.outlier_floor)
        mask = (depth_error < thresh) & valid
    else:
        mask = valid
    mask = mask & nan_mask
    if tracking and pcfg.use_sil_for_loss:
        mask = mask & (silhouette > pcfg.sil_thres)
    if pcfg.depth_unc_thres > 0.0:
        # Splat-depth variance robustifier (see PhaseConfig): excise
        # foreground/background mixture pixels at occlusion boundaries.
        # The raw channels are alpha-weighted SUMS (not normalized by the
        # weight total = silhouette), so normalize before differencing —
        # otherwise every sil<1 pixel carries a spurious (1-sil)*z^2 term
        # (~0.3 m std at sil=0.99) and the mask swallows the whole image.
        s = jnp.maximum(silhouette, 1e-6)
        var_norm = sg(out.depth_sq / s - (depth / s) ** 2)
        mask = mask & (var_norm < pcfg.depth_unc_thres**2)
    mask = sg(mask)

    if tracking:
        depth_loss = jnp.sum(jnp.abs(depth_gt - depth) * mask)
    else:
        cnt = jnp.maximum(jnp.sum(mask), 1)
        depth_loss = jnp.sum(jnp.abs(depth_gt - depth) * mask) / cnt

    if tracking and (pcfg.use_sil_for_loss or pcfg.ignore_outlier_depth_loss):
        im_loss = jnp.sum(jnp.abs(color - out.im) * mask[None])
    elif tracking:
        im_loss = jnp.sum(jnp.abs(color - out.im))
    else:
        im_loss = 0.8 * jnp.abs(out.im - color).mean() + 0.2 * (
            1.0 - calc_ssim(out.im, color)
        )

    w_depth = pcfg.w_depth * depth_loss
    w_im = pcfg.w_im * im_loss
    loss = w_depth + w_im
    aux = LossAux(
        weighted_depth_loss=w_depth,
        weighted_im_loss=w_im,
        silhouette=silhouette,
        render_depth=depth,
        radii=out.radii,
        overflow=out.overflow,
        n_pairs=out.n_pairs,
    )
    return loss, aux


# ---------------------------------------------------------------------------
# Tracking
# ---------------------------------------------------------------------------


def loss_pair_structure(gm: GaussianMap, q, t, cam: Camera, rcfg: RenderConfig,
                        with_world16: bool = False, mesh=None,
                        prefer_w8: bool = True):
    """The reusable binning structure for a get_loss render at this pose and
    parameter snapshot (render.api.PairStructure).

    with_world16 additionally gathers the WORLD-frame attr rows into the
    padded pair layout for the pair-space tracking path (render.pairspace) —
    only the tracking rebin sites pay for it.

    With `mesh`, each shard builds (and later reuses) the structure of its
    OWN row block (parallel.spatial.compute_pair_structure_sharded; leaves
    carry a leading device axis), so binning work shrinks per shard and
    reuse composes with row sharding."""
    means_cam, rots_cam = transform_to_frame(gm, sg(q), sg(t), False, False)

    # Isotropic maps use the fused in-kernel projection (8 world rows,
    # render.pallas.fused_iso) — single-chip AND row-sharded (each shard
    # gathers its own world8 rows); anisotropic ones keep the generic
    # 16-row pair-space path.
    use_w8 = (
        prefer_w8 and with_world16
        and gm.log_scales.shape[1] == 1
        and rcfg.resolve_backend() == "pallas"
    )
    world_rows = None
    if with_world16 and not use_w8:
        from splatam_tpu.render import pairspace

        world_rows = sg(pairspace.pack_world_rows(
            gm.means3d, gm.unnorm_rotations, gm.logit_opacities,
            gm.log_scales, gm.rgb_colors, gm.active,
        ))

    if mesh is not None:
        from splatam_tpu.parallel.spatial import compute_pair_structure_sharded

        world_rows8 = None
        if use_w8:
            from splatam_tpu.render.pallas import fused_iso

            world_rows8 = sg(fused_iso.pack_world8(
                gm.means3d, gm.logit_opacities, gm.log_scales,
                gm.rgb_colors, gm.active,
            ))
        return compute_pair_structure_sharded(
            mesh, cam, means_cam, rots_cam, gm.logit_opacities,
            gm.log_scales, gm.active, rcfg, world_rows=world_rows,
            world_rows8=world_rows8,
        )

    from splatam_tpu.render.api import compute_pair_structure

    ps = compute_pair_structure(
        cam, means_cam, rots_cam, gm.logit_opacities, gm.log_scales,
        gm.active, rcfg,
    )
    if world_rows is not None and ps.pad_gauss is not None:
        from splatam_tpu.render.pallas.composite_pallas import (
            _pad_cols, _split_row_gather,
        )

        ps = ps._replace(
            world16=_pad_cols(_split_row_gather(world_rows, ps.pad_gauss)).T
        )
    if use_w8 and ps.pad_gauss is not None:
        from splatam_tpu.render.pallas import fused_iso
        from splatam_tpu.render.pallas.composite_pallas import (
            _split_row_gather,
        )

        w8 = sg(fused_iso.pack_world8(
            gm.means3d, gm.logit_opacities, gm.log_scales, gm.rgb_colors,
            gm.active,
        ))
        ps = ps._replace(world8=_split_row_gather(w8, ps.pad_gauss).T)
    return ps


@partial(
    jax.jit,
    static_argnames=(
        "cam", "num_iters", "use_depth_loss_thres", "pcfg", "rcfg", "lr_q",
        "lr_t", "mesh", "rebin_every", "lr_decay_frac",
    ),
)
def tracking_phase(
    gm: GaussianMap,
    q0: jax.Array,
    t0: jax.Array,
    color: jax.Array,
    depth_gt: jax.Array,
    cam: Camera,
    num_iters: int,
    use_depth_loss_thres: bool,
    depth_loss_thres: float,
    lr_q: float,
    lr_t: float,
    pcfg: PhaseConfig,
    rcfg: RenderConfig,
    mesh=None,
    rebin_every: int = 1,
    lr_decay_frac: float = 1.0,
):
    """Whole tracking optimization for one frame in one jitted while_loop.

    lr_decay_frac < 1 (TPU-native extension; 1.0 = off = reference
    semantics) anneals both pose lrs geometrically to lr*frac by the last
    scheduled iteration: constant-lr Adam orbits the minimum at an
    lr-proportional radius, which puts a floor on per-frame pose accuracy
    that accumulates as drift over long sequences.

    Returns (best_q, best_t, iters_run, final_loss, overflow, loss_hist,
    n_pairs_max) — n_pairs_max is the largest actual (gaussian, tile) pair
    count any iteration binned, feeding the host's measured-count pair
    budget (pipeline._phase_rcfg). loss_hist is [2*num_iters, 3] rows of
    (loss, weighted depth loss,
    weighted im loss) per iteration (rows past iters_run are zero) — the
    host replays it for wandb's per-iteration report_loss
    (utils/eval_helpers.py:80-106).

    rebin_every > 1 recomputes the pair/tile binning structure only every
    K-th iteration (render.api.PairStructure): the camera pose moves
    sub-pixel per Adam step, so the stale candidate lists skip only
    contributions the 1/255 alpha cutoff would skip anyway. 1 = exact
    per-iteration binning (reference semantics).
    """
    use_rebin = rebin_every > 1

    def loss_fn(qt, ps):
        q, t = qt
        return get_loss(gm, q, t, color, depth_gt, cam, pcfg, rcfg, True, False,
                        mesh=mesh, pair_structure=ps)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    lrs = (jnp.float32(lr_q), jnp.float32(lr_t))

    def cond(carry):
        it, limit, *_ = carry
        return it < limit

    def body(carry):
        it, limit, qt, st, best_q, best_t, min_loss, ovf, np_max, hist, ps = carry
        if use_rebin:
            ps = jax.lax.cond(
                (it > 0) & (it % rebin_every == 0),
                lambda qt, ps: loss_pair_structure(gm, qt[0], qt[1], cam, rcfg,
                                                   with_world16=True,
                                                   mesh=mesh),
                lambda qt, ps: ps,
                qt, ps,
            )
        (loss, aux), grads = grad_fn(qt, ps)
        ovf = jnp.maximum(ovf, aux.overflow)
        np_max = jnp.maximum(np_max, aux.n_pairs)
        hist = hist.at[it].set(
            jnp.stack([loss, aux.weighted_depth_loss, aux.weighted_im_loss])
        )
        if lr_decay_frac < 1.0:
            # Clamp the exponent at the last scheduled iteration so the
            # depth_loss_thres extension window (iters num_iters..2*num_iters)
            # holds lr*frac instead of decaying on toward frac^2.
            decay = jnp.power(
                jnp.float32(lr_decay_frac),
                jnp.minimum(it, num_iters - 1).astype(jnp.float32)
                / max(num_iters - 1, 1),
            )
            iter_lrs = tuple(lr * decay for lr in lrs)
        else:
            iter_lrs = lrs
        qt, st = optim.adam_step(st, qt, grads, iter_lrs, eps=1e-8)
        better = loss < min_loss
        best_q = jnp.where(better, qt[0], best_q)
        best_t = jnp.where(better, qt[1], best_t)
        min_loss = jnp.minimum(loss, min_loss)
        if use_depth_loss_thres:
            # Reference checks ONLY at iter == num_iters (scripts/
            # splatam.py:727-738): stop if the weighted depth loss is under
            # the threshold, otherwise extend once to 2x num_iters.
            at_check = (it + 1 == num_iters) & (limit == num_iters)
            under = aux.weighted_depth_loss < depth_loss_thres
            limit = jnp.where(at_check & ~under, 2 * num_iters, limit)
        return (it + 1, limit, qt, st, best_q, best_t, min_loss, ovf, np_max,
                hist, ps)

    st0 = optim.adam_init((q0, t0))
    ps0 = (loss_pair_structure(gm, q0, t0, cam, rcfg, with_world16=True,
                               mesh=mesh)
           if use_rebin else None)
    carry0 = (
        jnp.int32(0),
        jnp.int32(num_iters),
        (q0, t0),
        st0,
        q0,
        t0,
        jnp.float32(1e20),
        jnp.int32(0),
        ps0.bins.n_pairs if use_rebin else jnp.int32(0),
        jnp.zeros((2 * num_iters, 3), jnp.float32),
        ps0,
    )
    (it, _, _, _, best_q, best_t, min_loss, ovf, np_max, hist, _) = (
        jax.lax.while_loop(cond, body, carry0)
    )
    return best_q, best_t, it, min_loss, ovf, hist, np_max


# ---------------------------------------------------------------------------
# Mapping
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PruneConfig:
    """Parity: pruning_dict (configs/replica/splatam.py:102-111)."""

    enabled: bool = True
    start_after: int = 0
    remove_big_after: int = 0
    stop_after: int = 20
    prune_every: int = 20
    removal_opacity_threshold: float = 0.005
    final_removal_opacity_threshold: float = 0.005
    reset_opacities: bool = False
    reset_opacities_every: int = 500


def _prune_mask(params, active, it, scene_radius, pc: PruneConfig):
    logit_op, log_scales = params[3], params[4]
    thresh = jnp.where(
        it == pc.stop_after,
        pc.final_removal_opacity_threshold,
        pc.removal_opacity_threshold,
    )
    to_remove = jax.nn.sigmoid(logit_op) < thresh
    big = jnp.max(jnp.exp(log_scales), axis=1) > 0.1 * scene_radius
    to_remove = jnp.where(it >= pc.remove_big_after, to_remove | big, to_remove)
    do_prune = (
        (it <= pc.stop_after)
        & (it >= pc.start_after)
        & (it % pc.prune_every == 0)
    )
    return jnp.where(do_prune, active & ~to_remove, active)


@partial(
    jax.jit,
    static_argnames=(
        "cam", "num_iters", "pcfg", "rcfg", "prune_cfg", "lrs", "track_stats",
        "mesh", "reuse_structures",
    ),
)
def mapping_phase(
    gm: GaussianMap,
    kf_colors_u8: jax.Array,  # [S, H, W, 3] uint8 keyframe store
    kf_depths: jax.Array,  # [S, H, W] f32
    iter_slots: jax.Array,  # [num_iters] int32 store slot per iteration
    iter_qs: jax.Array,  # [num_iters, 4] pose of the chosen keyframe
    iter_ts: jax.Array,  # [num_iters, 3]
    scene_radius: jax.Array,
    cam: Camera,
    num_iters: int,
    pcfg: PhaseConfig,
    rcfg: RenderConfig,
    prune_cfg: PruneConfig,
    lrs: tuple,  # (lr_means, lr_rgb, lr_rot, lr_opac, lr_scales) static floats
    opt_state: optim.AdamState,
    gsvars: tuple,  # (means2d_grad_accum, denom, max_2d_radius) [CAP] each
    start_iter: jax.Array = jnp.int32(0),  # absolute iter of this chunk
    track_stats: bool = False,
    mesh=None,
    reuse_structures: bool = False,
    struct_qs: jax.Array | None = None,  # [S_max, 4] distinct keyframe poses
    struct_ts: jax.Array | None = None,  # [S_max, 3]
    iter_struct_idx: jax.Array | None = None,  # [num_iters] int32 -> struct row
    n_structs: jax.Array | None = None,  # scalar int32: live struct rows
):
    """Mapping iterations for one frame in one jitted fori_loop.

    Resumable: takes/returns the Adam state and 3DGS densification stats so
    the host can run the phase in chunks with clone/split densification in
    between (parity: the prune/densify schedule inside the reference's
    mapping loop, scripts/splatam.py:828-891). Prune/reset schedules use
    the ABSOLUTE iteration (start_iter + i).

    With `reuse_structures`, the pair/tile binning structure of every
    DISTINCT keyframe in this chunk is computed once up front from the
    chunk-start parameters (render.api.PairStructure; the host supplies the
    distinct pose table + per-iteration row index), and iterations reuse
    their keyframe's structure — params drift at 1e-4-scale mapping lrs,
    and pruned gaussians are silenced exactly via zeroed opacity.

    Returns (GaussianMap, opt_state, gsvars, summed loss, overflow max,
    loss_hist [num_iters, 3] of (loss, w_depth, w_im) per iteration,
    n_pairs max across iterations — see tracking_phase).
    """
    param_tuple = (
        gm.means3d,
        gm.rgb_colors,
        gm.unnorm_rotations,
        gm.logit_opacities,
        gm.log_scales,
    )
    lr_tuple = tuple(jnp.float32(lr) for lr in lrs)
    use_ps = reuse_structures

    if use_ps:
        s_max = struct_qs.shape[0]
        ps_proto = loss_pair_structure(gm, struct_qs[0], struct_ts[0], cam,
                                       rcfg, mesh=mesh)
        ps_stack = jax.tree.map(
            lambda p: jnp.zeros((s_max,) + p.shape, p.dtype).at[0].set(p),
            ps_proto,
        )

        def fill(i, stack):
            # Only the live rows pay the structure compute; padding rows
            # take the (free) zeros branch.
            ps = jax.lax.cond(
                i < n_structs,
                lambda: loss_pair_structure(
                    gm, struct_qs[i], struct_ts[i], cam, rcfg, mesh=mesh
                ),
                lambda: jax.tree.map(jnp.zeros_like, ps_proto),
            )
            return jax.tree.map(
                lambda s, p: jax.lax.dynamic_update_index_in_dim(s, p, i, 0),
                stack, ps,
            )

        if s_max > 1:
            ps_stack = jax.lax.fori_loop(1, s_max, fill, ps_stack)

    def loss_fn(params, dummy, active, q, t, color, depth_gt, ps):
        gm_i = gm._replace(
            means3d=params[0],
            rgb_colors=params[1],
            unnorm_rotations=params[2],
            logit_opacities=params[3],
            log_scales=params[4],
            active=active,
        )
        return get_loss(
            gm_i, q, t, color, depth_gt, cam, pcfg, rcfg, False, True,
            means2d_dummy=dummy, mesh=mesh, pair_structure=ps,
        )

    if track_stats:
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    else:
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0,), has_aux=True)

    def body(i, carry):
        params, active, st, gsv, loss_sum, ovf_max, np_max, hist = carry
        it = start_iter + i
        slot = iter_slots[i]
        color = (
            kf_colors_u8[slot].astype(jnp.float32).transpose(2, 0, 1) / 255.0
        )
        depth_gt = kf_depths[slot]
        q, t = iter_qs[i], iter_ts[i]
        ps = (
            jax.tree.map(lambda x: x[iter_struct_idx[i]], ps_stack)
            if use_ps
            else None
        )

        # The screen-space dummy exists only to harvest 3DGS densification
        # stats; without them, passing None unlocks the fused isotropic
        # mapping path in get_loss.
        dummy = (
            jnp.zeros((gm.capacity, 2), jnp.float32) if track_stats else None
        )
        (loss, aux), grad_out = grad_fn(
            params, dummy, active, q, t, color, depth_gt, ps
        )
        grads = grad_out[0]
        if track_stats:
            # 3DGS densification statistics (utils/slam_external.py:100-104).
            d_dummy = grad_out[1]
            seen = aux.radii > 0
            accum, denom, max_rad = gsv
            gsv = (
                accum + jnp.where(seen, jnp.linalg.norm(d_dummy, axis=-1), 0.0),
                denom + seen.astype(jnp.float32),
                jnp.maximum(max_rad, jnp.where(seen, aux.radii.astype(jnp.float32), 0.0)),
            )
        if prune_cfg.enabled:
            active = _prune_mask(params, active, it, scene_radius, prune_cfg)
            if prune_cfg.reset_opacities:
                do_reset = (
                    (it > 0)
                    & (it % prune_cfg.reset_opacities_every == 0)
                    & (it <= prune_cfg.stop_after)
                )
                inv_sig = jnp.log(0.01 / 0.99)  # inverse_sigmoid(0.01)
                new_op = jnp.where(do_reset, jnp.full_like(params[3], inv_sig), params[3])
                params = params[:3] + (new_op,) + params[4:]
                st = optim.AdamState(
                    m=jax.tree.map(
                        lambda x: jnp.where(do_reset, jnp.zeros_like(x), x), st.m
                    ),
                    v=jax.tree.map(
                        lambda x: jnp.where(do_reset, jnp.zeros_like(x), x), st.v
                    ),
                    step=st.step,
                )
        params, st = optim.adam_step(st, params, grads, lr_tuple, eps=1e-15)
        hist = hist.at[i].set(
            jnp.stack([loss, aux.weighted_depth_loss, aux.weighted_im_loss])
        )
        return (
            params,
            active,
            st,
            gsv,
            loss_sum + loss,
            jnp.maximum(ovf_max, aux.overflow),
            jnp.maximum(np_max, aux.n_pairs),
            hist,
        )

    carry0 = (
        param_tuple, gm.active, opt_state, gsvars, jnp.float32(0),
        jnp.int32(0), jnp.int32(0), jnp.zeros((num_iters, 3), jnp.float32),
    )
    params, active, st, gsv, loss_sum, ovf, np_max, hist = jax.lax.fori_loop(
        0, num_iters, body, carry0
    )
    new_gm = gm._replace(
        means3d=params[0],
        rgb_colors=params[1],
        unnorm_rotations=params[2],
        logit_opacities=params[3],
        log_scales=params[4],
        active=active,
    )
    return new_gm, st, gsv, loss_sum, ovf, hist, np_max


# ---------------------------------------------------------------------------
# Densification (silhouette-guided unprojection into free slots)
# ---------------------------------------------------------------------------


def backproject_pointcloud(color, depth, fx, fy, cx, cy, c2w):
    """Dense pixel backprojection. Parity: get_pointcloud
    (scripts/splatam.py:67-117) — integer pixel grid, no half-pixel offset.

    color [3,H,W], depth [H,W] -> pts [H*W, 3] world, cols [H*W, 3],
    mean3_sq_dist [H*W].
    """
    h, w = depth.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xx = (xs.astype(jnp.float32) - cx) / fx
    yy = (ys.astype(jnp.float32) - cy) / fy
    z = depth.reshape(-1)
    pts_cam = jnp.stack([xx.reshape(-1) * z, yy.reshape(-1) * z, z], axis=-1)
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    cols = color.reshape(3, -1).T
    scale_gaussian = z / ((fx + fy) / 2.0)
    return pts, cols, scale_gaussian * scale_gaussian


@partial(jax.jit, static_argnames=("cam", "sil_thres", "rcfg", "mesh"))
def densify_step(
    gm: GaussianMap,
    timestep: jax.Array,  # [CAP] f32 creation-time per gaussian
    color: jax.Array,  # [3, H, W]
    depth_gt: jax.Array,  # [H, W]
    q: jax.Array,
    t: jax.Array,
    time_idx: jax.Array,
    cam: Camera,
    sil_thres: float,
    rcfg: RenderConfig,
    mesh=None,
):
    """add_new_gaussians (scripts/splatam.py:378-420) as a slot scatter.

    Returns (gm, timestep, n_added, n_dropped, overflow, n_pairs).
    """
    means_cam, rots_cam = transform_to_frame(gm, sg(q), sg(t), False, False)
    if mesh is not None:
        from splatam_tpu.parallel.spatial import render_rgbd_sil_sharded

        out = render_rgbd_sil_sharded(
            mesh, cam, means_cam, gm.rgb_colors, rots_cam,
            gm.logit_opacities, gm.log_scales, gm.active, rcfg,
        )
    else:
        out = render_rgbd_sil(
            cam, means_cam, gm.rgb_colors, rots_cam, gm.logit_opacities,
            gm.log_scales, gm.active, config=rcfg,
        )
    silhouette = out.silhouette
    render_depth = out.depth

    valid = depth_gt > 0
    depth_error = jnp.abs(depth_gt - render_depth) * valid
    non_presence = (silhouette < sil_thres) | (
        (render_depth > depth_gt) & (depth_error > 50.0 * _median_lower(depth_error))
    )
    cand = (non_presence & valid).reshape(-1)

    w2c = jnp.eye(4, dtype=jnp.float32)
    w2c = w2c.at[:3, :3].set(build_rotation(normalize(q)[None])[0])
    w2c = w2c.at[:3, 3].set(t)
    c2w = jnp.linalg.inv(w2c)
    pts, cols, mean_sq = backproject_pointcloud(
        color, depth_gt, cam.fx, cam.fy, cam.cx, cam.cy, c2w
    )

    cap = gm.capacity
    free = ~gm.active
    n_free = jnp.sum(free.astype(jnp.int32))
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(free, free_rank, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")

    cand_rank = jnp.cumsum(cand.astype(jnp.int32)) - 1
    n_cand = jnp.sum(cand.astype(jnp.int32))
    write = cand & (cand_rank < n_free)
    dest = jnp.where(write, slot_of_rank[jnp.clip(cand_rank, 0, cap - 1)], cap)

    s = gm.log_scales.shape[1]
    log_scale_new = 0.5 * jnp.log(jnp.maximum(mean_sq, 1e-12))

    gm = gm._replace(
        means3d=gm.means3d.at[dest].set(pts, mode="drop"),
        rgb_colors=gm.rgb_colors.at[dest].set(cols, mode="drop"),
        unnorm_rotations=gm.unnorm_rotations.at[dest].set(
            jnp.broadcast_to(
                jnp.asarray([1.0, 0, 0, 0], jnp.float32), (dest.shape[0], 4)
            ),
            mode="drop",
        ),
        logit_opacities=gm.logit_opacities.at[dest].set(
            jnp.zeros_like(log_scale_new), mode="drop"
        ),
        log_scales=gm.log_scales.at[dest].set(
            jnp.tile(log_scale_new[:, None], (1, s)), mode="drop"
        ),
        active=gm.active.at[dest].set(True, mode="drop"),
    )
    timestep = timestep.at[dest].set(time_idx.astype(jnp.float32), mode="drop")
    n_added = jnp.minimum(n_cand, n_free)
    return gm, timestep, n_added, n_cand - n_added, out.overflow, out.n_pairs


@partial(jax.jit, static_argnames=("cam",))
def count_pairs(gm: GaussianMap, q: jax.Array, t: jax.Array, cam: Camera):
    """Pair-count probe: the total (gaussian, tile) pair population a render
    at this pose/camera would expand (sum of alpha-cutoff rect areas —
    exactly build_bins' pre-clamp total). Projection only, no sort: compiles
    in seconds and runs in ~1 ms, letting the pipeline seed its
    measured-count pair budget at init, before any phase has compiled."""
    from splatam_tpu.render import projection as projection_mod
    from splatam_tpu.render.api import _prep_gaussians

    means_cam, rots_cam = transform_to_frame(gm, sg(q), sg(t), False, False)
    quats, logit_op, scales = _prep_gaussians(
        rots_cam, gm.logit_opacities, gm.log_scales
    )
    _, aux = projection_mod.project(
        means_cam, quats, logit_op, scales, gm.active, cam.w2c_array(),
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )
    counts = jnp.where(aux.visible, aux.rect_wh[:, 0] * aux.rect_wh[:, 1], 0)
    return jnp.sum(counts)


@partial(jax.jit, static_argnames=("cam",))
def first_frame_pointcloud(color, depth_gt, cam: Camera):
    """Dense init cloud for frame 0 (initialize_first_timestep,
    scripts/splatam.py:169-211): every valid-depth pixel becomes a Gaussian."""
    c2w = jnp.eye(4, dtype=jnp.float32)  # frame-0 pose is identity
    pts, cols, mean_sq = backproject_pointcloud(
        color, depth_gt, cam.fx, cam.fy, cam.cx, cam.cy, c2w
    )
    valid = (depth_gt > 0).reshape(-1)
    return pts, cols, mean_sq, valid
