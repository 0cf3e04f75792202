"""Public render API: fused differentiable RGB/depth/silhouette rendering.

Replaces the reference's double rasterizer launch per loss evaluation
(`Renderer(cam)(**rendervar)` for RGB at scripts/splatam.py:249 plus
`Renderer(cam)(**depth_sil_rendervar)` with colors [z, 1, z^2] at :253) with
ONE fused pass that composites six channels: (r, g, b, z, 1, z^2). Channel
semantics are identical: silhouette = alpha-composited ones, depth =
composited per-Gaussian camera-z (utils/slam_helpers.py:196-213), and the
depth uncertainty E[z^2]-E[z]^2 falls out of channels 3 and 5.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.core.camera import Camera
from splatam_tpu.core.transforms import normalize
from splatam_tpu.render import binning as binning_mod
from splatam_tpu.render import composite_jax
from splatam_tpu.render import naive as naive_mod
from splatam_tpu.render import projection as projection_mod


@dataclass(frozen=True)
class RenderConfig:
    """Static knobs for the renderer (hashable: safe as a jit static arg)."""

    backend: str = "auto"  # "naive" | "tiles" | "pallas" | "auto"
    pair_cap: int = 1 << 21  # global (gaussian, tile) pair buffer capacity
    tile_k_max: int = 2048  # per-tile gaussian list capacity (tiles backend)
    # J-slot direct pair expansion (binning.build_bins direct_j): 0 = classic
    # spread path. Falls back to classic whenever pair_cap < J*N + 4096.
    direct_j: int = 0
    # Exact (gaussian, tile) alpha-cutoff culling (binning._tile_cull): drops
    # pairs whose whole tile sits below the 1/255 in-kernel alpha skip —
    # zero-contribution pairs only, so outputs move by reassociation ulps.
    tile_cull: bool = False

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "tiles"


class RenderOutput(NamedTuple):
    im: jax.Array  # [3, H, W] rgb
    depth: jax.Array  # [H, W] composited z
    silhouette: jax.Array  # [H, W] accumulated opacity
    depth_sq: jax.Array  # [H, W] composited z^2
    radii: jax.Array  # [N] int32 screen radius (0 = culled)
    overflow: jax.Array  # scalar int32: encoded, see split_overflow
    n_pairs: jax.Array  # scalar int32: actual (gaussian, tile) pairs


# The overflow scalar carries two distinct exhaustion channels whose remedies
# differ: bits 0..29 count pairs dropped because pair_cap filled (fix: grow
# pair_cap), bit 30 flags per-tile list truncation in the XLA tiles backend
# (tile_k_max too small for some tile — growing pair_cap can NEVER clear it;
# fix: grow tile_k_max). Packing both into one int32 keeps every phase/render
# return arity stable; truthiness (`overflow > 0` = something was dropped)
# is preserved for callers that only care whether the render is exact.
LIST_OVERFLOW_FLAG = 1 << 30


def encode_overflow(pair_overflow: jax.Array, list_overflow: jax.Array) -> jax.Array:
    cnt = jnp.minimum(pair_overflow, LIST_OVERFLOW_FLAG - 1).astype(jnp.int32)
    return cnt | jnp.where(
        list_overflow > 0, jnp.int32(LIST_OVERFLOW_FLAG), jnp.int32(0)
    )


def split_overflow(overflow: int) -> tuple[int, bool]:
    """Decode an overflow scalar -> (dropped pair count, tile-list flag)."""
    ovf = int(overflow)
    return ovf & (LIST_OVERFLOW_FLAG - 1), bool(ovf & LIST_OVERFLOW_FLAG)


class PairStructure(NamedTuple):
    """The geometry-only binning state of one render: (gaussian, tile) pair
    expansion, tile sort, padded layout, and the backward's gaussian-grouped
    permutation. It is a pure function of (pose, means, scales, opacities)
    under stop_gradient, so optimization loops whose geometry drifts slowly
    (tracking: one camera pose nudged by tiny Adam steps; mapping: params
    moving at 1e-4-scale lrs) can REUSE it across iterations and re-derive
    only the cheap per-iteration attributes. Correctness note: per-pair
    alpha is always evaluated from the CURRENT iteration's exact projection,
    and the 1/255 alpha cutoff coincides with the rect bound, so a stale
    structure only misses contributions that the cutoff would have skipped
    anyway (plus sub-quantization depth-order drift). Exact per-iteration
    binning = rebin_every 1 (the default)."""

    bins: binning_mod.Bins
    # Pallas-backend padded layout (None under the tiles/naive backends).
    pad_gauss: jax.Array | None
    pad_start: jax.Array | None
    lens: jax.Array | None
    dst: jax.Array | None
    gid_sorted: jax.Array | None
    dst_sorted: jax.Array | None
    # Pair-space tracking only: WORLD-frame attr rows gathered into the
    # padded layout ([16, P_pad], render.pairspace.pack_world_rows). The
    # per-iteration render then projects per PAIR with no gathers and no
    # pairs->gaussian gradient reduction (gradients stop at the pose).
    world16: jax.Array | None = None
    # Fused isotropic tracking (render.pallas.fused_iso): [8, P_pad] world
    # rows streamed straight into the kernels, which project per pair
    # IN-KERNEL. Populated instead of world16 when the map is isotropic.
    world8: jax.Array | None = None


def _prep_gaussians(unnorm_rotations, logit_opacities, log_scales):
    n = logit_opacities.shape[0] if logit_opacities.ndim == 1 else logit_opacities.shape[0]
    if log_scales.shape[1] == 1:
        log_scales = jnp.tile(log_scales, (1, 3))
    scales = jnp.exp(log_scales)
    quats = normalize(unnorm_rotations)
    logit_op = logit_opacities.reshape(n)
    return quats, logit_op, scales


def pallas_layout(bins: binning_mod.Bins, num_tiles: int, n_gauss: int):
    """Padded per-tile layout + the backward's gaussian-grouped sort.

    Both are pure functions of the binning; computing them here (instead of
    inside the composite fwd/bwd) lets a reused PairStructure amortize them
    across iterations."""
    from splatam_tpu.render.pallas import composite_pallas as CP

    pair_cap = bins.pair_gauss.shape[0]
    # +1 tile of slack: the fused forward block-fetches TWO C-chunks per
    # DMA (render.pallas.fused_iso), so a tile with an odd chunk count
    # over-reads up to C lanes past its own segment. Worst-case segment
    # packing can end within C of pair_cap + num_tiles*C, so the extra C
    # guarantees the over-read stays inside the allocation (the fetched
    # lanes are masked by the kernels' in_range test; pad slots hold
    # gaussian-0 attrs, which are finite).
    pad_cap = pair_cap + (num_tiles + 1) * CP.C
    pad_gauss, pad_start, lens, dst = binning_mod.padded_layout(
        bins, num_tiles, pad_cap, align=CP.C
    )
    # Group pairs by gaussian for the backward's segmented reduction: slots
    # past n_pairs carry dst == pad_cap and the sentinel id n_gauss, sorting
    # to the tail with zero grads.
    gid = jnp.where(dst < pad_cap, bins.pair_gauss, jnp.int32(n_gauss))
    gid_sorted, dst_sorted = jax.lax.sort_key_val(gid, dst, is_stable=False)
    return pad_gauss, pad_start, lens, dst, gid_sorted, dst_sorted


def compute_pair_structure(
    cam: Camera,
    means3d: jax.Array,
    unnorm_rotations: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    config: RenderConfig,
    intrinsics_override: tuple | None = None,
    lim_wh: tuple | None = None,
) -> PairStructure:
    """Build the reusable binning structure for a render at this geometry.

    All inputs are treated as constants (stop_gradient)."""
    sg = jax.lax.stop_gradient
    means3d, unnorm_rotations = sg(means3d), sg(unnorm_rotations)
    logit_opacities, log_scales = sg(logit_opacities), sg(log_scales)
    quats, logit_op, scales = _prep_gaussians(
        unnorm_rotations, logit_opacities, log_scales
    )
    if intrinsics_override is not None:
        fx, fy, cx, cy = intrinsics_override
    else:
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    proj, aux = projection_mod.project(
        means3d, quats, logit_op, scales, active, cam.w2c_array(),
        fx, fy, cx, cy, cam.width, cam.height, lim_wh=lim_wh,
    )
    bins = binning_mod.build_bins(
        proj, aux, cam.width, cam.height, config.pair_cap, far=cam.far,
        direct_j=config.direct_j, tile_cull=config.tile_cull,
    )
    if config.resolve_backend() == "pallas":
        layout = pallas_layout(
            bins, _num_tiles(cam.width, cam.height), means3d.shape[0]
        )
    else:
        layout = (None,) * 6
    return PairStructure(bins, *layout)


def _num_tiles(width: int, height: int) -> int:
    gx, gy = binning_mod.grid_shape(width, height)
    return gx * gy


def _composite_backend(cfg: RenderConfig, cam: Camera, xy, conic, opacity, depth,
                       channels, aux, pair_structure: PairStructure | None = None):
    """Dispatch the compositing stage -> (image [C,H,W], overflow, n_pairs)."""
    backend = cfg.resolve_backend()
    w, h = cam.width, cam.height
    proj = projection_mod.Projected(xy=xy, depth=depth, conic=conic, opacity=opacity)
    if backend == "naive":
        img = naive_mod.composite_naive(proj, aux, channels, w, h)
        return img, jnp.int32(0), jnp.int32(0)

    grid_x, grid_y = binning_mod.grid_shape(w, h)
    num_tiles = grid_x * grid_y

    if pair_structure is not None:
        ps = pair_structure
    else:
        bins = binning_mod.build_bins(
            proj._replace(depth=jax.lax.stop_gradient(depth)), aux, w, h,
            cfg.pair_cap, far=cam.far, direct_j=cfg.direct_j,
            tile_cull=cfg.tile_cull,
        )
        if backend == "pallas":
            ps = PairStructure(bins, *pallas_layout(bins, num_tiles, xy.shape[0]))
        else:
            ps = PairStructure(bins, *((None,) * 6))
    bins = ps.bins

    if backend == "pallas":
        from splatam_tpu.render.pallas import composite_pallas

        img, list_overflow = composite_pallas.composite(
            xy, conic, opacity, channels, ps, w, h
        )
        return img, encode_overflow(bins.overflow, list_overflow), bins.n_pairs

    lists, lens, list_overflow = binning_mod.tile_lists(bins, num_tiles, cfg.tile_k_max)
    px, py = composite_jax.tile_pixel_coords(w, h)
    acc = composite_jax.composite_tiles(
        xy, conic, opacity, channels, lists, lens, jnp.asarray(px), jnp.asarray(py)
    )
    img = composite_jax.assemble_image(acc, w, h)
    return img, encode_overflow(bins.overflow, list_overflow), bins.n_pairs


def render_gaussians(
    cam: Camera,
    means3d: jax.Array,
    colors: jax.Array,
    unnorm_rotations: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    config: RenderConfig = RenderConfig(),
    means2d_dummy: jax.Array | None = None,
    append_depth_channels: bool = True,
    intrinsics_override: tuple | None = None,
    lim_wh: tuple | None = None,
    pair_structure: PairStructure | None = None,
):
    """Differentiable render of arbitrary per-Gaussian color channels.

    means3d are in the frame cam.w2c maps FROM (the SLAM loop passes
    camera-frame Gaussians with an identity w2c, mirroring
    transform_to_frame + first-frame camera in the reference).

    Returns (img [C(+3), H, W], radii [N], overflow scalar, n_pairs scalar).
    When
    `append_depth_channels`, three channels [z, 1, z^2] are appended after
    the user channels.

    `pair_structure` reuses a precomputed binning (see PairStructure); per-
    pair attributes still come from THIS call's exact projection.
    """
    n = means3d.shape[0]
    quats, logit_op, scales = _prep_gaussians(
        unnorm_rotations, logit_opacities, log_scales
    )

    if intrinsics_override is not None:
        # Traced intrinsics (e.g. per-shard cy under SPMD row sharding);
        # height/width stay static from `cam`.
        fx, fy, cx, cy = intrinsics_override
    else:
        fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    proj, aux = projection_mod.project(
        means3d, quats, logit_op, scales, active, cam.w2c_array(),
        fx, fy, cx, cy, cam.width, cam.height, lim_wh=lim_wh,
    )
    if pair_structure is not None:
        # A stale structure may still list gaussians pruned (active=False)
        # since it was built; zeroing their opacity reproduces the exact
        # no-contribution semantics (alpha < 1/255 skip).
        proj = proj._replace(
            opacity=jnp.where(active, proj.opacity, 0.0)
        )

    backend = config.resolve_backend()
    chans = [colors]
    if append_depth_channels:
        if backend == "pallas":
            # The pallas compositor emits the silhouette from its tracked
            # transmittance (sil == 1 - T_final) instead of compositing a
            # stored constant-1 channel — only [z, z^2] are appended here
            # and the rows are re-ordered to the public layout below.
            chans.append(
                jnp.stack([proj.depth, proj.depth * proj.depth], axis=-1)
            )
        else:
            ones = jnp.ones_like(proj.depth)
            chans.append(
                jnp.stack([proj.depth, ones, proj.depth * proj.depth], axis=-1)
            )
    channels = jnp.concatenate(chans, axis=-1) if len(chans) > 1 else colors

    xy = proj.xy
    if means2d_dummy is not None:
        # Dummy zero input that harvests screen-space gradients with the
        # reference's NDC half-extent scaling (dL/ddummy = [W/2, H/2]*dL/dpix),
        # consumed by 3DGS densification stats (utils/slam_external.py:100-104).
        scale = jnp.asarray([cam.width * 0.5, cam.height * 0.5], jnp.float32)
        xy = xy + means2d_dummy * scale

    img, overflow, n_pairs = _composite_backend(
        config, cam, xy, proj.conic, proj.opacity, proj.depth, channels, aux,
        pair_structure=pair_structure,
    )
    if backend == "pallas":
        nu = channels.shape[1]
        if append_depth_channels:
            # pallas rows [user..., z, z^2, sil] -> public [user..., z, sil,
            # z^2] (matching the tiles/naive [z, ones, z^2] channel order).
            img = jnp.concatenate(
                [img[: nu - 1], img[nu : nu + 1], img[nu - 1 : nu]], axis=0
            )
        else:
            img = img[:nu]  # drop the appended silhouette row
    return img, aux.radius, overflow, n_pairs


def render_rgbd_sil_pairspace(
    cam: Camera,
    ps: PairStructure,
    q: jax.Array,
    t: jax.Array,
    n_gauss: int,
) -> RenderOutput:
    """Pair-space tracking render (pallas backend only): per-pair EWA
    projection of ps.world16/world8 at pose (q, t), gradients pairs -> pose.

    Semantics match render_rgbd_sil under a reused pair_structure
    (stale rects, fresh per-pair alpha); see render.pairspace. With
    ps.world8 (isotropic map) the projection happens INSIDE the Pallas
    kernels (render.pallas.fused_iso) and pose grads come from two tiny
    matmuls on the kernel's per-pair world grads."""
    if ps.world8 is not None:
        from splatam_tpu.render.pallas import fused_iso

        img = fused_iso.composite_fused_pairs(ps.world8, ps, cam, q, t)
    else:
        from splatam_tpu.render import pairspace
        from splatam_tpu.render.pallas import composite_pallas

        padded16 = pairspace.project_pairs(
            ps.world16, q, t, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height,
        )
        img = composite_pallas.composite_pairs(
            padded16, ps, cam.width, cam.height
        )
    # pallas rows [r, g, b, z, z^2, sil] -> public [r, g, b, z, sil, z^2].
    return RenderOutput(
        im=img[:3],
        depth=img[3],
        silhouette=img[5],
        depth_sq=img[4],
        radii=jnp.zeros((n_gauss,), jnp.int32),  # unused by tracking
        overflow=encode_overflow(ps.bins.overflow, jnp.int32(0)),
        n_pairs=ps.bins.n_pairs,
    )


def render_rgbd_sil_mapping_fused(
    cam: Camera,
    ps: PairStructure,
    means3d: jax.Array,
    rgb_colors: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,  # [N, 1] isotropic
    active: jax.Array,
    q: jax.Array,
    t: jax.Array,
) -> RenderOutput:
    """Mapping fused render (pallas backend, isotropic map): per-iteration
    world-8 gather + in-kernel projection (render.pallas.fused_iso), with
    gradients flowing to every gaussian parameter through the grouped
    segmented reduction at half the generic row width. The pose is a
    constant here (callers stop_gradient it, mirroring transform_to_frame's
    mapping flags — utils/slam_helpers.py:266-288).

    Semantics match render_rgbd_sil under a reused pair_structure: per-pair
    alpha comes from the CURRENT params/pose, rects from the rebin-time
    structure, and pruned gaussians are silenced via zeroed opacity.

    STATS-FREE BY CONTRACT: the returned radii are all-zero (the in-kernel
    projection never materializes per-gaussian screen radii), so any
    consumer of 3DGS densification stats ('seen = radii > 0',
    slam/steps.py mapping body) would silently see every gaussian as
    unseen. get_loss enforces this by routing here only when
    means2d_dummy is None, which mapping_phase passes only with
    track_stats=False — keep that gate in sync with this return."""
    from splatam_tpu.render.pallas import fused_iso

    img = fused_iso.composite_fused_gauss(
        means3d, logit_opacities, log_scales, rgb_colors, active,
        ps, cam, q, t,
    )
    # fused rows [r, g, b, z, z^2, sil] -> public layout.
    return RenderOutput(
        im=img[:3],
        depth=img[3],
        silhouette=img[5],
        depth_sq=img[4],
        # All-zero by contract (see docstring): callers needing real radii
        # must use the generic path (pass a means2d_dummy to get_loss).
        radii=jnp.zeros((means3d.shape[0],), jnp.int32),
        overflow=encode_overflow(ps.bins.overflow, jnp.int32(0)),
        n_pairs=ps.bins.n_pairs,
    )


def render_rgbd_sil(
    cam: Camera,
    means3d: jax.Array,
    rgb_colors: jax.Array,
    unnorm_rotations: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    config: RenderConfig = RenderConfig(),
    means2d_dummy: jax.Array | None = None,
    pair_structure: PairStructure | None = None,
) -> RenderOutput:
    """Fused RGB + depth + silhouette + depth^2 render (six channels)."""
    img, radii, overflow, n_pairs = render_gaussians(
        cam,
        means3d,
        rgb_colors,
        unnorm_rotations,
        logit_opacities,
        log_scales,
        active,
        config=config,
        means2d_dummy=means2d_dummy,
        append_depth_channels=True,
        pair_structure=pair_structure,
    )
    return RenderOutput(
        im=img[:3],
        depth=img[3],
        silhouette=img[4],
        depth_sq=img[5],
        radii=radii,
        overflow=overflow,
        n_pairs=n_pairs,
    )
