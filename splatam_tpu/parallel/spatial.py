"""Multi-chip spatial (pixel-row) parallelism over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.2), so no
collective layout exists to port; this module is the TPU-native scaling
axis this framework adds. The image is split into row blocks across a 1-D
mesh: the Gaussian map is replicated, every device projects/bins/composites
its own row block with a cy-shifted camera, and the partial images are
all-gathered so the LOSS math (silhouette masks, outlier median, SSIM
windows) runs bit-identically to the single-chip path on every device. The
gather is a few MB per step and rides ICI; its transpose scatters pixel
cotangents back to the owning shard and the per-Gaussian parameter
gradients come out of shard_map's psum automatically.

Used by steps.get_loss / steps.densify_step when a mesh is passed (wired
from config["tpu"]["spatial_shards"] in slam/pipeline.py) and by
__graft_entry__.dryrun_multichip, which runs the REAL tracking and mapping
phase programs over the mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from splatam_tpu.core.camera import Camera
from splatam_tpu.render.api import (
    RenderConfig, RenderOutput, encode_overflow, render_gaussians,
)

AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def shard_heights(height: int, n_shards: int) -> tuple[int, int]:
    """(h_local, h_padded): per-shard rows (16px-tile aligned) and the
    padded render height h_local * n_shards >= height."""
    h_local = -(-height // n_shards)
    h_local = -(-h_local // 16) * 16
    return h_local, h_local * n_shards


def _local(ps_sh):
    """Strip the leading unit device axis off a shard-local PairStructure."""
    return jax.tree.map(lambda x: x[0], ps_sh)


def compute_pair_structure_sharded(
    mesh: Mesh,
    cam: Camera,
    means_cam: jax.Array,
    rots_cam: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    rcfg: RenderConfig,
    world_rows: jax.Array | None = None,
    world_rows8: jax.Array | None = None,
):
    """Row-sharded render.api.compute_pair_structure: every shard expands,
    sorts, and lays out ONLY the (gaussian, tile) pairs of its own row block
    (its cy-shifted camera culls the rest at the tile-rect stage), so the
    binning work — the dominant structure cost — shrinks ~1/n_shards per
    device instead of being replicated. Only the O(N) projection itself is
    replicated (~2 ms at 1M gaussians, full res).

    rcfg.pair_cap is the PER-SHARD pair budget. `world_rows` ([N, 16],
    render.pairspace.pack_world_rows) additionally gathers each shard's
    world16 for the generic pair-space tracking path; `world_rows8`
    ([N, 8], render.pallas.fused_iso.pack_world8) gathers the isotropic
    world-8 rows instead, unlocking the fused in-kernel-projection path
    per shard (mutually exclusive with world_rows).

    Returns a PairStructure pytree whose leaves carry a leading
    [n_shards, ...] device axis (sharded over the mesh); feed it back to
    render_rgbd_sil_sharded / render_rgbd_sil_pairspace_sharded.
    """
    from splatam_tpu.render.api import compute_pair_structure

    n_shards = mesh.devices.size
    h_local, _ = shard_heights(cam.height, n_shards)
    cam_local = cam._replace(height=h_local)
    w8 = world_rows8 is not None

    def build(means_cam, rots_cam, logit_op, log_scales, active, *maybe_world):
        row0 = (jax.lax.axis_index(AXIS) * h_local).astype(jnp.float32)
        ps = compute_pair_structure(
            cam_local, means_cam, rots_cam, logit_op, log_scales, active,
            rcfg,
            intrinsics_override=(
                jnp.float32(cam.fx), jnp.float32(cam.fy),
                jnp.float32(cam.cx), jnp.float32(cam.cy) - row0,
            ),
            lim_wh=(cam.width, cam.height),
        )
        if maybe_world and ps.pad_gauss is not None:
            from splatam_tpu.render.pallas.composite_pallas import (
                _pad_cols, _split_row_gather,
            )

            if w8:
                ps = ps._replace(
                    world8=_split_row_gather(maybe_world[0], ps.pad_gauss).T
                )
            else:
                ps = ps._replace(
                    world16=_pad_cols(
                        _split_row_gather(maybe_world[0], ps.pad_gauss)
                    ).T
                )
        return jax.tree.map(lambda x: x[None], ps)

    args = (means_cam, rots_cam, logit_opacities, log_scales, active)
    if world_rows is not None or w8:
        args = args + (world_rows8 if w8 else world_rows,)
    fn = jax.shard_map(
        build,
        mesh=mesh,
        in_specs=(P(),) * len(args),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(*args)


def render_rgbd_sil_pairspace_sharded(
    mesh: Mesh,
    cam: Camera,
    ps_sh,
    q: jax.Array,
    t: jax.Array,
    n_gauss: int,
) -> RenderOutput:
    """Row-sharded render.api.render_rgbd_sil_pairspace: each shard projects
    its OWN world16/world8 pairs at pose (q, t) against its cy-shifted row
    block and composites locally; the row blocks are all-gathered and the
    pose cotangents psum automatically through shard_map's replicated-input
    transpose. Numerics per pixel are identical to the single-chip
    pair-space path (pixel math never crosses row blocks). With ps.world8
    (isotropic map) each shard runs the fused in-kernel-projection kernels
    (render.pallas.fused_iso) on its row block — the cy shift and the
    full-image frustum limits ride the kernels' dynamic pose vector."""
    from splatam_tpu.render import pairspace
    from splatam_tpu.render.pallas import composite_pallas, fused_iso

    n_shards = mesh.devices.size
    h_local, _ = shard_heights(cam.height, n_shards)
    h_full = cam.height
    cam_local = cam._replace(height=h_local)
    use_w8 = ps_sh.world8 is not None
    limx = 1.3 * (cam.width / (2.0 * cam.fx))
    limy = 1.3 * (h_full / (2.0 * cam.fy))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def rend(ps_sh, q, t):
        ps = _local(ps_sh)
        row0 = (jax.lax.axis_index(AXIS) * h_local).astype(jnp.float32)
        if use_w8:
            intr = jnp.stack(
                [jnp.float32(cam.fx), jnp.float32(cam.fy),
                 jnp.float32(cam.cx), jnp.float32(cam.cy) - row0,
                 jnp.float32(limx), jnp.float32(limy)]
            )
            img = fused_iso.composite_fused_pairs(
                ps.world8, ps, cam_local, q, t, intr_vec=intr
            )
        else:
            padded16 = pairspace.project_pairs(
                ps.world16, q, t,
                jnp.float32(cam.fx), jnp.float32(cam.fy),
                jnp.float32(cam.cx), jnp.float32(cam.cy) - row0,
                cam.width, h_local, lim_wh=(cam.width, h_full),
            )
            img = composite_pallas.composite_pairs(
                padded16, ps, cam.width, h_local
            )
        img_full = jax.lax.all_gather(img, AXIS, axis=1, tiled=True)
        overflow = jax.lax.pmax(ps.bins.overflow, AXIS)
        n_pairs = jax.lax.psum(ps.bins.n_pairs, AXIS)
        return img_full, overflow, n_pairs

    img, overflow, n_pairs = rend(ps_sh, q, t)
    img = img[:, :h_full, :]
    # pallas rows [r, g, b, z, z^2, sil] -> public [r, g, b, z, sil, z^2].
    return RenderOutput(
        im=img[:3],
        depth=img[3],
        silhouette=img[5],
        depth_sq=img[4],
        radii=jnp.zeros((n_gauss,), jnp.int32),  # unused by tracking
        overflow=encode_overflow(overflow, jnp.int32(0)),
        n_pairs=n_pairs,
    )


def render_rgbd_sil_mapping_fused_sharded(
    mesh: Mesh,
    cam: Camera,
    ps_sh,
    means3d: jax.Array,
    rgb_colors: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    q: jax.Array,
    t: jax.Array,
) -> RenderOutput:
    """Row-sharded render.api.render_rgbd_sil_mapping_fused: each shard
    runs the fused isotropic gauss kernels (render.pallas.fused_iso) on its
    own row-block pair structure; the gaussian params are replicated
    inputs, so their per-shard world-space gradients psum automatically
    through shard_map's transpose. Stats-free by the same contract as the
    single-chip fused mapping path (radii are all-zero)."""
    from splatam_tpu.render.pallas import fused_iso

    n_shards = mesh.devices.size
    h_local, _ = shard_heights(cam.height, n_shards)
    h_full = cam.height
    cam_local = cam._replace(height=h_local)
    limx = 1.3 * (cam.width / (2.0 * cam.fx))
    limy = 1.3 * (h_full / (2.0 * cam.fy))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def rend(ps_sh, means3d, rgb, logit_op, log_scales, active, q, t):
        ps = _local(ps_sh)
        row0 = (jax.lax.axis_index(AXIS) * h_local).astype(jnp.float32)
        intr = jnp.stack(
            [jnp.float32(cam.fx), jnp.float32(cam.fy),
             jnp.float32(cam.cx), jnp.float32(cam.cy) - row0,
             jnp.float32(limx), jnp.float32(limy)]
        )
        img = fused_iso.composite_fused_gauss(
            means3d, logit_op, log_scales, rgb, active, ps, cam_local, q, t,
            intr_vec=intr,
        )
        img_full = jax.lax.all_gather(img, AXIS, axis=1, tiled=True)
        overflow = jax.lax.pmax(ps.bins.overflow, AXIS)
        n_pairs = jax.lax.psum(ps.bins.n_pairs, AXIS)
        return img_full, overflow, n_pairs

    img, overflow, n_pairs = rend(
        ps_sh, means3d, rgb_colors, logit_opacities, log_scales, active, q, t
    )
    img = img[:, :h_full, :]
    # fused rows [r, g, b, z, z^2, sil] -> public layout.
    return RenderOutput(
        im=img[:3],
        depth=img[3],
        silhouette=img[5],
        depth_sq=img[4],
        radii=jnp.zeros((means3d.shape[0],), jnp.int32),  # stats-free
        overflow=encode_overflow(overflow, jnp.int32(0)),
        n_pairs=n_pairs,
    )


def render_rgbd_sil_sharded(
    mesh: Mesh,
    cam: Camera,
    means_cam: jax.Array,
    colors: jax.Array,
    rots_cam: jax.Array,
    logit_opacities: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    rcfg: RenderConfig,
    means2d_dummy: jax.Array | None = None,
    pair_structure=None,
) -> RenderOutput:
    """Row-sharded drop-in for render_rgbd_sil.

    Each shard renders rows [k*h_local, (k+1)*h_local) of a height-padded
    image with the same intrinsics and cy shifted by -k*h_local, then the
    row blocks are all-gathered and cropped back to cam.height, so the
    returned image is numerically the single-chip render (pixel math never
    crosses row blocks; a Gaussian overlapping a boundary is composited by
    both owners onto disjoint pixels). radii are pmax-combined because each
    shard culls against its own tile grid.

    `pair_structure` reuses a compute_pair_structure_sharded result (leading
    device axis): each shard composites from its own row-block structure,
    so the per-iteration binning cost is gone exactly as on one chip.
    """
    n_shards = mesh.devices.size
    h_local, h_pad = shard_heights(cam.height, n_shards)
    cam_local = cam._replace(height=h_local)
    h_full = cam.height

    if means2d_dummy is None:
        dummy = jnp.zeros((means_cam.shape[0], 2), jnp.float32)
    else:
        # render_gaussians scales the dummy by the LOCAL [W/2, H/2]; correct
        # the y-scale so dL/ddummy keeps the reference's full-image NDC
        # half-extent scaling (utils/slam_external.py:100-104).
        dummy = means2d_dummy * jnp.asarray(
            [1.0, h_full / h_local], jnp.float32
        )

    have_ps = pair_structure is not None
    ps_spec = (P(AXIS),) if have_ps else ()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()) + ps_spec,
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def rend(means_cam, colors, rots_cam, logit_op, log_scales, active, dummy,
             *maybe_ps):
        row0 = (jax.lax.axis_index(AXIS) * h_local).astype(jnp.float32)
        img, radii, overflow, n_pairs = render_gaussians(
            cam_local,
            means_cam,
            colors,
            rots_cam,
            logit_op,
            log_scales,
            active,
            config=rcfg,
            means2d_dummy=dummy,
            intrinsics_override=(
                jnp.float32(cam.fx),
                jnp.float32(cam.fy),
                jnp.float32(cam.cx),
                jnp.float32(cam.cy) - row0,
            ),
            lim_wh=(cam.width, cam.height),
            pair_structure=_local(maybe_ps[0]) if maybe_ps else None,
        )
        img_full = jax.lax.all_gather(img, AXIS, axis=1, tiled=True)
        radii = jax.lax.pmax(radii, AXIS)
        overflow = jax.lax.pmax(overflow, AXIS)
        n_pairs = jax.lax.psum(n_pairs, AXIS)
        return img_full, radii, overflow, n_pairs

    args = (means_cam, colors, rots_cam, logit_opacities, log_scales, active,
            dummy)
    if have_ps:
        args = args + (pair_structure,)
    img, radii, overflow, n_pairs = rend(*args)
    img = img[:, :h_full, :]
    return RenderOutput(
        im=img[:3],
        depth=img[3],
        silhouette=img[4],
        depth_sq=img[5],
        radii=radii,
        overflow=overflow,
        n_pairs=n_pairs,
    )
