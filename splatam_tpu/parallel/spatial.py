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
from splatam_tpu.render.api import RenderConfig, RenderOutput, render_gaussians

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
) -> RenderOutput:
    """Row-sharded drop-in for render_rgbd_sil.

    Each shard renders rows [k*h_local, (k+1)*h_local) of a height-padded
    image with the same intrinsics and cy shifted by -k*h_local, then the
    row blocks are all-gathered and cropped back to cam.height, so the
    returned image is numerically the single-chip render (pixel math never
    crosses row blocks; a Gaussian overlapping a boundary is composited by
    both owners onto disjoint pixels). radii are pmax-combined because each
    shard culls against its own tile grid.
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

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def rend(means_cam, colors, rots_cam, logit_op, log_scales, active, dummy):
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
        )
        img_full = jax.lax.all_gather(img, AXIS, axis=1, tiled=True)
        radii = jax.lax.pmax(radii, AXIS)
        overflow = jax.lax.pmax(overflow, AXIS)
        n_pairs = jax.lax.psum(n_pairs, AXIS)
        return img_full, radii, overflow, n_pairs

    img, radii, overflow, n_pairs = rend(
        means_cam, colors, rots_cam, logit_opacities, log_scales, active, dummy
    )
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
