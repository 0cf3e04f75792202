"""Multi-chip spatial (pixel-row) parallelism over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.2), so no
collective layout exists to port; this module is the TPU-native scaling
axis this framework adds: the image is sharded into row blocks across a
1-D mesh, the Gaussian map is replicated, every device renders and
differentiates its own sub-image with a cy-shifted camera, and per-Gaussian
gradients are combined with a single psum over ICI. Losses that need
cross-row context (SSIM windows) are computed with sum-form L1 terms here;
windowed losses get halo exchange in a later revision.

Used by __graft_entry__.dryrun_multichip and available as an opt-in
"spatial" mode for large-resolution mapping.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splatam_tpu.core.camera import Camera
from splatam_tpu.core.gaussians import GaussianMap
from splatam_tpu.render.api import RenderConfig, render_gaussians
from splatam_tpu.slam import optim
from splatam_tpu.slam.steps import transform_to_frame

AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def _local_render_loss(gm_arrays, q, t, color_rows, depth_rows, cam_local: Camera,
                       fx, fy, cx, cy_local, rcfg: RenderConfig):
    means3d, rgb, rots, logit_op, log_scales, active = gm_arrays
    gm = GaussianMap(means3d, rgb, rots, logit_op, log_scales, active)
    means_cam, rots_cam = transform_to_frame(gm, q, t, True, False)
    img, _, _, _ = render_gaussians(
        cam_local, means_cam, rgb, rots_cam, logit_op, log_scales, active,
        config=rcfg, intrinsics_override=(fx, fy, cx, cy_local),
    )
    im, depth = img[:3], img[3]
    valid = depth_rows > 0
    depth_loss = jnp.sum(jnp.abs(depth_rows - depth) * valid)
    im_loss = jnp.sum(jnp.abs(color_rows - im))
    return 1.0 * depth_loss + 0.5 * im_loss, jnp.sum(valid)


def make_sharded_train_step(mesh: Mesh, cam: Camera, rcfg: RenderConfig,
                            lrs: tuple, eps: float = 1e-15):
    """Build a jitted multi-chip mapping/training step.

    The returned step(gm_arrays, opt_state, q, t, color [3,H,W],
    depth [H,W]) -> (gm_arrays, opt_state, loss) runs a full
    forward+backward+Adam update with the image row-sharded over the mesh
    and Gaussian gradients psum-reduced across devices.
    """
    n_shards = mesh.devices.size
    if cam.height % (16 * n_shards) != 0:
        raise ValueError(
            f"height {cam.height} must be divisible by 16*{n_shards} for "
            "tile-aligned row sharding"
        )
    h_local = cam.height // n_shards
    cam_local = cam._replace(height=h_local)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, AXIS, None), P(AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_loss(gm_arrays, q, t, color, depth):
        row0 = jax.lax.axis_index(AXIS) * h_local
        cy_local = jnp.float32(cam.cy) - row0.astype(jnp.float32)
        loss, nvalid = _local_render_loss(
            gm_arrays, q, t, color, depth, cam_local,
            jnp.float32(cam.fx), jnp.float32(cam.fy), jnp.float32(cam.cx),
            cy_local, rcfg,
        )
        return jax.lax.psum(loss, AXIS), jax.lax.psum(nvalid, AXIS)

    def loss_fn(params, active, q, t, color, depth):
        gm_arrays = params + (active,)
        loss, _ = sharded_loss(gm_arrays, q, t, color, depth)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    lr_tuple = tuple(jnp.float32(lr) for lr in lrs)

    @jax.jit
    def step(params, active, opt_state, q, t, color, depth):
        loss, grads = grad_fn(params, active, q, t, color, depth)
        params, opt_state = optim.adam_step(opt_state, params, grads, lr_tuple, eps)
        return params, opt_state, loss

    def shard_frame(color, depth):
        """Place frame arrays with the row sharding on the mesh."""
        cs = NamedSharding(mesh, P(None, AXIS, None))
        ds = NamedSharding(mesh, P(AXIS, None))
        return jax.device_put(color, cs), jax.device_put(depth, ds)

    return step, shard_frame
