"""Fixed-capacity masked Gaussian map.

The reference stores the map as N-row tensors that are reshaped on every
densify/prune (scripts/splatam.py:411-418, utils/slam_external.py:139-160),
which would force an XLA recompile per shape change. Here the map lives in
[CAP, .] arrays with a boolean `active` mask; densification scatters into
free slots and pruning clears mask bits, so array shapes — and therefore
compiled programs — are stable. Capacity growth (host-side, rare) is the
only recompile trigger.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GaussianMap(NamedTuple):
    """Pytree of per-Gaussian parameters, padded to static capacity CAP.

    Shapes (CAP = capacity):
      means3d          [CAP, 3]  world-frame centers
      rgb_colors       [CAP, 3]
      unnorm_rotations [CAP, 4]  wxyz, normalized at render time
      logit_opacities  [CAP]     sigmoid at render time
      log_scales       [CAP, S]  S=1 isotropic / S=3 anisotropic; exp at render
      active           [CAP]     bool validity mask
    Parity for the parameter set: scripts/splatam.py:131-143.
    """

    means3d: jax.Array
    rgb_colors: jax.Array
    unnorm_rotations: jax.Array
    logit_opacities: jax.Array
    log_scales: jax.Array
    active: jax.Array

    @property
    def capacity(self) -> int:
        return self.means3d.shape[0]

    @property
    def isotropic(self) -> bool:
        return self.log_scales.shape[1] == 1

    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))


PARAM_FIELDS = ("means3d", "rgb_colors", "unnorm_rotations", "logit_opacities", "log_scales")


def empty_map(capacity: int, isotropic: bool = True) -> GaussianMap:
    s = 1 if isotropic else 3
    return GaussianMap(
        means3d=jnp.zeros((capacity, 3), jnp.float32),
        rgb_colors=jnp.zeros((capacity, 3), jnp.float32),
        unnorm_rotations=jnp.tile(
            jnp.asarray([1.0, 0, 0, 0], jnp.float32)[None], (capacity, 1)
        ),
        logit_opacities=jnp.zeros((capacity,), jnp.float32),
        log_scales=jnp.zeros((capacity, s), jnp.float32),
        active=jnp.zeros((capacity,), bool),
    )


def from_pointcloud(
    pts: jax.Array,
    cols: jax.Array,
    mean3_sq_dist: jax.Array,
    valid: jax.Array,
    capacity: int,
    isotropic: bool = True,
) -> GaussianMap:
    """Initialize a map from a (masked, padded) point cloud.

    Matches initialize_params (scripts/splatam.py:120-157): identity
    rotations, zero logit opacity (sigmoid -> 0.5), log_scales =
    log(sqrt(mean3_sq_dist)).

    pts/cols/mean3_sq_dist are [M, .] with validity mask `valid` [M];
    M must be <= capacity. Invalid rows are parked inactive.
    """
    m = pts.shape[0]
    if m > capacity:
        raise ValueError(f"pointcloud rows {m} exceed capacity {capacity}")
    gm = empty_map(capacity, isotropic=isotropic)
    s = gm.log_scales.shape[1]
    safe_sq = jnp.maximum(mean3_sq_dist, 1e-12)
    log_scales = jnp.tile(0.5 * jnp.log(safe_sq)[:, None], (1, s))
    gm = gm._replace(
        means3d=gm.means3d.at[:m].set(pts.astype(jnp.float32)),
        rgb_colors=gm.rgb_colors.at[:m].set(cols.astype(jnp.float32)),
        log_scales=gm.log_scales.at[:m].set(log_scales.astype(jnp.float32)),
        active=gm.active.at[:m].set(valid),
    )
    return gm


@jax.jit
def compact(gm: GaussianMap, timestep: jax.Array):
    """Gather active rows to the front (stable order preserved).

    Keeps the active set a dense prefix so the per-frame phase programs can
    run on a bucketed slice of the buffers (x4 rungs small, x1.5 large;
    pipeline._bucket) instead of full
    capacity — the main cost lever as the map grows. Densification fills
    the lowest free slots first, so the prefix property survives until the
    next pruning pass.
    """
    order = jnp.argsort(jnp.logical_not(gm.active), stable=True)

    def g(a):
        return a[order]

    return (
        GaussianMap(
            means3d=g(gm.means3d),
            rgb_colors=g(gm.rgb_colors),
            unnorm_rotations=g(gm.unnorm_rotations),
            logit_opacities=g(gm.logit_opacities),
            log_scales=g(gm.log_scales),
            active=g(gm.active),
        ),
        timestep[order],
    )


@jax.jit
def compact_with(gm: GaussianMap, timestep: jax.Array, extras: tuple):
    """compact() that also reorders auxiliary per-slot arrays (e.g. Adam
    moments, densification stats) with the same permutation."""
    order = jnp.argsort(jnp.logical_not(gm.active), stable=True)

    def g(a):
        return a[order]

    new_gm = GaussianMap(
        means3d=g(gm.means3d),
        rgb_colors=g(gm.rgb_colors),
        unnorm_rotations=g(gm.unnorm_rotations),
        logit_opacities=g(gm.logit_opacities),
        log_scales=g(gm.log_scales),
        active=g(gm.active),
    )
    return new_gm, timestep[order], jax.tree.map(g, extras)


def slice_prefix(gm: GaussianMap, timestep: jax.Array, n: int):
    """View of the first n slots (requires a compacted map)."""
    return (
        GaussianMap(
            means3d=gm.means3d[:n],
            rgb_colors=gm.rgb_colors[:n],
            unnorm_rotations=gm.unnorm_rotations[:n],
            logit_opacities=gm.logit_opacities[:n],
            log_scales=gm.log_scales[:n],
            active=gm.active[:n],
        ),
        timestep[:n],
    )


def write_prefix(gm: GaussianMap, view: GaussianMap) -> GaussianMap:
    """Write a prefix view's (updated) arrays back into the full buffers."""
    return GaussianMap(
        means3d=gm.means3d.at[: view.capacity].set(view.means3d),
        rgb_colors=gm.rgb_colors.at[: view.capacity].set(view.rgb_colors),
        unnorm_rotations=gm.unnorm_rotations.at[: view.capacity].set(view.unnorm_rotations),
        logit_opacities=gm.logit_opacities.at[: view.capacity].set(view.logit_opacities),
        log_scales=gm.log_scales.at[: view.capacity].set(view.log_scales),
        active=gm.active.at[: view.capacity].set(view.active),
    )


def grow_capacity(gm: GaussianMap, new_capacity: int) -> GaussianMap:
    """Host-side capacity growth (pads with inactive slots)."""
    if new_capacity < gm.capacity:
        raise ValueError("capacity can only grow")
    pad = new_capacity - gm.capacity
    if pad == 0:
        return gm
    fresh = empty_map(new_capacity, isotropic=gm.isotropic)

    def _cat(old, fresh_arr):
        return jnp.concatenate([old, fresh_arr[gm.capacity :]], axis=0)

    return GaussianMap(
        means3d=_cat(gm.means3d, fresh.means3d),
        rgb_colors=_cat(gm.rgb_colors, fresh.rgb_colors),
        unnorm_rotations=_cat(gm.unnorm_rotations, fresh.unnorm_rotations),
        logit_opacities=_cat(gm.logit_opacities, fresh.logit_opacities),
        log_scales=_cat(gm.log_scales, fresh.log_scales),
        active=_cat(gm.active, fresh.active),
    )


def compact_to_numpy(gm: GaussianMap) -> dict:
    """Drop inactive rows and return the reference's params dict schema
    (npz interchange format, scripts/splatam.py:973-986 shapes):
      means3D [N,3], rgb_colors [N,3], unnorm_rotations [N,4],
      logit_opacities [N,1], log_scales [N,S].
    """
    active = np.asarray(gm.active)
    idx = np.nonzero(active)[0]
    return {
        "means3D": np.asarray(gm.means3d)[idx],
        "rgb_colors": np.asarray(gm.rgb_colors)[idx],
        "unnorm_rotations": np.asarray(gm.unnorm_rotations)[idx],
        "logit_opacities": np.asarray(gm.logit_opacities)[idx][:, None],
        "log_scales": np.asarray(gm.log_scales)[idx],
    }


def from_params_dict(params: dict, capacity: int | None = None) -> GaussianMap:
    """Build a map from a reference-schema params dict (e.g. loaded npz)."""
    means = np.asarray(params["means3D"], np.float32)
    n = means.shape[0]
    cap = capacity or int(2 ** np.ceil(np.log2(max(n, 1) * 1.25)))
    cap = max(cap, n)
    log_scales = np.asarray(params["log_scales"], np.float32)
    if log_scales.ndim == 1:
        log_scales = log_scales[:, None]
    iso = log_scales.shape[1] == 1
    gm = empty_map(cap, isotropic=iso)
    return gm._replace(
        means3d=gm.means3d.at[:n].set(means),
        rgb_colors=gm.rgb_colors.at[:n].set(np.asarray(params["rgb_colors"], np.float32)),
        unnorm_rotations=gm.unnorm_rotations.at[:n].set(
            np.asarray(params["unnorm_rotations"], np.float32)
        ),
        logit_opacities=gm.logit_opacities.at[:n].set(
            np.asarray(params["logit_opacities"], np.float32).reshape(n)
        ),
        log_scales=gm.log_scales.at[:n].set(log_scales),
        active=gm.active.at[:n].set(True),
    )
