"""Online RGB-D SLAM pipeline: per-frame track -> densify -> map.

Host-side orchestration of the jitted phase programs in slam/steps.py.
Parity target: scripts/splatam.py:455-990 (rgbd_slam), with the TPU-native
re-architecture documented in SURVEY.md section 7:
  * fixed-capacity masked Gaussian buffers (grow-on-demand, rare recompile)
  * one device dispatch per phase (whole optimization loops inside jit)
  * device-resident keyframe store (uint8 color + f32 depth), sampled by
    slot index inside the mapping program
  * camera trajectory kept host-side as numpy [F,4]/[F,3] arrays
"""
from __future__ import annotations

import atexit
import os
import sys
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from splatam_tpu.core import gaussians as G
from splatam_tpu.core.camera import Camera, setup_camera
from splatam_tpu.core.transforms import build_rotation, matrix_to_quaternion, normalize
from splatam_tpu.data import get_dataset, load_dataset_config
from splatam_tpu.eval.evaluate import eval_sequence
from splatam_tpu.io.params_io import save_params, save_params_ckpt
from splatam_tpu.render.api import RenderConfig, split_overflow
from splatam_tpu.slam import optim, steps
from splatam_tpu.slam.config import backfill_defaults
from splatam_tpu.slam.keyframes import keyframe_selection_overlap


# Every live background-compile thread, across all runtimes. Daemon threads
# mid-PJRT-compile at interpreter exit abort the process ("terminate called
# after throwing an instance of ..." — BENCH_r04 rc=134), so exit must wait
# for them: atexit runs before daemon threads are frozen, making teardown
# deterministic. SLAMRuntime.shutdown() drains a single runtime's threads
# earlier so a normal run reaches atexit with nothing left to join.
_LIVE_COMPILES: set = set()
_LIVE_COMPILES_LOCK = threading.Lock()


def _join_live_compiles() -> None:
    while True:
        with _LIVE_COMPILES_LOCK:
            threads = [th for th in _LIVE_COMPILES if th.is_alive()]
        if not threads:
            return
        for th in threads:
            th.join()


atexit.register(_join_live_compiles)


def _phase_cfg(section: dict) -> steps.PhaseConfig:
    return steps.PhaseConfig(
        use_sil_for_loss=section["use_sil_for_loss"],
        sil_thres=section["sil_thres"],
        use_l1=section["use_l1"],
        ignore_outlier_depth_loss=section["ignore_outlier_depth_loss"],
        w_im=section["loss_weights"]["im"],
        w_depth=section["loss_weights"]["depth"],
        depth_unc_thres=float(section.get("depth_uncertainty_thres", 0.0)),
        outlier_floor=float(section.get("outlier_floor_m", 0.0)),
    )


def _prune_cfg(mapping: dict) -> steps.PruneConfig:
    if not mapping.get("prune_gaussians", False):
        return steps.PruneConfig(enabled=False)
    d = mapping["pruning_dict"]
    return steps.PruneConfig(
        enabled=True,
        start_after=d["start_after"],
        remove_big_after=d["remove_big_after"],
        stop_after=d["stop_after"],
        prune_every=d["prune_every"],
        removal_opacity_threshold=d["removal_opacity_threshold"],
        final_removal_opacity_threshold=d["final_removal_opacity_threshold"],
        reset_opacities=d["reset_opacities"],
        reset_opacities_every=d["reset_opacities_every"],
    )


def _mapping_budget(cfg_m: dict, time_idx: int) -> int:
    """Per-frame mapping iteration budget.

    Front-loaded bootstrap: the full-res drift penalty is early-map
    under-convergence — tracking drifts against the blurry young map
    while the dense frame-0 seed anneals, and 2x budget cuts frame-24
    drift 2.8x but destabilizes the LATE map if left on for the whole
    run (GAUNTLET.md round-5 mapping-budget A/B). bootstrap_num_iters
    applies for the first bootstrap_frames frames only, then the
    standard budget resumes."""
    num_iters = int(cfg_m["num_iters"])
    if time_idx < int(cfg_m.get("bootstrap_frames", 0)):
        num_iters = int(cfg_m.get("bootstrap_num_iters", num_iters))
    return num_iters


def _downscale_camera(cam: Camera, factor: int, pool: bool = False) -> Camera:
    """Camera for the factor-`factor` downsample of the image (coarse-to-fine
    tracking), through the renderer's half-pixel convention (ndc2Pix:
    u = fx X/Z + cx - 0.5).

    pool=False (stride): coarse pixel (i, j) IS full pixel (i*factor,
    j*factor), so cx_c = (cx - 0.5)/f + 0.5 and u_coarse == u_full / f
    exactly — but the strided target keeps full-res aliasing while the
    render at the coarse camera carries the EWA +0.3 coarse-px^2 dilation,
    a blur mismatch that biases the coarse pose optimum.

    pool=True (average pooling, _pool_target): coarse pixel (i, j) is the
    MEAN of the f x f full-pixel block starting at (i*f, j*f), centered at
    full pixel i*f + (f-1)/2, so cx_c = (cx - 0.5 - (f-1)/2)/f + 0.5 and
    the image is cropped to the largest f-divisible extent (floor-div
    dims). The box-filtered target carries blur in the same direction as
    the renderer's dilation, removing most of the stride bias."""
    if pool:
        half = (factor - 1) / 2.0
        return cam._replace(
            height=cam.height // factor,
            width=cam.width // factor,
            fx=cam.fx / factor,
            fy=cam.fy / factor,
            cx=(cam.cx - 0.5 - half) / factor + 0.5,
            cy=(cam.cy - 0.5 - half) / factor + 0.5,
        )
    return cam._replace(
        height=-(-cam.height // factor),
        width=-(-cam.width // factor),
        fx=cam.fx / factor,
        fy=cam.fy / factor,
        cx=(cam.cx - 0.5) / factor + 0.5,
        cy=(cam.cy - 0.5) / factor + 0.5,
    )


def _pool_target(color, depth, factor: int):
    """Mask-aware factor x factor average pooling of a tracking target.

    Color: plain block mean (matches alpha-blended render semantics under
    the coarse camera's wider low-pass). Depth: mean over VALID (> 0)
    pixels only — depth 0 marks holes, and blending holes into a block
    mean would fabricate phantom geometry; a block with no valid pixel
    stays 0 (masked out of the tracking loss, core/losses.py)."""
    h, w = depth.shape
    hc, wc = h // factor, w // factor
    c = color[:, : hc * factor, : wc * factor]
    c = c.reshape(3, hc, factor, wc, factor).mean(axis=(2, 4))
    d = depth[: hc * factor, : wc * factor].reshape(hc, factor, wc, factor)
    valid = (d > 0).astype(d.dtype)
    cnt = valid.sum(axis=(1, 3))
    dsum = (d * valid).sum(axis=(1, 3))
    d = jnp.where(cnt > 0, dsum / jnp.maximum(cnt, 1.0), 0.0)
    return c, d


# render.binning packs per-gaussian pair offsets into the low 23 bits of an
# int32 (offset | rect_w << 23), so every pair_cap anywhere in the pipeline
# must stay strictly below 2^23. Kept 2^17-aligned (the pair granularity).
PAIR_CAP_HARD_LIMIT = (1 << 23) - (1 << 17)

# Measured-count pair budget headroom: the pair buffers are sized to the
# largest OBSERVED pair count times this, instead of bucket * margin (the
# round-3 scheme whose measured overshoot was ~1.8x — pair-row-bound stages
# are ~60% of a mapping iteration, so the padding was pure waste). 1.15:
# the observed max is itself slow-decaying, and an underestimate is
# RECOVERABLE (overflow -> _bump_pair_margin -> phase retried once), so
# thin headroom costs an occasional retry instead of 10-20% padding on
# every iteration. (1.25 measured on the full-res bench: actual pairs
# 1.68M -> target 2.10M, 0.4% above the 2^21 rung -> quantized to 3.1M,
# an 87% overshoot.)
PAIR_HEADROOM = 1.15


def _next_pair_rung(target: float, floor: int) -> int:
    """Smallest ladder value >= target on the {1, 1.25, 1.5, 1.75}*2^k
    ladder starting at `floor` (a power of two >= 2^13). Four rungs per
    octave: pair growth is sublinear in map growth (the frustum bounds the
    visible pair population), so a run crosses only a handful of rungs,
    while each rung's worst-case padding drops to 25% — the shape-storm
    failure mode documented at _phase_rcfg is a budget keyed to a
    CONTINUOUS quantity, which this ladder is not. Every rung is a
    multiple of 2^12 above the 2^14 floor (Pallas segment scan needs
    pair_cap % 128 == 0)."""
    v = int(floor)
    while v < target:
        b = _octave_base(v)
        v += (b >> 2) if b >= (1 << 14) else b
    return v


def _pair_rung_down(v: int) -> int:
    """One ladder rung below v (inverse of _next_pair_rung's step)."""
    b = _octave_base(v)
    if v == b:  # power of two: previous rung is 1.75 * 2^(k-1)
        return b - (b >> 3) if b >= (1 << 15) else b >> 1
    return v - (b >> 2)


def _octave_base(v: int) -> int:
    """Largest power of two <= v."""
    b = 1
    while (b << 1) <= v:
        b <<= 1
    return b


def _next_pow2_int(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _w2c_from_qt(q: np.ndarray, t: np.ndarray) -> np.ndarray:
    # Pure numpy (same wxyz convention as core.transforms.build_rotation):
    # keyframe selection calls this once per keyframe per frame, and a jax
    # round-trip here cost ~7 ms of dispatch each (~0.18 s/frame).
    w2c = np.eye(4, dtype=np.float32)
    w, x, y, z = (q / np.linalg.norm(q)).astype(np.float64)
    w2c[:3, :3] = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    w2c[:3, 3] = t
    return w2c


def _quat_from_w2c(w2c: np.ndarray) -> np.ndarray:
    return np.asarray(matrix_to_quaternion(jnp.asarray(w2c[:3, :3], jnp.float32)))


def _frame_to_device(color_np, depth_np):
    color = jnp.asarray(color_np.transpose(2, 0, 1) / 255.0, jnp.float32)
    depth = jnp.asarray(depth_np[..., 0], jnp.float32)
    return color, depth


def _make_datasets(config):
    dataset_config = config["data"]
    if "gradslam_data_cfg" not in dataset_config:
        gradslam_data_cfg = {"dataset_name": dataset_config["dataset_name"]}
    else:
        gradslam_data_cfg = load_dataset_config(dataset_config["gradslam_data_cfg"])
    if "synthetic" in gradslam_data_cfg.get("dataset_name", "").lower():
        gradslam_data_cfg.setdefault("num_frames", dataset_config.get("num_frames", 30))
        for knob in ("motion_scale", "depth_noise_sigma", "synthetic_seed",
                     "trajectory"):
            if knob in dataset_config:
                gradslam_data_cfg.setdefault(knob, dataset_config[knob])

    def make(h, w):
        return get_dataset(
            config_dict=gradslam_data_cfg,
            basedir=dataset_config.get("basedir", ""),
            sequence=os.path.basename(str(dataset_config.get("sequence", ""))),
            start=dataset_config.get("start", 0),
            end=dataset_config.get("end", -1),
            stride=dataset_config.get("stride", 1),
            desired_height=h,
            desired_width=w,
            relative_pose=True,
            ignore_bad=dataset_config["ignore_bad"],
            use_train_split=dataset_config["use_train_split"],
        )

    dataset = make(
        dataset_config["desired_image_height"], dataset_config["desired_image_width"]
    )
    densify_dataset = None
    if (
        dataset_config["densification_image_height"] != dataset_config["desired_image_height"]
        or dataset_config["densification_image_width"] != dataset_config["desired_image_width"]
    ):
        densify_dataset = make(
            dataset_config["densification_image_height"],
            dataset_config["densification_image_width"],
        )
    tracking_dataset = None
    if (
        dataset_config["tracking_image_height"] != dataset_config["desired_image_height"]
        or dataset_config["tracking_image_width"] != dataset_config["desired_image_width"]
    ):
        tracking_dataset = make(
            dataset_config["tracking_image_height"],
            dataset_config["tracking_image_width"],
        )
    return dataset, densify_dataset, tracking_dataset


class SLAMRuntime:
    """Mutable host state for one SLAM run (useful for the live demo too)."""

    def __init__(self, config: dict):
        from splatam_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        self.config = config = backfill_defaults(config)
        self.output_dir = os.path.join(config["workdir"], config["run_name"])
        self.eval_dir = os.path.join(self.output_dir, "eval")
        os.makedirs(self.eval_dir, exist_ok=True)

        self.dataset, self.densify_dataset, self.tracking_dataset = _make_datasets(config)
        num_frames = config["data"].get("num_frames", -1)
        if num_frames == -1:
            num_frames = len(self.dataset)
        self.num_frames = num_frames

        tpu = config["tpu"]
        self.rcfg = RenderConfig(
            backend=tpu["backend"], pair_cap=tpu["pair_cap"], tile_k_max=tpu["tile_k_max"]
        )
        # Optional row-sharded rendering over a device mesh (tpu.spatial_shards
        # devices; parallel/spatial.py). 0/1 = single-chip.
        shards = int(tpu.get("spatial_shards", 0))
        self.mesh = None
        if shards > 1:
            from splatam_tpu.parallel.spatial import make_mesh

            self.mesh = make_mesh(shards)
            print(f"[splatam-tpu] row-sharding renders over {shards} devices")
        # Pair-structure reuse (render.api.PairStructure): tracking rebins
        # every K iterations; mapping computes one structure per distinct
        # keyframe per phase chunk. 1 = exact per-iteration binning.
        self.rebin_every = int(tpu.get("rebin_every", 1))
        self.pair_margin = 2.0  # pairs per live gaussian; grows on overflow
        # Measured-count pair budget (see _phase_rcfg): per-tile-grid
        # decaying max of OBSERVED pair counts (phases return their max
        # n_pairs), the ladder rung currently granted per grid (shrink
        # hysteresis), and a decaying-max per-frame pair growth estimate
        # for the async precompiler's crossing prediction. Disable with
        # tpu.measured_pair_budget=False (margin-based sizing, the round-3
        # behavior) — kept as a flag because the margin path is also the
        # fallback under a mesh and for never-observed grids.
        self.measured_pair_budget = bool(tpu.get("measured_pair_budget", True))
        self._pairs_seen: dict[int, float] = {}
        self._pair_rung_used: dict[int, int] = {}
        self._pairs_growth = 0.0
        self._pairs_last = 0.0
        # Per-tile-grid tile_k_max growth (tiles backend): {num_tiles: k}.
        # Keyed by grid size because a value big enough for a 6-tile coarse
        # level would be a memory blowup at the full-res grid.
        self._tile_k_grown: dict[int, int] = {}
        # Live tracking-loss window state (_save_tracking_loss_viz).
        self._viz_fig = None
        self._viz_live_failed = False
        # Async precompile of upcoming bucket/pair-ladder shapes (see
        # _maybe_precompile). Keyed by (bucket, pair_cap).
        self._precompiled: set = set()
        self._inflight: dict = {}
        self._last_n_active = 0
        self._growth = 0
        self.pcfg_track = _phase_cfg(config["tracking"])
        self.pcfg_map = _phase_cfg(config["mapping"])
        self.prune_cfg = _prune_cfg(config["mapping"])
        self.isotropic = config["gaussian_distribution"] == "isotropic"

        # ---- First frame / cameras -------------------------------------
        color_np, depth_np, intrinsics_np, pose_np = self.dataset[0]
        self.intrinsics = intrinsics_np[:3, :3]
        self.first_frame_w2c = np.linalg.inv(pose_np)
        h, w = color_np.shape[0], color_np.shape[1]
        self.cam = setup_camera(w, h, self.intrinsics, None)

        if self.densify_dataset is not None:
            d_color, d_depth, d_intr, _ = self.densify_dataset[0]
            self.densify_intrinsics = d_intr[:3, :3]
            self.densify_cam = setup_camera(
                d_color.shape[1], d_color.shape[0], self.densify_intrinsics, None
            )
            init_color, init_depth = d_color, d_depth
        else:
            self.densify_intrinsics = self.intrinsics
            self.densify_cam = self.cam
            init_color, init_depth = color_np, depth_np

        if self.tracking_dataset is not None:
            t_color, _, t_intr, _ = self.tracking_dataset[0]
            self.tracking_cam = setup_camera(
                t_color.shape[1], t_color.shape[0], t_intr[:3, :3], None
            )
        else:
            self.tracking_cam = self.cam

        # ---- Gaussian map init -----------------------------------------
        capacity = int(tpu["capacity"])
        init_c, init_d = _frame_to_device(init_color, init_depth)
        pts, cols, mean_sq, valid = steps.first_frame_pointcloud(
            init_c, init_d, self.densify_cam
        )
        while capacity < pts.shape[0]:
            capacity *= 2
        self.gm = G.from_pointcloud(pts, cols, mean_sq, valid, capacity, self.isotropic)
        self.timestep = jnp.zeros((capacity,), jnp.float32)
        self.scene_radius = jnp.float32(
            float(init_depth.max()) / config["scene_radius_depth_ratio"]
        )

        # ---- Camera trajectory (host) ----------------------------------
        self.cam_rots = np.tile(
            np.array([1, 0, 0, 0], np.float32), (num_frames, 1)
        )
        self.cam_trans = np.zeros((num_frames, 3), np.float32)

        # ---- Keyframe store (device) -----------------------------------
        kf_cap = num_frames // max(config["keyframe_every"], 1) + 3
        self.kf_colors = jnp.zeros((kf_cap, h, w, 3), jnp.uint8)
        self.kf_depths = jnp.zeros((kf_cap, h, w), jnp.float32)
        self.kf_scratch_slot = kf_cap - 1
        self.keyframe_list = []  # dicts: id, slot, q, t
        self.keyframe_time_indices = []

        self.gt_w2c_all = []
        self._tracking_hist = None
        self._mapping_hist = None
        self.stats = {
            "tracking_iter_time_sum": 0.0,
            "tracking_iter_time_count": 0,
            "tracking_frame_time_sum": 0.0,
            "tracking_frame_time_count": 0,
            "mapping_iter_time_sum": 0.0,
            "mapping_iter_time_count": 0,
            "mapping_frame_time_sum": 0.0,
            "mapping_frame_time_count": 0,
        }
        self._precompile_initial_bucket()

    def _precompile_initial_bucket(self) -> None:
        """AOT-compile the first bucket's three phase programs in background
        threads right at init. Cold runs used to pay the tracking/mapping/
        densify compiles serially inside frames 0-1 (396 s of frame-0 dead
        time in BENCH_r02); compiling the three concurrently while frame 0's
        init/densify work proceeds cuts the cold start toward the longest
        single program, and the phase entry points join the in-flight
        compile via _join_inflight instead of re-paying it."""
        n_active = int(self.gm.num_active())
        bucket0 = self._bucket(n_active)
        if bucket0 <= (1 << 16):
            return  # small-bucket compiles are seconds (see _maybe_precompile)
        # Seed the measured-count pair budget BEFORE the first phase
        # compiles: the cheap projection-only probe (steps.count_pairs)
        # observes the frame-0 map's actual pair population per camera
        # grid, so the initial background compiles land on the measured
        # rung directly instead of compiling margin-sized programs that a
        # frame-1 re-budget would immediately invalidate.
        if self.measured_pair_budget and self.mesh is None:
            gm_view, _ = G.slice_prefix(self.gm, self.timestep, bucket0)
            q0 = jnp.asarray(self.cam_rots[0])
            t0 = jnp.asarray(self.cam_trans[0])
            seen_grids = set()
            for cam in (self.cam, self.tracking_cam, self.densify_cam):
                g = self._grid_key(cam)
                if g in seen_grids:
                    continue
                seen_grids.add(g)
                self.observe_pairs(cam, steps.count_pairs(gm_view, q0, t0, cam))
        import threading

        targets = [(bucket0, self._phase_rcfg(bucket0, n_active))]
        if n_active > (bucket0 * 7) // 10:
            # The map seeds near the top of its first bucket (a dense
            # frame-0 backprojection fills ~90% of a rung at full res), so
            # the first bucket crossing lands within the first few frames —
            # before _maybe_precompile has two frames of growth history.
            # Compile the next rung's programs at init too; pair counts
            # plateau with the frustum, so the seeded rung is the right
            # pair hint.
            bucket1 = self._bucket(bucket0 + 1)
            if bucket1 > bucket0:
                hint = self._pairs_seen.get(self._grid_key(self.cam)) or None
                targets.append(
                    (bucket1, self._phase_rcfg(bucket1, pairs_hint=hint))
                )
        for bucket, rcfg in targets:
            self._spawn_precompile(bucket, rcfg)

    # -------------------------------------------------------------------
    def _bucket(self, n_active: int) -> int:
        # 4x granularity while the map is small (fewer distinct shapes ->
        # fewer phase recompiles), 1.5x above 256k: every bucket-
        # proportional stage (projection, binning spreads, transforms,
        # Adam) pays the bucket's padding, and at pow-2 rungs a map just
        # past a boundary runs at ~50% occupancy (the bench's 300k-gaussian
        # steady state sat at 57% of 524288). The extra compiles per rung
        # are absorbed by the async precompiler.
        b = 4096
        while b < n_active and b < (1 << 18):
            b *= 4
        while b < n_active:
            b = ((b * 3 // 2) + 4095) & ~4095  # 1.5x, 4096-aligned
        return min(b, self.gm.capacity)

    def _tile_k_for(self, cam: Camera, pair_cap: int) -> int:
        """tile_k_max for a phase rendering through `cam` (XLA tiles backend
        per-tile list capacity; the pallas backend ignores it).

        Small tile grids — coarse-to-fine tracking levels — concentrate the
        same pair population onto few tiles, so per-tile lists must grow as
        the grid shrinks: scale the configured cap by the tile-count ratio
        vs the full mapping grid (total list capacity ~invariant). On list
        overflow _grow_tile_k doubles the grid's entry; a tile's true length
        is bounded by n_pairs <= pair_cap, so growth converges."""
        from splatam_tpu.render import binning

        gx, gy = binning.grid_shape(cam.width, cam.height)
        t = gx * gy
        fgx, fgy = binning.grid_shape(self.cam.width, self.cam.height)
        scale = max(1, (fgx * fgy) // t)
        k = max(int(self.rcfg.tile_k_max) * scale, self._tile_k_grown.get(t, 0))
        return min(k, pair_cap)

    def _grow_tile_k(self, cam: Camera, rcfg: RenderConfig, phase: str) -> bool:
        """Double `cam`'s grid's tile_k_max after the tiles backend reported
        per-tile list truncation (render.api.split_overflow list flag) —
        growing pair_cap can never clear that, see api.LIST_OVERFLOW_FLAG.
        Returns False once tile_k_max == pair_cap (truncation impossible,
        flag would indicate a bug)."""
        from splatam_tpu.render import binning

        gx, gy = binning.grid_shape(cam.width, cam.height)
        t = gx * gy
        cur = int(rcfg.tile_k_max)
        if cur >= rcfg.pair_cap:
            print(
                f"[splatam-tpu] WARNING: {phase} tile-list overflow with"
                f" tile_k_max == pair_cap ({cur}) — cannot grow further"
            )
            return False
        new = min(2 * cur, rcfg.pair_cap)
        self._tile_k_grown[t] = max(self._tile_k_grown.get(t, 0), new)
        print(
            f"[splatam-tpu] {phase} tile-list overflow at the {t}-tile grid"
            f" — growing tile_k_max {cur} -> {new} and retrying"
        )
        return True

    def _grid_key(self, cam: Camera) -> int:
        from splatam_tpu.render import binning

        gx, gy = binning.grid_shape(cam.width, cam.height)
        return gx * gy

    def observe_pairs(self, cam: Camera, n_pairs) -> None:
        """Record a phase's max actual (gaussian, tile) pair count for the
        measured-count pair budget. Called by the phase drivers with the
        n_pairs max each jitted program returns."""
        n = int(n_pairs)
        if n <= 0:
            return
        key = self._grid_key(cam)
        self._pairs_seen[key] = max(float(n), self._pairs_seen.get(key, 0.0))

    def _decay_pairs_seen(self) -> None:
        """Once per frame: let the observed-pairs max decay slowly so the
        budget can follow a shrinking map (pruning); the ladder's 2-rung
        shrink hysteresis in _phase_rcfg keeps this from flapping shapes."""
        for k in self._pairs_seen:
            self._pairs_seen[k] *= 0.97

    def _phase_rcfg(self, bucket: int, n_active: int | None = None,
                    cam: Camera | None = None,
                    pairs_hint: float | None = None) -> RenderConfig:
        # Pair buffers scale with the BUCKET (not the live count): pair_cap
        # is a pure function of the bucket rung, so the bucket ladder is
        # the ONLY compile-shape ladder. A live-count-proportional pair cap
        # (the round-2 design, 128k granularity) crossed a pair rung nearly
        # every frame at 1200x680 (~130k new pairs/frame), and each
        # crossing recompiled all three phase programs — worse, background
        # compiles run on the same XLA service that executes the phases, so
        # storms also slowed steady-state execution ~4x (full-res bench:
        # ~800 ms/map-iter observed vs 190 ms warm+idle). The cost is pair
        # padding tracking the bucket's up-to-1.5x slack (pair-proportional
        # stages are ~60% of a mapping iter; measured ~+10-20%), which the
        # storm's elimination repays many times over. pair_margin starts at
        # 2.0 pairs/gaussian (measured ~1.7-1.9) and grows on overflow
        # (the phase is then retried — see _bump_pair_margin).
        if n_active is None:
            n_active = bucket
        # Under a mesh, pair_cap is the PER-SHARD budget: each shard bins
        # only its own row block (compute_pair_structure_sharded), so the
        # global pair population splits ~evenly across shards. The 1.3
        # headroom covers row-boundary duplicates (a splat overlapping a
        # block boundary is binned by both owners) and shard imbalance;
        # underestimates are caught by the pmax'd overflow + retry.
        n_sh = self.mesh.devices.size if self.mesh is not None else 1
        gran = 1 << 17 if n_sh == 1 else 1 << 14
        # Direct J-slot expansion needs J pairs per BUCKET slot plus a tail
        # buffer; under a mesh each shard bins only its row block, where
        # full-N direct slots would not shrink with shard count — classic
        # spread stays the sharded expansion.
        direct_j = int(self.config["tpu"].get("direct_j", 0)) if n_sh == 1 else 0
        margin = max(self.pair_margin, direct_j + 0.25)
        budget = int(bucket * margin)
        if n_sh > 1:
            budget = int(budget * 1.3) // n_sh
        budget = ((budget + gran - 1) // gran) * gran
        floor = max((1 << 16) // n_sh, 1 << 13)
        ceil_cap = int(self.config["tpu"]["pair_cap"])
        if n_sh > 1:
            ceil_cap = max(int(ceil_cap * 1.3) // n_sh, floor)
        # Measured-count pair budget (round 4): once a phase has OBSERVED
        # this grid's actual pair count, size the buffers to seen *
        # PAIR_HEADROOM quantized UP onto the {2^k, 1.5*2^k} ladder, instead
        # of bucket * margin (measured ~1.8x overshoot: ~1.65x bucket/
        # n_active slack times ~1.08x margin/actual-ppg slack). The ladder —
        # NOT raw n_pairs — is what keeps this off the documented
        # shape-storm failure mode (see the comment above): at a known
        # growth rate there is at most ~one extra compile-shape crossing
        # per bucket rung, which _maybe_precompile predicts. Shrinks apply
        # only >= 2 rungs below the granted rung (hysteresis against
        # decay/pruning flapping). Margin-based sizing remains the ceiling,
        # the fallback for never-observed grids, and the only path under a
        # mesh (per-shard observed maxima are not plumbed).
        measured = 0.0
        grid = self._grid_key(cam if cam is not None else self.cam)
        if self.measured_pair_budget and n_sh == 1 and direct_j == 0:
            measured = (pairs_hint if pairs_hint is not None
                        else self._pairs_seen.get(grid, 0.0))
        if measured > 0.0:
            rung = _next_pair_rung(measured * PAIR_HEADROOM, floor)
            prev = self._pair_rung_used.get(grid, 0)
            if prev and rung < prev:
                if rung > _pair_rung_down(_pair_rung_down(prev)):
                    rung = prev
            if pairs_hint is None:
                if self._pair_rung_used.get(grid) != rung:
                    print(
                        f"[splatam-tpu] pair budget grid={grid}: seen="
                        f"{int(measured)} -> rung {rung} (margin cap {budget})",
                        file=sys.stderr,
                    )
                self._pair_rung_used[grid] = rung
            budget = min(rung, budget)
        # The binning packs pair offsets into 23 bits (offset|rect_w), so
        # pair_cap must stay strictly below 2^23 no matter how the margin
        # or the ceiling grew.
        pair_cap = max(floor, min(budget, ceil_cap, PAIR_CAP_HARD_LIMIT))
        return RenderConfig(
            backend=self.rcfg.backend,
            pair_cap=pair_cap,
            tile_k_max=self._tile_k_for(cam if cam is not None else self.cam,
                                        pair_cap),
            direct_j=direct_j,
            tile_cull=bool(self.config["tpu"].get("tile_cull", False)),
        )

    def _bump_pair_margin(self, n_active: int, ovf: int, cur_cap: int,
                          phase: str, cam: Camera | None = None) -> bool:
        """Grow the pairs-per-gaussian margin after an overflow so the
        retried phase (and all later frames) get big enough buffers.

        The tpu.pair_cap ceiling itself grows (up to tpu.pair_cap_max)
        rather than refusing: a truncated pair list renders holes, the
        densifier reads the holes as unmapped area, and the map explodes —
        a silent-drop ceiling turns one overflow into a death spiral.
        Returns False only at the hard memory bound.

        Under a mesh, ovf/cur_cap are PER-SHARD (the phase pmax'es shard
        overflows); translate to the global pair population before updating
        the (global) margin and ceiling, inverting _phase_rcfg's
        budget*1.3/n_sh per-shard split."""
        n_sh = self.mesh.devices.size if self.mesh is not None else 1
        needed = cur_cap + ovf
        if n_sh > 1:
            needed = int(needed * n_sh / 1.3) + 1
            cur_cap = int(cur_cap * n_sh / 1.3)
        tpu = self.config["tpu"]
        ceiling = int(tpu["pair_cap"])
        hard_max = min(int(tpu.get("pair_cap_max", 1 << 23)), PAIR_CAP_HARD_LIMIT)
        if cur_cap >= hard_max:
            print(
                f"[splatam-tpu] WARNING: {phase} dropped {ovf} pairs at the"
                f" hard pair_cap_max ({hard_max}) — renders are truncated;"
                f" raise tpu.pair_cap_max if memory allows"
            )
            return False
        if needed > ceiling:
            tpu["pair_cap"] = min(_next_pow2_int(int(needed * 1.15)), hard_max)
            print(
                f"[splatam-tpu] raised tpu.pair_cap ceiling to {tpu['pair_cap']}"
            )
        self.pair_margin = max(
            self.pair_margin * 1.5, needed * 1.15 / max(n_active, 1)
        )
        # Teach the measured budget about the shortfall too: the retried
        # phase must come back with a rung whose target exceeds `needed`.
        key = self._grid_key(cam if cam is not None else self.cam)
        self._pairs_seen[key] = max(
            self._pairs_seen.get(key, 0.0), needed * 1.02 / PAIR_HEADROOM
        )
        print(
            f"[splatam-tpu] {phase} pair overflow ({ovf} dropped) — growing"
            f" pair margin to {self.pair_margin:.2f} pairs/gaussian and"
            f" retrying"
        )
        return True

    # -------------------------------------------------------------------
    def _maybe_precompile(self) -> None:
        """Overlap phase-program recompiles with frame compute.

        Every bucket-ladder or pair-ladder crossing recompiles both phase
        programs (~4-5 s spikes in the frame loop — the round-1 bench tail
        showed 6x-median frames at each crossing). Predict the shapes a few
        frames of map growth will need and AOT-compile them in a daemon
        thread: .lower().compile() runs on the host only (no device buffers,
        no TPU step) and populates the persistent XLA cache, so the later
        real call deserializes in ~1 s instead of paying the full compile.
        """
        if os.environ.get("SPLATAM_NO_PRECOMPILE"):
            return
        n_active = int(self.gm.num_active())
        first_call = self._last_n_active == 0
        growth = max(0, n_active - self._last_n_active)
        self._last_n_active = n_active
        # Pair-count trajectory (mapping grid) for the pair-ladder leg of
        # the prediction — decaying maxima like the gaussian growth.
        pairs_now = self._pairs_seen.get(self._grid_key(self.cam), 0.0)
        pgrowth = max(0.0, pairs_now - self._pairs_last)
        self._pairs_last = pairs_now
        if first_call:
            return  # bootstrap jump (0 -> initial map) is not growth
        self._growth = max(growth, int(self._growth * 0.7))  # decaying max
        self._pairs_growth = max(pgrowth, self._pairs_growth * 0.7)
        if self._growth == 0:
            return
        # Target the NEXT ladder crossings exactly (a far-point prediction
        # overshoots and compiles shapes that are never used). Two ladders
        # exist since the measured-count pair budget: the bucket rungs and,
        # within a bucket, the pair rungs ({2^k, 1.5*2^k}). A full
        # phase-set compile takes ~1-2 min of background wall time ≈ ~24
        # frames, so start once a crossing is within that horizon; the real
        # call joins an in-flight compile rather than duplicating it if
        # growth outruns the compile.
        bucket_now = self._bucket(n_active)
        rcfg_now = self._phase_rcfg(bucket_now, n_active)
        horizon = 24
        cands: list = []
        # (a) next bucket-ladder crossing (predict the pair count there).
        n_cross = bucket_now + 1
        if n_cross <= min(n_active + horizon * self._growth, self.gm.capacity):
            bucket_p = self._bucket(max(n_cross, n_active))
            frames_to = (n_cross - n_active) / max(self._growth, 1)
            hint = (pairs_now + frames_to * self._pairs_growth
                    if pairs_now > 0 else None)
            cands.append((bucket_p, max(n_cross, n_active), hint))
        # (b) next pair-rung crossing inside the CURRENT bucket.
        if pairs_now > 0 and self._pairs_growth > 0:
            trigger = rcfg_now.pair_cap / PAIR_HEADROOM
            if pairs_now + horizon * self._pairs_growth > trigger:
                cands.append((bucket_now, n_active, trigger * 1.02))
        for bucket_p, n_p, hint in cands:
            if bucket_p <= (1 << 16):
                # Small-bucket compiles are seconds, not minutes — not
                # worth the host CPU the background tracing/compiling
                # steals from the frame loop (tiny CPU runs slowed ~20x).
                continue
            rcfg_p = self._phase_rcfg(bucket_p, n_p, pairs_hint=hint)
            key = (bucket_p, rcfg_p.pair_cap)
            if key == (bucket_now, rcfg_now.pair_cap):
                continue
            ratio = (hint / pairs_now) if (hint and pairs_now > 0) else 1.0
            self._spawn_precompile(bucket_p, rcfg_p, pairs_ratio=ratio)

    def _spawn_precompile(self, bucket: int, rcfg: RenderConfig,
                          pairs_ratio: float = 1.0) -> None:
        """Background-compile the phase programs at (bucket, rcfg), ONE
        THREAD PER PROGRAM so a phase driver can join exactly the program
        it needs (_join_inflight's program filter). The round-3 design held
        one thread per key; densify_frame's join then blocked ~25 s on the
        next bucket's whole tracking+mapping compile it had no use for
        (BENCH_r04 frames 2-3)."""
        key = (bucket, rcfg.pair_cap)
        if key in self._precompiled:
            return
        self._precompiled.add(key)
        packed = self._build_precompile_args(bucket, rcfg, pairs_ratio)
        for fn, args, kwargs in packed:
            name = getattr(fn, "__name__", str(fn))
            ikey = (bucket, rcfg.pair_cap, name, id(args))
            th = threading.Thread(
                target=self._compile_one,
                args=(fn, args, kwargs, ikey, key, self._inflight,
                      self._precompiled),
                daemon=True,
            )
            self._inflight[ikey] = th
            with _LIVE_COMPILES_LOCK:
                _LIVE_COMPILES.add(th)
            th.start()

    def shutdown(self) -> None:
        """Drain this runtime's in-flight background compiles. Call before
        discarding a runtime (and before process exit) — a daemon thread
        still inside a PJRT compile when the interpreter finalizes aborts
        the whole process (BENCH_r04 rc=134). Idempotent."""
        for ikey, th in list(self._inflight.items()):
            if th.is_alive():
                th.join()
            self._inflight.pop(ikey, None)

    @staticmethod
    def _compile_one(fn, args, kwargs, ikey, key, inflight, precompiled):
        try:
            t0 = time.time()
            lowered = fn.lower(*args, **kwargs)
            t1 = time.time()
            lowered.compile()
            if os.environ.get("SPLATAM_COMPILE_STATS"):
                print(
                    f"[splatam-tpu] precompile {ikey[:3]}: trace "
                    f"{t1 - t0:.1f}s compile {time.time() - t1:.1f}s",
                    file=sys.stderr,
                )
        except Exception as e:  # background best-effort; the real call
            print(f"[splatam-tpu] async precompile {ikey[:3]} failed: {e!r}")
            # A failed precompile must not poison the key: discard it so a
            # later _maybe_precompile can retry instead of silently paying
            # the full foreground compile at the crossing.
            precompiled.discard(key)
        finally:
            inflight.pop(ikey, None)
            with _LIVE_COMPILES_LOCK:
                _LIVE_COMPILES.discard(threading.current_thread())

    def _join_inflight(self, pair_cap: int, bucket: int | None = None,
                       program: str | None = None) -> None:
        """If a background compile covering these shapes is still running,
        wait for it (it writes the persistent cache the jit call then
        hits) — finishing its remainder beats paying the whole compile
        again in the foreground. `program` narrows the wait to the one
        phase program the caller is about to run."""
        for ikey, th in list(self._inflight.items()):
            if ikey[1] != pair_cap or (bucket is not None and ikey[0] != bucket):
                continue
            if program is not None and ikey[2] != program:
                continue
            if th.is_alive():
                print(f"[splatam-tpu] waiting on in-flight precompile {ikey[:3]}")
                th.join()

    def _build_precompile_args(self, bucket: int, rcfg: RenderConfig,
                               pairs_ratio: float = 1.0):
        """ShapeDtypeStruct arg trees for both phase programs at (bucket,
        rcfg) — built on the main thread so the worker never reads self.

        pairs_ratio scales each camera grid's observed pair count to the
        predicted crossing point, so per-camera RenderConfigs (tracking /
        densify grids) are budgeted the same way the live calls will budget
        them when the crossing arrives."""
        sds = lambda shape, dtype: jax.ShapeDtypeStruct(shape, dtype)

        def _cam_rcfg(cam: Camera, bucket_for: int) -> RenderConfig:
            seen = self._pairs_seen.get(self._grid_key(cam), 0.0)
            hint = seen * pairs_ratio if seen > 0 else None
            return self._phase_rcfg(bucket_for, cam=cam, pairs_hint=hint)
        lead = lambda x: jax.ShapeDtypeStruct(
            (bucket,) + tuple(x.shape[1:]), x.dtype
        )
        gm_s = G.GaussianMap(*[lead(x) for x in self.gm])
        f32 = jnp.float32
        cfg_t = self.config["tracking"]
        tc = self.tracking_cam
        levels = self._c2f_levels()
        full_iters = int(cfg_t["num_iters"])
        if levels and not cfg_t.get("c2f_extra_iters", False):
            full_iters = max(full_iters - sum(n for _, n in levels), 1)
        lr_q = float(cfg_t["lrs"]["cam_unnorm_rots"])
        lr_t = float(cfg_t["lrs"]["cam_trans"])

        def _t_prog(cam, num_iters, final: bool):
            # Per-camera budget + tile_k (coarse c2f grids scale tile_k,
            # and the measured pair budget is per grid) so the precompiled
            # program key matches what track_frame builds.
            rcfg_cam = _cam_rcfg(cam, bucket)
            args = (
                gm_s,
                sds((4,), f32),
                sds((3,), f32),
                sds((3, cam.height, cam.width), f32),
                sds((cam.height, cam.width), f32),
                cam,
                num_iters,
                bool(cfg_t["use_depth_loss_thres"]) if final else False,
                float(cfg_t["depth_loss_thres"]) if final else 0.0,
                lr_q,
                lr_t,
                self.pcfg_track,
                rcfg_cam,
            )
            kwargs = dict(mesh=self.mesh, rebin_every=self.rebin_every)
            if final:
                kwargs["lr_decay_frac"] = float(cfg_t.get("lr_decay_frac", 1.0))
            return args, kwargs

        t_progs = [
            _t_prog(_downscale_camera(tc, f, pool=self._c2f_pool()), n, False)
            for f, n in levels
        ] + [_t_prog(tc, full_iters, True)]

        cfg_m = self.config["mapping"]
        num_iters = int(cfg_m["num_iters"])
        use_densify = cfg_m.get("use_gaussian_splatting_densification", False)
        if use_densify:
            num_iters = min(num_iters, int(cfg_m["densify_dict"]["densify_every"]))
        lrs_d = cfg_m["lrs"]
        lrs = (
            float(lrs_d["means3D"]), float(lrs_d["rgb_colors"]),
            float(lrs_d["unnorm_rotations"]), float(lrs_d["logit_opacities"]),
            float(lrs_d["log_scales"]),
        )
        params_s = (gm_s.means3d, gm_s.rgb_colors, gm_s.unnorm_rotations,
                    gm_s.logit_opacities, gm_s.log_scales)
        opt_s = optim.AdamState(m=params_s, v=params_s, step=sds((), jnp.int32))
        gsv = sds((bucket,), f32)
        reuse = self.rebin_every > 1
        s_max = max(int(self.config["mapping_window_size"]), 1)
        m_args = (
            gm_s,
            sds(self.kf_colors.shape, self.kf_colors.dtype),
            sds(self.kf_depths.shape, self.kf_depths.dtype),
            sds((num_iters,), jnp.int32),
            sds((num_iters, 4), f32),
            sds((num_iters, 3), f32),
            sds((), f32),
            self.cam,
            num_iters,
            self.pcfg_map,
            rcfg,
            self.prune_cfg,
            lrs,
            opt_s,
            (gsv, gsv, gsv),
            sds((), jnp.int32),
            bool(use_densify),
        )
        m_kwargs = dict(
            mesh=self.mesh,
            reuse_structures=reuse,
            struct_qs=sds((s_max, 4), f32) if reuse else None,
            struct_ts=sds((s_max, 3), f32) if reuse else None,
            iter_struct_idx=sds((num_iters,), jnp.int32) if reuse else None,
            n_structs=sds((), jnp.int32) if reuse else None,
        )

        # densify_step runs on the FULL capacity buffers, so it recompiles
        # on pair-ladder steps too (measured 34 s inline at frame 7 of the
        # bench without this). Its RenderConfig is budgeted at bucket =
        # capacity with the densify grid's own measured pairs — exactly how
        # densify_frame builds it (the round-3 code passed the MAPPING
        # bucket's rcfg here, which never matched once the two budgets
        # diverged at full resolution, so every crossing recompiled densify
        # inline anyway).
        cap = self.gm.capacity
        gm_full_s = G.GaussianMap(*[
            jax.ShapeDtypeStruct((cap,) + tuple(x.shape[1:]), x.dtype)
            for x in self.gm
        ])
        dc = self.densify_cam
        d_args = (
            gm_full_s,
            sds((cap,), f32),
            sds((3, dc.height, dc.width), f32),
            sds((dc.height, dc.width), f32),
            sds((4,), f32),
            sds((3,), f32),
            sds((), jnp.int32),
            dc,
            float(self.config["mapping"]["sil_thres"]),
            _cam_rcfg(dc, cap),
        )
        d_kwargs = dict(mesh=self.mesh)
        progs = [(steps.tracking_phase, a, k) for a, k in t_progs]
        progs.append((steps.densify_step, d_args, d_kwargs))
        progs.append((steps.mapping_phase, m_args, m_kwargs))
        return progs

    def compact(self):
        """Re-pack active Gaussians into a dense prefix (once per frame).

        Skipped when the prefix is already dense (densification appends to
        the lowest free slots, so holes only exist after a mapping prune
        actually removed something): the full repack is a capacity-sized
        stable argsort + 14-column gather, ~0.2 s/frame at a 524k bucket.
        """
        self._decay_pairs_seen()
        if not hasattr(self, "_prefix_stats_fn"):

            @jax.jit
            def stats(active):
                n = jnp.sum(active)
                last = jnp.max(
                    jnp.where(active, jnp.arange(active.shape[0]), -1)
                )
                return n, last

            self._prefix_stats_fn = stats
        n, last = (int(x) for x in self._prefix_stats_fn(self.gm.active))
        holes = (last + 1) - n
        # Inactive slots inside the prefix are masked (correct either way);
        # they only cost compute once they push the active span into a
        # bigger bucket, so tolerate up to ~1.5% slack before repacking.
        # The span MUST stay inside the bucket sliced from the active
        # count, or actives past the slice would silently drop.
        if holes <= max(4096, n >> 6) and last + 1 <= self._bucket(n):
            return
        self.gm, self.timestep = G.compact(self.gm, self.timestep)

    # -------------------------------------------------------------------
    def _grow(self, new_capacity: int):
        self.gm = G.grow_capacity(self.gm, new_capacity)
        pad = new_capacity - self.timestep.shape[0]
        self.timestep = jnp.concatenate(
            [self.timestep, jnp.zeros((pad,), jnp.float32)]
        )
        print(f"[splatam-tpu] grew gaussian capacity to {new_capacity}")

    def _grow_kf_store(self, extra: int = 8):
        """Grow the device keyframe store (rare; recompiles mapping_phase).

        The initial kf_cap is an estimate (num_frames // keyframe_every + 3)
        that checkpoint-resume replays or the extra end-of-sequence keyframe
        can exceed; growing keeps every keyframe instead of silently
        dropping the overflow."""
        old_cap = self.kf_colors.shape[0]
        new_cap = old_cap + extra
        h, w = self.kf_colors.shape[1], self.kf_colors.shape[2]
        kc = jnp.zeros((new_cap, h, w, 3), jnp.uint8)
        kd = jnp.zeros((new_cap, h, w), jnp.float32)
        kc = kc.at[: old_cap - 1].set(self.kf_colors[: old_cap - 1])
        kd = kd.at[: old_cap - 1].set(self.kf_depths[: old_cap - 1])
        # The scratch (current-frame) slot stays the last one; carry its
        # contents over in case a mapping phase reads it before restaging.
        kc = kc.at[new_cap - 1].set(self.kf_colors[self.kf_scratch_slot])
        kd = kd.at[new_cap - 1].set(self.kf_depths[self.kf_scratch_slot])
        self.kf_colors, self.kf_depths = kc, kd
        self.kf_scratch_slot = new_cap - 1
        print(f"[splatam-tpu] grew keyframe store to {new_cap} slots")

    def _stage_keyframe(self, slot: int, color_np: np.ndarray, depth_np: np.ndarray):
        self.kf_colors = self.kf_colors.at[slot].set(
            jnp.asarray(np.clip(color_np, 0, 255).astype(np.uint8))
        )
        self.kf_depths = self.kf_depths.at[slot].set(
            jnp.asarray(depth_np[..., 0], jnp.float32)
        )

    # -------------------------------------------------------------------
    def load_checkpoint(self, checkpoint_time_idx: int) -> None:
        """Resume from params{t}.npz (parity: scripts/splatam.py:604-638):
        reload the map and trajectory, re-derive per-Gaussian aux arrays as
        zeros, replay gt poses, and rebuild the keyframe list/stores from
        the saved keyframe indices by re-reading those frames."""
        print(f"Loading Checkpoint for Frame {checkpoint_time_idx}")
        ckpt_path = os.path.join(self.output_dir, f"params{checkpoint_time_idx}.npz")
        ckpt = dict(np.load(ckpt_path, allow_pickle=True))
        self.gm = G.from_params_dict(ckpt, capacity=self.gm.capacity)
        self.timestep = jnp.zeros((self.gm.capacity,), jnp.float32)
        cam_rots = np.asarray(ckpt["cam_unnorm_rots"])[0].T.astype(np.float32)
        cam_trans = np.asarray(ckpt["cam_trans"])[0].T.astype(np.float32)
        n = min(len(cam_rots), len(self.cam_rots))
        self.cam_rots[:n] = cam_rots[:n]
        self.cam_trans[:n] = cam_trans[:n]

        kf_indices = np.load(
            os.path.join(self.output_dir, f"keyframe_time_indices{checkpoint_time_idx}.npy")
        ).tolist()
        for time_idx in range(checkpoint_time_idx):
            color_np, depth_np, _, gt_pose = self.dataset[time_idx]
            self.gt_w2c_all.append(np.linalg.inv(gt_pose))
            if time_idx in kf_indices:
                slot = len(self.keyframe_list)
                while slot >= self.kf_scratch_slot:
                    self._grow_kf_store()
                self._stage_keyframe(slot, color_np, depth_np)
                self.keyframe_list.append(
                    {
                        "id": time_idx,
                        "slot": slot,
                        "q": self.cam_rots[time_idx].copy(),
                        "t": self.cam_trans[time_idx].copy(),
                    }
                )
                self.keyframe_time_indices.append(time_idx)

    # -------------------------------------------------------------------
    def _c2f_levels(self) -> list:
        """Coarse-to-fine tracking schedule: [(downscale_factor, iters), ...]
        coarse prefix levels, run before the full-resolution phase. TPU-native
        extension (config tracking.coarse_to_fine, default off = exact
        reference semantics): the coarse levels pull the pose into the
        full-res basin through wider, less aliased loss landscapes, cutting
        per-frame tracking noise (the dominant ATE term per GAUNTLET.md's
        shadow-tracking diagnostic) at a fraction of full-res iteration
        cost (a factor-f level renders ~f^2 fewer pixels)."""
        c2f = self.config["tracking"].get("coarse_to_fine") or {}
        if not c2f.get("enabled", False):
            return []
        return [(int(f), int(n)) for f, n in c2f.get("levels", []) if int(n) > 0]

    def _c2f_pool(self) -> bool:
        c2f = self.config["tracking"].get("coarse_to_fine") or {}
        return c2f.get("downsample", "pool") != "stride"

    def track_frame(self, time_idx: int, tr_color, tr_depth) -> None:
        cfg_t = self.config["tracking"]
        n_active = int(self.gm.num_active())
        bucket = self._bucket(n_active)
        gm_view, _ = G.slice_prefix(self.gm, self.timestep, bucket)
        q0 = jnp.asarray(self.cam_rots[time_idx])
        t0 = jnp.asarray(self.cam_trans[time_idx])
        lr_q = float(cfg_t["lrs"]["cam_unnorm_rots"])
        lr_t = float(cfg_t["lrs"]["cam_trans"])
        levels = self._c2f_levels()
        full_iters = int(cfg_t["num_iters"])
        if levels and not cfg_t.get("c2f_extra_iters", False):
            # Keep the total iteration budget: coarse iters come out of
            # num_iters (c2f_extra_iters=True runs them on top instead).
            full_iters = max(full_iters - sum(n for _, n in levels), 1)
        for _attempt in range(6):
            rcfg = self._phase_rcfg(bucket, n_active, cam=self.tracking_cam)
            self._join_inflight(rcfg.pair_cap, bucket, "tracking_phase")
            q_lv, t_lv = q0, t0
            coarse_hists: list = []
            coarse_iters = 0
            ovf_coarse = 0
            retry = False
            for factor, n_it in levels:
                pool = self._c2f_pool()
                cam_c = _downscale_camera(self.tracking_cam, factor, pool=pool)
                rcfg_c = self._phase_rcfg(bucket, n_active, cam=cam_c)
                if pool:
                    col_c, dep_c = _pool_target(tr_color, tr_depth, factor)
                else:
                    col_c = tr_color[:, ::factor, ::factor]
                    dep_c = tr_depth[::factor, ::factor]
                q_lv, t_lv, it_c, _loss_c, ovf_c, hist_c, np_c = steps.tracking_phase(
                    gm_view,
                    q_lv,
                    t_lv,
                    col_c,
                    dep_c,
                    cam_c,
                    n_it,
                    False,  # depth_loss_thres extension: full-res level only
                    0.0,
                    lr_q,
                    lr_t,
                    self.pcfg_track,
                    rcfg_c,
                    mesh=self.mesh,
                    rebin_every=self.rebin_every,
                )
                povf_c, lovf_c = split_overflow(ovf_c)
                if lovf_c and self._grow_tile_k(cam_c, rcfg_c, "tracking(c2f)"):
                    retry = True
                    break
                self.observe_pairs(cam_c, np_c)
                ovf_coarse = max(ovf_coarse, povf_c)
                coarse_iters += int(it_c)
                coarse_hists.append(np.asarray(hist_c)[: int(it_c)])
            if retry:
                continue
            best_q, best_t, iters, _loss, ovf, hist, np_t = steps.tracking_phase(
                gm_view,
                q_lv,
                t_lv,
                tr_color,
                tr_depth,
                self.tracking_cam,
                full_iters,
                bool(cfg_t["use_depth_loss_thres"]),
                float(cfg_t["depth_loss_thres"]),
                lr_q,
                lr_t,
                self.pcfg_track,
                rcfg,
                mesh=self.mesh,
                rebin_every=self.rebin_every,
                lr_decay_frac=float(cfg_t.get("lr_decay_frac", 1.0)),
            )
            povf, lovf = split_overflow(ovf)
            if lovf and self._grow_tile_k(self.tracking_cam, rcfg, "tracking"):
                continue
            self.observe_pairs(self.tracking_cam, np_t)
            ovf_total = max(ovf_coarse, povf)
            if ovf_total == 0 or not self._bump_pair_margin(
                n_active, ovf_total, rcfg.pair_cap, "tracking",
                cam=self.tracking_cam,
            ):
                break
        best_q.block_until_ready()
        self.cam_rots[time_idx] = np.asarray(best_q)
        self.cam_trans[time_idx] = np.asarray(best_t)
        self._iters_run = coarse_iters + int(iters)
        full_hist = np.asarray(hist)[: int(iters)]
        self._tracking_hist = (
            np.concatenate(coarse_hists + [full_hist])
            if coarse_hists
            else full_hist
        )

    def densify_frame(self, time_idx: int, d_color, d_depth) -> None:
        q = jnp.asarray(self.cam_rots[time_idx])
        t = jnp.asarray(self.cam_trans[time_idx])
        while True:
            n_active = int(self.gm.num_active())
            rcfg = self._phase_rcfg(self.gm.capacity, n_active,
                                    cam=self.densify_cam)
            self._join_inflight(rcfg.pair_cap, program="densify_step")
            gm2, ts2, n_added, n_dropped, ovf, np_d = steps.densify_step(
                self.gm,
                self.timestep,
                d_color,
                d_depth,
                q,
                t,
                jnp.int32(time_idx),
                self.densify_cam,
                float(self.config["mapping"]["sil_thres"]),
                rcfg,
                mesh=self.mesh,
            )
            povf, lovf = split_overflow(ovf)
            if lovf and self._grow_tile_k(self.densify_cam, rcfg, "densify"):
                continue
            self.observe_pairs(self.densify_cam, np_d)
            if povf > 0 and self._bump_pair_margin(
                n_active, povf, rcfg.pair_cap, "densify", cam=self.densify_cam
            ):
                continue
            if int(n_dropped) > 0:
                need = self.gm.capacity + int(n_dropped)
                new_cap = self.gm.capacity
                while new_cap < need:
                    new_cap *= 2
                self._grow(new_cap)
                continue
            break
        self.gm, self.timestep = gm2, ts2

    def select_keyframes(self, time_idx: int, depth_np: np.ndarray) -> list:
        """Returns the reference's selected_keyframes list (kf indices, -1 =
        current frame). Parity: scripts/splatam.py:800-819."""
        curr_w2c = _w2c_from_qt(self.cam_rots[time_idx], self.cam_trans[time_idx])
        num_keyframes = self.config["mapping_window_size"] - 2
        kf_w2cs = [
            _w2c_from_qt(kf["q"], kf["t"]) for kf in self.keyframe_list[:-1]
        ]
        selected = keyframe_selection_overlap(
            depth_np[..., 0], curr_w2c, self.intrinsics, kf_w2cs, num_keyframes,
            rng=np.random,
        )
        selected_time_idx = [self.keyframe_list[i]["id"] for i in selected]
        if len(self.keyframe_list) > 0:
            selected_time_idx.append(self.keyframe_list[-1]["id"])
            selected.append(len(self.keyframe_list) - 1)
        selected_time_idx.append(time_idx)
        selected.append(-1)
        print(f"\nSelected Keyframes at Frame {time_idx}: {selected_time_idx}")
        return selected

    def _mapping_inputs(self, time_idx: int, selected: list, num_iters: int):
        # Reference parity: uniform random keyframe per iteration
        # (scripts/splatam.py:831-842). Opt-in recency weighting
        # (mapping.current_frame_prob > 0): with that probability pick the
        # CURRENT frame instead — the round-5 drift analysis shows error
        # accrues while newly densified regions are young and blurry, and
        # the current view is where the young gaussians live. 0 (default)
        # reproduces the reference exactly.
        cur_prob = float(self.config["mapping"].get("current_frame_prob", 0.0))
        slots, qs, ts, frame_ids = [], [], [], []
        for _ in range(num_iters):
            if cur_prob > 0.0 and np.random.random() < cur_prob:
                sel = -1
            else:
                sel = selected[np.random.randint(0, len(selected))]
            if sel == -1:
                frame_id = time_idx
                slots.append(self.kf_scratch_slot)
            else:
                frame_id = self.keyframe_list[sel]["id"]
                slots.append(self.keyframe_list[sel]["slot"])
            frame_ids.append(frame_id)
            qs.append(self.cam_rots[frame_id])
            ts.append(self.cam_trans[frame_id])
        inputs = (
            jnp.asarray(np.array(slots, np.int32)),
            jnp.asarray(np.stack(qs)),
            jnp.asarray(np.stack(ts)),
        )
        if self.rebin_every <= 1:
            return inputs + (None, None, None, None)
        # Distinct-keyframe structure table for mapping_phase's
        # reuse_structures path, padded to the (static) window size so the
        # phase program compiles once.
        uniq: dict = {}
        iter_idx = [uniq.setdefault(f, len(uniq)) for f in frame_ids]
        s_max = max(int(self.config["mapping_window_size"]), len(uniq))
        rows = list(uniq)
        rows += [rows[0]] * (s_max - len(rows))
        struct_qs = jnp.asarray(np.stack([self.cam_rots[f] for f in rows]))
        struct_ts = jnp.asarray(np.stack([self.cam_trans[f] for f in rows]))
        return inputs + (
            struct_qs,
            struct_ts,
            jnp.asarray(np.array(iter_idx, np.int32)),
            jnp.int32(len(uniq)),
        )

    def _run_mapping_chunk(self, gm_view, opt_state, gsvars, inputs, num_iters,
                           start_iter, rcfg, lrs, track_stats):
        slots, qs, ts, struct_qs, struct_ts, iter_struct_idx, n_structs = inputs
        return steps.mapping_phase(
            gm_view,
            self.kf_colors,
            self.kf_depths,
            slots,
            qs,
            ts,
            self.scene_radius,
            self.cam,
            num_iters,
            self.pcfg_map,
            rcfg,
            self.prune_cfg,
            lrs,
            opt_state,
            gsvars,
            jnp.int32(start_iter),
            track_stats,
            mesh=self.mesh,
            reuse_structures=self.rebin_every > 1,
            struct_qs=struct_qs,
            struct_ts=struct_ts,
            iter_struct_idx=iter_struct_idx,
            n_structs=n_structs,
        )

    def map_frame(self, time_idx: int, selected: list) -> None:
        try:
            self._map_frame_impl(time_idx, selected)
        finally:
            # Kick background compiles for the shapes the growing map will
            # need next, so ladder crossings don't stall the frame loop.
            self._maybe_precompile()

    def _map_frame_impl(self, time_idx: int, selected: list) -> None:
        cfg_m = self.config["mapping"]
        num_iters = _mapping_budget(cfg_m, time_idx)
        if num_iters == 0:
            return
        lrs_d = cfg_m["lrs"]
        lrs = (
            float(lrs_d["means3D"]),
            float(lrs_d["rgb_colors"]),
            float(lrs_d["unnorm_rotations"]),
            float(lrs_d["logit_opacities"]),
            float(lrs_d["log_scales"]),
        )
        use_densify = cfg_m.get("use_gaussian_splatting_densification", False)

        n_active = int(self.gm.num_active())
        bucket = self._bucket(n_active)
        gm_view, _ = G.slice_prefix(self.gm, self.timestep, bucket)
        rcfg = self._phase_rcfg(bucket, n_active)
        self._join_inflight(rcfg.pair_cap, bucket, "mapping_phase")
        params_of = lambda g: (
            g.means3d, g.rgb_colors, g.unnorm_rotations,
            g.logit_opacities, g.log_scales,
        )
        opt_state = optim.adam_init(params_of(gm_view))
        zeros = jnp.zeros((gm_view.capacity,), jnp.float32)
        gsvars = (zeros, zeros, zeros)

        if not use_densify:
            inputs = self._mapping_inputs(time_idx, selected, num_iters)
            for _attempt in range(4):
                gm2, _, _, _, ovf, hist, np_m = self._run_mapping_chunk(
                    gm_view, opt_state, gsvars, inputs, num_iters, 0, rcfg, lrs, False
                )
                povf, lovf = split_overflow(ovf)
                if lovf and self._grow_tile_k(self.cam, rcfg, "mapping"):
                    pass
                else:
                    self.observe_pairs(self.cam, np_m)
                    if povf == 0 or not self._bump_pair_margin(
                        n_active, povf, rcfg.pair_cap, "mapping"
                    ):
                        break
                rcfg = self._phase_rcfg(bucket, n_active)
            gm2.means3d.block_until_ready()
            self.gm = G.write_prefix(self.gm, gm2)
            self._mapping_hist = np.asarray(hist)
            return

        # 3DGS gradient densification inside the mapping loop (reference
        # scripts/splatam.py:862-867): run jitted chunks of densify_every
        # iterations, clone/split between chunks on the full buffers.
        from splatam_tpu.slam import steps_gs

        d = cfg_m["densify_dict"]
        dcfg = steps_gs.DensifyConfig(
            enabled=True,
            **{k: d[k] for k in d if k in steps_gs.DensifyConfig.__dataclass_fields__},
        )
        it = 0
        hist_chunks = []
        rng_key = jax.random.PRNGKey(self.config["seed"] * 9973 + time_idx)
        while it < num_iters:
            n = min(dcfg.densify_every, num_iters - it)
            inputs = self._mapping_inputs(time_idx, selected, n)
            for _attempt in range(4):
                gm2, opt2, gsv2, _, ovf, hist, np_m = self._run_mapping_chunk(
                    gm_view, opt_state, gsvars, inputs, n, it, rcfg, lrs, True
                )
                povf, lovf = split_overflow(ovf)
                if lovf and self._grow_tile_k(self.cam, rcfg, "mapping"):
                    pass
                else:
                    self.observe_pairs(self.cam, np_m)
                    if povf == 0 or not self._bump_pair_margin(
                        n_active, povf, rcfg.pair_cap, "mapping"
                    ):
                        break
                rcfg = self._phase_rcfg(bucket, n_active)
            gm_view, opt_state, gsvars = gm2, opt2, gsv2
            hist_chunks.append(np.asarray(hist))
            it += n
            if (
                it <= dcfg.stop_after
                and it >= dcfg.start_after
                and it % dcfg.densify_every == 0
            ):
                # Write the view back and densify at full capacity (clones
                # and splits go to the free slots just past the prefix).
                self.gm = G.write_prefix(self.gm, gm_view)
                full_opt = optim.adam_init(params_of(self.gm))
                full_opt = optim.AdamState(
                    m=jax.tree.map(
                        lambda f, v: f.at[: v.shape[0]].set(v), full_opt.m, opt_state.m
                    ),
                    v=jax.tree.map(
                        lambda f, v: f.at[: v.shape[0]].set(v), full_opt.v, opt_state.v
                    ),
                    step=opt_state.step,
                )
                cap = self.gm.capacity
                full_gsv = steps_gs.GSVariables(
                    means2d_grad_accum=jnp.zeros((cap,), jnp.float32).at[
                        : gsvars[0].shape[0]
                    ].set(gsvars[0]),
                    denom=jnp.zeros((cap,), jnp.float32).at[: gsvars[1].shape[0]].set(
                        gsvars[1]
                    ),
                    max_2d_radius=jnp.zeros((cap,), jnp.float32).at[
                        : gsvars[2].shape[0]
                    ].set(gsvars[2]),
                )
                rng_key, sub = jax.random.split(rng_key)
                gm_full, gsv_full, full_opt, d_ovf = steps_gs.densify_3dgs_step(
                    self.gm, full_gsv, full_opt, self.scene_radius, sub,
                    jnp.int32(it), dcfg, final=(it == dcfg.stop_after),
                )
                if int(d_ovf) > 0:
                    self._grow(self.gm.capacity * 2)
                    print("[splatam-tpu] WARNING: 3DGS densify overflow; grew capacity")
                    continue
                # Re-prefix (pruning during the chunk can punch holes that
                # splits only partially refill), carrying Adam moments and
                # stats through the same permutation.
                gm_full, self.timestep, (opt_m, opt_v, gsv_t) = G.compact_with(
                    gm_full, self.timestep,
                    (full_opt.m, full_opt.v, tuple(gsv_full)),
                )
                self.gm = gm_full
                n_active = int(self.gm.num_active())
                bucket = self._bucket(n_active)
                gm_view, _ = G.slice_prefix(self.gm, self.timestep, bucket)
                rcfg = self._phase_rcfg(bucket, n_active)
                opt_state = optim.AdamState(
                    m=jax.tree.map(lambda x: x[:bucket], opt_m),
                    v=jax.tree.map(lambda x: x[:bucket], opt_v),
                    step=full_opt.step,
                )
                gsvars = tuple(x[:bucket] for x in gsv_t)
        gm_view.means3d.block_until_ready()
        self.gm = G.write_prefix(self.gm, gm_view)
        self._mapping_hist = np.concatenate(hist_chunks) if hist_chunks else None

    # -------------------------------------------------------------------
    def export_params(self) -> dict:
        """Build the reference-schema params dict for saving/eval."""
        params = G.compact_to_numpy(self.gm)
        active = np.asarray(self.gm.active)
        params["timestep"] = np.asarray(self.timestep)[active]
        params["cam_unnorm_rots"] = self.cam_rots.T[None]  # [1,4,F]
        params["cam_trans"] = self.cam_trans.T[None]  # [1,3,F]
        params["intrinsics"] = np.asarray(self.intrinsics)
        params["w2c"] = np.asarray(self.first_frame_w2c)
        params["org_width"] = self.config["data"]["desired_image_width"]
        params["org_height"] = self.config["data"]["desired_image_height"]
        if self.gt_w2c_all:
            params["gt_w2c_all_frames"] = np.stack(self.gt_w2c_all)
        params["keyframe_time_indices"] = np.array(self.keyframe_time_indices)
        return params


def _save_tracking_loss_viz(rt, time_idx: int, color, depth) -> None:
    """visualize_tracking_loss (scripts/splatam.py:292-337): after the
    frame's tracking converges, render at the tracked pose and save the
    GT / render / diff panel. When a display is available the panel is ALSO
    shown in a live window updated every frame (the reference updates its
    window per tracking iteration; here iterations live inside one jitted
    while_loop, so per-frame is the closest honest granularity — the
    per-iteration loss history is replayed separately by
    report_iter_progress)."""
    import matplotlib

    live = bool(os.environ.get("DISPLAY")) and not rt._viz_live_failed
    if not live:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from splatam_tpu.eval.evaluate import render_at_pose

    out = render_at_pose(
        rt.gm, jnp.asarray(rt.cam_rots[time_idx]), jnp.asarray(rt.cam_trans[time_idx]),
        rt.tracking_cam, rt.rcfg,
    )
    sil_thres = rt.config["tracking"]["sil_thres"]
    mask = np.asarray(out.silhouette > sil_thres)
    im = np.clip(np.asarray(out.im).transpose(1, 2, 0), 0, 1)
    gt_im = np.asarray(color).transpose(1, 2, 0)
    rd, gd = np.asarray(out.depth), np.asarray(depth)
    if live and rt._viz_fig is not None:
        fig, axs = rt._viz_fig
        for ax in axs.flatten():
            ax.clear()
    else:
        fig, axs = plt.subplots(2, 4, figsize=(16, 7))
        if live:
            try:
                plt.ion()
                fig.show()
                rt._viz_fig = (fig, axs)
            except Exception:
                # No usable GUI backend after all — fall back for the run.
                rt._viz_live_failed, live = True, False
    panels = [
        (gt_im, "GT RGB", None),
        (gd, "GT Depth", "jet"),
        (im, "Rastered RGB", None),
        (rd, "Rastered Depth", "jet"),
        (np.abs(gt_im - im).mean(-1) * mask, "Diff RGB L1 (masked)", "jet"),
        (np.abs(gd - rd) * mask * (gd > 0), "Diff Depth L1 (masked)", "jet"),
        (mask.astype(np.float32), f"Silhouette > {sil_thres}", "gray"),
        ((gd > 0).astype(np.float32), "Valid Depth", "gray"),
    ]
    for ax, (img, title, cmap) in zip(axs.flatten(), panels):
        ax.imshow(img, cmap=cmap)
        ax.set_title(title)
        ax.axis("off")
    fig.suptitle(f"Tracking Loss Visualization — Frame {time_idx}", fontsize=14)
    viz_dir = os.path.join(rt.output_dir, "tracking_loss_viz")
    os.makedirs(viz_dir, exist_ok=True)
    fig.tight_layout()
    fig.savefig(os.path.join(viz_dir, f"{time_idx:04d}.png"), bbox_inches="tight")
    if live:
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
    else:
        plt.close(fig)


def rgbd_slam(config: dict) -> dict:
    """Run the full online SLAM; returns the final eval metric dict."""
    print("Loaded Config:")
    print(f"{config}")
    rt = SLAMRuntime(config)
    config = rt.config
    use_gt_poses = config["tracking"]["use_gt_poses"]
    forward_prop = config["tracking"]["forward_prop"]
    map_every = config["map_every"]
    keyframe_every = config["keyframe_every"]
    stats = rt.stats

    from splatam_tpu.utils.logging import MetricsLogger, report_loss

    logger = MetricsLogger(
        bool(config.get("use_wandb", False)), config, rt.output_dir
    )
    wandb_time_step, wandb_mapping_step = 0, 0
    viz_tracking_loss = bool(config["tracking"].get("visualize_tracking_loss", False))
    report_iter = bool(config.get("report_iter_progress", False))

    def _replay_iter_progress(hist, phase: str, frame: int) -> None:
        """report_iter_progress parity (utils/eval_helpers.py:246-254): the
        reference drives a tqdm postfix live inside the optimization loop;
        our phases run fused in one jit, so the recorded per-iteration loss
        history is replayed into a bar right after the phase."""
        if hist is None or len(hist) == 0:
            return
        from tqdm import tqdm as _tqdm

        bar = _tqdm(
            hist, desc=f"{phase} Time Step: {frame}", leave=False,
            total=len(hist),
        )
        for row in bar:
            bar.set_postfix(
                {"Loss": f"{float(row[0]):.6f}",
                 "Depth": f"{float(row[1]):.4f}", "Im": f"{float(row[2]):.4f}"}
            )
        bar.close()

    checkpoint_time_idx = 0
    if config["load_checkpoint"]:
        checkpoint_time_idx = int(config["checkpoint_time_idx"])
        rt.load_checkpoint(checkpoint_time_idx)

    from tqdm import tqdm

    pbar = tqdm(range(checkpoint_time_idx, rt.num_frames))
    for time_idx in pbar:
        color_np, depth_np, _, gt_pose = rt.dataset[time_idx]
        gt_w2c = np.linalg.inv(gt_pose)
        rt.gt_w2c_all.append(gt_w2c)
        color, depth = _frame_to_device(color_np, depth_np)
        rt.compact()

        if rt.tracking_dataset is not None:
            t_color_np, t_depth_np, _, _ = rt.tracking_dataset[time_idx]
            tr_color, tr_depth = _frame_to_device(t_color_np, t_depth_np)
        else:
            tr_color, tr_depth = color, depth

        # Constant-velocity pose init (scripts/splatam.py:423-442).
        if time_idx > 0:
            if time_idx > 1 and forward_prop:
                prev1 = rt.cam_rots[time_idx - 1]
                prev2 = rt.cam_rots[time_idx - 2]
                prev1 = prev1 / np.linalg.norm(prev1)
                prev2 = prev2 / np.linalg.norm(prev2)
                new_rot = prev1 + (prev1 - prev2)
                rt.cam_rots[time_idx] = new_rot / np.linalg.norm(new_rot)
                rt.cam_trans[time_idx] = rt.cam_trans[time_idx - 1] + (
                    rt.cam_trans[time_idx - 1] - rt.cam_trans[time_idx - 2]
                )
            else:
                rt.cam_rots[time_idx] = rt.cam_rots[time_idx - 1]
                rt.cam_trans[time_idx] = rt.cam_trans[time_idx - 1]

        # ---- Tracking --------------------------------------------------
        tracking_start = time.time()
        if time_idx > 0 and not use_gt_poses:
            rt.track_frame(time_idx, tr_color, tr_depth)
            stats["tracking_iter_time_count"] += rt._iters_run
            stats["tracking_frame_time_count"] += 1
            if logger.enabled and rt._tracking_hist is not None:
                # Replay the device-side per-iteration loss history
                # (report_loss, utils/eval_helpers.py:80-106).
                for row in rt._tracking_hist:
                    wandb_time_step = report_loss(
                        logger,
                        {"loss": row[0], "depth": row[1], "im": row[2]},
                        wandb_time_step, tracking=True,
                    )
            if report_iter:
                _replay_iter_progress(rt._tracking_hist, "Tracking", time_idx)
            if viz_tracking_loss:
                _save_tracking_loss_viz(rt, time_idx, tr_color, tr_depth)
        elif time_idx > 0 and use_gt_poses:
            rt.cam_rots[time_idx] = _quat_from_w2c(gt_w2c)
            rt.cam_trans[time_idx] = gt_w2c[:3, 3]
            stats["tracking_frame_time_count"] += 1
        tracking_time = time.time() - tracking_start
        stats["tracking_frame_time_sum"] += tracking_time
        if time_idx > 0 and not use_gt_poses:
            stats["tracking_iter_time_sum"] += tracking_time

        # Periodic global progress report (scripts/splatam.py:760-774);
        # failures dump an emergency checkpoint like the reference.
        if time_idx == 0 or (time_idx + 1) % config["report_global_progress_every"] == 0:
            try:
                from splatam_tpu.eval.evaluate import report_progress

                m = report_progress(
                    rt.gm, rt.cam_rots[time_idx], rt.cam_trans[time_idx],
                    tr_color, tr_depth, rt.tracking_cam,
                    config["tracking"]["sil_thres"], rt.rcfg, tracking=True,
                    gt_w2c_list=rt.gt_w2c_all,
                    est_w2c_list=[
                        _w2c_from_qt(rt.cam_rots[i], rt.cam_trans[i])
                        for i in range(time_idx + 1)
                    ],
                )
                print(
                    f"[progress] frame {time_idx}: psnr={m['psnr']:.2f} "
                    f"depth_l1={m['depth_l1']:.4f}"
                )
                # tqdm postfix parity: report_progress's live bar postfix
                # (utils/eval_helpers.py:246-254).
                postfix = {"Frame": time_idx, "PSNR": f"{m['psnr']:.2f}"}
                if "ate_rmse" in m and np.isfinite(m["ate_rmse"]):
                    postfix["ATE cm"] = f"{m['ate_rmse'] * 100:.2f}"
                pbar.set_postfix(postfix)
                logger.log(
                    {
                        "Tracking/PSNR": m["psnr"],
                        "Tracking/Depth RMSE": m["depth_rmse"],
                        "Tracking/Depth L1": m["depth_l1"],
                        "Tracking/ATE RMSE (cm)": m.get("ate_rmse", float("nan")) * 100,
                        "Tracking/step": time_idx,
                    }
                )
            except Exception:
                save_params_ckpt(rt.export_params(), rt.output_dir, time_idx)
                print("Failed to evaluate trajectory.")

        # ---- Densification + Mapping ----------------------------------
        if time_idx == 0 or (time_idx + 1) % map_every == 0:
            if config["mapping"]["add_new_gaussians"] and time_idx > 0:
                if rt.densify_dataset is not None:
                    d_color_np, d_depth_np, _, _ = rt.densify_dataset[time_idx]
                    d_color, d_depth = _frame_to_device(d_color_np, d_depth_np)
                else:
                    d_color, d_depth = color, depth
                rt.densify_frame(time_idx, d_color, d_depth)

            selected = rt.select_keyframes(time_idx, depth_np)
            rt._stage_keyframe(rt.kf_scratch_slot, color_np, depth_np)

            mapping_start = time.time()
            rt.map_frame(time_idx, selected)
            mapping_time = time.time() - mapping_start
            stats["mapping_frame_time_sum"] += mapping_time
            stats["mapping_frame_time_count"] += 1
            stats["mapping_iter_time_sum"] += mapping_time
            stats["mapping_iter_time_count"] += _mapping_budget(
                config["mapping"], time_idx)
            if report_iter:
                _replay_iter_progress(rt._mapping_hist, "Mapping", time_idx)
            if logger.enabled:
                if rt._mapping_hist is not None:
                    for row in rt._mapping_hist:
                        wandb_mapping_step = report_loss(
                            logger,
                            {"loss": row[0], "depth": row[1], "im": row[2]},
                            wandb_mapping_step, mapping=True,
                        )
                # Gaussian-count telemetry (scripts/splatam.py:796-798).
                logger.log(
                    {
                        "Mapping/Number of Gaussians": int(rt.gm.num_active()),
                        "Mapping/step": time_idx,
                    }
                )

        # ---- Keyframing (scripts/splatam.py:911-925) -------------------
        if (
            (time_idx == 0)
            or ((time_idx + 1) % keyframe_every == 0)
            or (time_idx == rt.num_frames - 2)
        ) and (not np.isinf(gt_w2c).any()) and (not np.isnan(gt_w2c).any()):
            slot = len(rt.keyframe_list)
            while slot >= rt.kf_scratch_slot:
                rt._grow_kf_store()
            rt._stage_keyframe(slot, color_np, depth_np)
            rt.keyframe_list.append(
                {
                    "id": time_idx,
                    "slot": slot,
                    "q": rt.cam_rots[time_idx].copy(),
                    "t": rt.cam_trans[time_idx].copy(),
                }
            )
            rt.keyframe_time_indices.append(time_idx)

        if (
            time_idx % config["checkpoint_interval"] == 0
            and config["save_checkpoints"]
        ):
            save_params_ckpt(rt.export_params(), rt.output_dir, time_idx)
            np.save(
                os.path.join(rt.output_dir, f"keyframe_time_indices{time_idx}.npy"),
                np.array(rt.keyframe_time_indices),
            )

    # ---- Runtime averages (scripts/splatam.py:939-953) -----------------
    s = stats
    tic = max(s["tracking_iter_time_count"], 1)
    tfc = max(s["tracking_frame_time_count"], 1)
    mic = max(s["mapping_iter_time_count"], 1)
    mfc = max(s["mapping_frame_time_count"], 1)
    print(f"\nAverage Tracking/Iteration Time: {s['tracking_iter_time_sum'] / tic * 1000} ms")
    print(f"Average Tracking/Frame Time: {s['tracking_frame_time_sum'] / tfc} s")
    print(f"Average Mapping/Iteration Time: {s['mapping_iter_time_sum'] / mic * 1000} ms")
    print(f"Average Mapping/Frame Time: {s['mapping_frame_time_sum'] / mfc} s")

    # ---- Final eval + params.npz --------------------------------------
    final_params = rt.export_params()
    # Use the run-adapted pair budget, not the init-time config: the pair
    # margin/ceiling may have grown with the map during the run. Size it
    # from the runtime's CAPACITY bucket, not n_final: the run's phases
    # budgeted pairs at bucket * margin, and an n_final-based margin cap
    # can land BELOW the grid's measured pair count — the run heals that
    # via overflow-retry, but a too-small eval cap truncated the densest
    # tiles into rendered holes (round-5 diagnostic: final-eval PSNR 14 on
    # a healthy map; eval_sequence now also self-heals via
    # evaluate._render_checked).
    n_final = int(rt.gm.num_active())
    metrics = eval_sequence(
        rt.dataset,
        final_params,
        rt.num_frames,
        rt.eval_dir,
        sil_thres=config["mapping"]["sil_thres"],
        mapping_iters=config["mapping"]["num_iters"],
        add_new_gaussians=config["mapping"]["add_new_gaussians"],
        eval_every=config["eval_every"],
        rcfg=rt._phase_rcfg(max(int(rt.gm.capacity), n_final), n_final),
    )
    save_params(final_params, rt.output_dir)
    metrics["runtime"] = {
        "tracking_iter_ms": s["tracking_iter_time_sum"] / tic * 1000,
        "tracking_frame_s": s["tracking_frame_time_sum"] / tfc,
        "mapping_iter_ms": s["mapping_iter_time_sum"] / mic * 1000,
        "mapping_frame_s": s["mapping_frame_time_sum"] / mfc,
    }
    # Final runtime + quality stats (scripts/splatam.py:954-971).
    logger.log(
        {
            "Final Stats/Average Tracking Iteration Time (ms)": metrics["runtime"]["tracking_iter_ms"],
            "Final Stats/Average Tracking Frame Time (s)": metrics["runtime"]["tracking_frame_s"],
            "Final Stats/Average Mapping Iteration Time (ms)": metrics["runtime"]["mapping_iter_ms"],
            "Final Stats/Average Mapping Frame Time (s)": metrics["runtime"]["mapping_frame_s"],
            "Final Stats/step": 1,
        }
    )
    logger.log({f"Final/{k}": v for k, v in metrics.items() if isinstance(v, float)})
    logger.finish()
    rt.shutdown()
    return metrics
