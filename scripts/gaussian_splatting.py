"""Offline 3D Gaussian Splatting with ground-truth poses.

Usage parity: python scripts/gaussian_splatting.py
configs/<dataset>/gaussian_splatting.py (reference
scripts/gaussian_splatting.py:318-613): per-frame silhouette densification
at init resolution, then a single final mapping phase of
config['train']['num_iters_mapping'] iterations over random frames at
mapping resolution, with 3DGS clone/split densification and an exponential
means3D LR schedule.
"""
import argparse
import os
import random
import shutil
import sys

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from tqdm import tqdm  # noqa: E402

from splatam_tpu.core import gaussians as G  # noqa: E402
from splatam_tpu.core.camera import setup_camera  # noqa: E402
from splatam_tpu.eval.evaluate import eval_sequence  # noqa: E402
from splatam_tpu.io.params_io import save_params  # noqa: E402
from splatam_tpu.render.api import RenderConfig  # noqa: E402
from splatam_tpu.slam import optim, steps, steps_gs  # noqa: E402
from splatam_tpu.slam.config import load_experiment_config, seed_everything  # noqa: E402
from splatam_tpu.slam.pipeline import (  # noqa: E402
    _frame_to_device,
    _quat_from_w2c,
)
from splatam_tpu.data import get_dataset, load_dataset_config  # noqa: E402


def _build_dataset(config, h, w, stride=None):
    dataset_config = config["data"]
    if "gradslam_data_cfg" not in dataset_config:
        gradslam_data_cfg = {"dataset_name": dataset_config["dataset_name"]}
    else:
        gradslam_data_cfg = load_dataset_config(dataset_config["gradslam_data_cfg"])
    if "synthetic" in gradslam_data_cfg.get("dataset_name", "").lower():
        gradslam_data_cfg.setdefault("num_frames", dataset_config.get("num_frames", 30))
    return get_dataset(
        config_dict=gradslam_data_cfg,
        basedir=dataset_config.get("basedir", ""),
        sequence=os.path.basename(str(dataset_config.get("sequence", ""))),
        start=dataset_config.get("start", 0),
        end=dataset_config.get("end", -1),
        stride=stride if stride is not None else dataset_config.get("stride", 1),
        desired_height=h,
        desired_width=w,
        relative_pose=True,
        ignore_bad=dataset_config.get("ignore_bad", False),
        use_train_split=dataset_config.get("use_train_split", True),
    )


def offline_splatting(config: dict) -> dict:
    print("Loaded Config:")
    config.setdefault("gaussian_distribution", "anisotropic")
    print(f"{config}")

    dataset_config = config["data"]
    train = config["train"]
    init_h = dataset_config.get(
        "desired_image_height_init", dataset_config["desired_image_height"]
    )
    init_w = dataset_config.get(
        "desired_image_width_init", dataset_config["desired_image_width"]
    )
    dataset = _build_dataset(config, init_h, init_w)
    mapping_dataset = _build_dataset(
        config, dataset_config["desired_image_height"], dataset_config["desired_image_width"]
    )
    eval_dataset = _build_dataset(
        config,
        dataset_config["desired_image_height"],
        dataset_config["desired_image_width"],
        stride=dataset_config.get("eval_stride", dataset_config.get("stride", 1)),
    )
    num_frames = dataset_config.get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    eval_num_frames = dataset_config.get("eval_num_frames", -1)
    if eval_num_frames == -1:
        eval_num_frames = len(eval_dataset)

    tpu = config.get("tpu", {})
    rcfg = RenderConfig(
        backend=tpu.get("backend", "auto"),
        pair_cap=tpu.get("pair_cap", 1 << 20),
        tile_k_max=tpu.get("tile_k_max", 2048),
    )
    isotropic = config["gaussian_distribution"] == "isotropic"

    # ---- Init from frame 0 at init resolution -------------------------
    color_np, depth_np, intr4, pose0 = dataset[0]
    intrinsics = intr4[:3, :3]
    w2c0 = np.linalg.inv(pose0)
    cam = setup_camera(color_np.shape[1], color_np.shape[0], intrinsics, None)
    m_color, m_depth, m_intr4, _ = mapping_dataset[0]
    map_intrinsics = m_intr4[:3, :3]
    map_cam = setup_camera(m_color.shape[1], m_color.shape[0], map_intrinsics, None)

    color, depth = _frame_to_device(color_np, depth_np)
    pts, cols, mean_sq, valid = steps.first_frame_pointcloud(color, depth, cam)
    capacity = tpu.get("capacity", 1 << int(np.ceil(np.log2(max(pts.shape[0] * 2, 4096)))))
    while capacity < pts.shape[0]:
        capacity *= 2
    gm = G.from_pointcloud(pts, cols, mean_sq, valid, capacity, isotropic)
    timestep = jnp.zeros((capacity,), jnp.float32)
    scene_radius = jnp.float32(float(depth_np.max()) / 2.0)

    # ---- Per-frame GT pose + silhouette densification ------------------
    gt_w2c_all = []
    cam_rots = np.tile(np.array([1, 0, 0, 0], np.float32), (num_frames, 1))
    cam_trans = np.zeros((num_frames, 3), np.float32)
    for time_idx in tqdm(range(num_frames), desc="Init/Densify"):
        color_np, depth_np, _, gt_pose = dataset[time_idx]
        gt_w2c = np.linalg.inv(gt_pose)
        gt_w2c_all.append(gt_w2c)
        cam_rots[time_idx] = _quat_from_w2c(gt_w2c)
        cam_trans[time_idx] = gt_w2c[:3, 3]
        if time_idx > 0:
            color, depth = _frame_to_device(color_np, depth_np)
            while True:
                gm2, ts2, _, n_dropped, _, _ = steps.densify_step(
                    gm, timestep, color, depth,
                    jnp.asarray(cam_rots[time_idx]), jnp.asarray(cam_trans[time_idx]),
                    jnp.int32(time_idx), cam, float(train["sil_thres"]), rcfg,
                )
                if int(n_dropped) > 0:
                    new_cap = gm.capacity * 2
                    gm = G.grow_capacity(gm, new_cap)
                    timestep = jnp.concatenate(
                        [timestep, jnp.zeros((new_cap - timestep.shape[0],), jnp.float32)]
                    )
                    continue
                break
            gm, timestep = gm2, ts2
    print(f"Initialized {int(gm.num_active())} gaussians")

    # ---- Final mapping phase over random frames ------------------------
    num_iters = int(train["num_iters_mapping"])
    lrs_map = train["lrs_mapping"]
    lrs = (
        float(lrs_map["means3D"]), float(lrs_map["rgb_colors"]),
        float(lrs_map["unnorm_rotations"]), float(lrs_map["logit_opacities"]),
        float(lrs_map["log_scales"]),
    )
    lr_sched = (
        float(lrs_map["means3D"]),
        float(train["lrs_mapping_means3D_final"]),
        float(train.get("lr_delay_mult", 1.0)),
        float(num_iters),
    )
    dcfg_dict = train.get("densify_dict", {})
    use_densify = train.get("use_gaussian_splatting_densification", False)
    dcfg = steps_gs.DensifyConfig(
        enabled=use_densify,
        **{k: dcfg_dict[k] for k in dcfg_dict if k in steps_gs.DensifyConfig.__dataclass_fields__},
    )
    chunk_size = dcfg.densify_every if use_densify else 200

    # Host frame cache at mapping resolution.
    frame_cache = {}

    def get_frame(idx):
        if idx not in frame_cache:
            c, d, _, _ = mapping_dataset[idx]
            frame_cache[idx] = (
                np.clip(c, 0, 255).astype(np.uint8),
                d[..., 0].astype(np.float32),
            )
        return frame_cache[idx]

    gsvars = steps_gs.GSVariables.zeros(gm.capacity)
    opt_state = optim.adam_init(
        (gm.means3d, gm.rgb_colors, gm.unnorm_rotations, gm.logit_opacities, gm.log_scales)
    )
    rng_key = jax.random.PRNGKey(config.get("seed", 0))

    output_dir = os.path.join(config["workdir"], config["run_name"])

    def export_params(gm, timestep):
        p = G.compact_to_numpy(gm)
        act = np.asarray(gm.active)
        ts = np.asarray(timestep)
        if ts.shape[0] < act.shape[0]:
            ts = np.concatenate([ts, np.zeros(act.shape[0] - ts.shape[0], np.float32)])
        p["timestep"] = ts[np.nonzero(act)[0]]
        p["cam_unnorm_rots"] = cam_rots.T[None]
        p["cam_trans"] = cam_trans.T[None]
        p["intrinsics"] = map_intrinsics
        p["w2c"] = w2c0
        p["org_width"] = dataset_config["desired_image_width"]
        p["org_height"] = dataset_config["desired_image_height"]
        p["gt_w2c_all_frames"] = np.stack(gt_w2c_all)
        p["keyframe_time_indices"] = np.array([])
        return p

    # Intermediate eval hook (reference scripts/gaussian_splatting.py:539-553
    # evaluates at exactly 7000 iterations into eval_7k/).
    eval_at = sorted(int(x) for x in train.get("eval_intermediate_at", [7000]))
    eval_at = [x for x in eval_at if 0 < x < num_iters]

    it = 0
    pbar = tqdm(total=num_iters, desc="Offline mapping")
    while it < num_iters:
        n = min(chunk_size, num_iters - it)
        frame_ids = [random.randint(0, num_frames - 1) for _ in range(n)]
        distinct = sorted(set(frame_ids))
        slot_of = {f: s for s, f in enumerate(distinct)}
        colors_np = np.stack([get_frame(f)[0] for f in distinct])
        depths_np = np.stack([get_frame(f)[1] for f in distinct])
        slots = np.array([slot_of[f] for f in frame_ids], np.int32)
        qs = np.stack([cam_rots[f] for f in frame_ids])
        ts = np.stack([cam_trans[f] for f in frame_ids])

        if gm.capacity != gsvars.means2d_grad_accum.shape[0]:
            gsvars = steps_gs.GSVariables.zeros(gm.capacity)
            opt_state = optim.adam_init(
                (gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
                 gm.logit_opacities, gm.log_scales)
            )
        gm, gsvars, opt_state, _loss = steps_gs.gs_mapping_chunk(
            gm, gsvars, opt_state,
            jnp.asarray(colors_np), jnp.asarray(depths_np),
            jnp.asarray(slots), jnp.asarray(qs), jnp.asarray(ts),
            jnp.int32(it), map_cam, n, rcfg, lrs,
            float(train["loss_weights"]["im"]), float(train["loss_weights"]["depth"]),
            lr_sched, use_densify,
        )
        it += n
        pbar.update(n)
        pbar.set_postfix(loss=f"{float(_loss) / max(n, 1):.4f}",
                         n_gauss=int(gm.num_active()))
        while eval_at and it >= eval_at[0]:
            k_iters = eval_at.pop(0)
            print(f"Evaluating Params at {k_iters} Iterations")
            k_dir = os.path.join(output_dir, f"eval_{k_iters // 1000}k")
            os.makedirs(k_dir, exist_ok=True)
            eval_sequence(
                eval_dataset, export_params(gm, timestep), eval_num_frames,
                k_dir, sil_thres=train["sil_thres"], mapping_iters=num_iters,
                add_new_gaussians=True,
                eval_every=config.get("eval_every", 1), rcfg=rcfg,
            )
        if (
            use_densify
            and it <= dcfg.stop_after
            and it >= dcfg.start_after
            and it % dcfg.densify_every == 0
        ):
            rng_key, sub = jax.random.split(rng_key)
            gm, gsvars, opt_state, ovf = steps_gs.densify_3dgs_step(
                gm, gsvars, opt_state, scene_radius, sub, jnp.int32(it), dcfg,
                final=(it == dcfg.stop_after),
            )
            if int(ovf) > 0:
                gm = G.grow_capacity(gm, gm.capacity * 2)
                print(f"[splatam-tpu] grew capacity to {gm.capacity} (densify overflow)")
            pbar.set_postfix(n_gauss=int(gm.num_active()))
    pbar.close()

    # ---- Eval + save ----------------------------------------------------
    eval_dir = os.path.join(output_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    params = export_params(gm, timestep)

    metrics = eval_sequence(
        eval_dataset, params, eval_num_frames, eval_dir,
        sil_thres=train["sil_thres"], mapping_iters=num_iters,
        add_new_gaussians=True, eval_every=config.get("eval_every", 1), rcfg=rcfg,
    )
    save_params(params, output_dir)
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str, help="Path to experiment file")
    args = parser.parse_args()
    config = load_experiment_config(args.experiment)
    seed_everything(seed=config["seed"])
    results_dir = os.path.join(config["workdir"], config["run_name"])
    os.makedirs(results_dir, exist_ok=True)
    shutil.copy(args.experiment, os.path.join(results_dir, "config.py"))
    offline_splatting(config)
