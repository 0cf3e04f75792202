"""Post-SplaTAM refinement: load a SplaTAM params checkpoint, freeze the
estimated poses, and run a final 3DGS optimization phase.

Usage parity: python scripts/post_splatam_opt.py
configs/<dataset>/post_splatam_opt.py (reference
scripts/post_splatam_opt.py:160-407). The mapping phase is the same
chunked jitted trainer as scripts/gaussian_splatting.py.
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
from splatam_tpu.slam import optim, steps_gs  # noqa: E402
from splatam_tpu.slam.config import load_experiment_config, seed_everything  # noqa: E402

from gaussian_splatting import _build_dataset  # noqa: E402


def post_opt(config: dict) -> dict:
    print("Loaded Config:")
    print(f"{config}")
    dataset_config = config["data"]
    train = config["train"]

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
        num_frames = len(mapping_dataset)
    eval_num_frames = dataset_config.get("eval_num_frames", -1)
    if eval_num_frames == -1:
        eval_num_frames = len(eval_dataset)

    # ---- Load SplaTAM checkpoint --------------------------------------
    ckpt_path = dataset_config["param_ckpt_path"]
    ckpt = dict(np.load(ckpt_path, allow_pickle=True))
    gm = G.from_params_dict(ckpt)
    cam_rots = np.asarray(ckpt["cam_unnorm_rots"])[0].T.astype(np.float32)  # [F,4]
    cam_trans = np.asarray(ckpt["cam_trans"])[0].T.astype(np.float32)  # [F,3]

    _, _, m_intr4, pose0 = mapping_dataset[0]
    map_intrinsics = m_intr4[:3, :3]
    c0, d0, _, _ = mapping_dataset[0]
    map_cam = setup_camera(c0.shape[1], c0.shape[0], map_intrinsics, None)
    w2c0 = np.linalg.inv(pose0)
    scene_radius = jnp.float32(float(d0.max()) / 2.0)

    tpu = config.get("tpu", {})
    rcfg = RenderConfig(
        backend=tpu.get("backend", "auto"),
        pair_cap=tpu.get("pair_cap", 1 << 20),
        tile_k_max=tpu.get("tile_k_max", 2048),
    )

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
    it = 0
    pbar = tqdm(total=num_iters, desc="Post-SplaTAM mapping")
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
        gm, gsvars, opt_state, _ = steps_gs.gs_mapping_chunk(
            gm, gsvars, opt_state,
            jnp.asarray(colors_np), jnp.asarray(depths_np),
            jnp.asarray(slots), jnp.asarray(qs), jnp.asarray(ts),
            jnp.int32(it), map_cam, n, rcfg, lrs,
            float(train["loss_weights"]["im"]), float(train["loss_weights"]["depth"]),
            lr_sched, use_densify,
        )
        it += n
        pbar.update(n)
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
            pbar.set_postfix(n_gauss=int(gm.num_active()))
    pbar.close()

    # ---- Eval + save ----------------------------------------------------
    output_dir = os.path.join(config["workdir"], config["run_name"])
    eval_dir = os.path.join(output_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    params = G.compact_to_numpy(gm)
    params["timestep"] = np.zeros(params["means3D"].shape[0], np.float32)
    params["cam_unnorm_rots"] = cam_rots.T[None]
    params["cam_trans"] = cam_trans.T[None]
    params["intrinsics"] = map_intrinsics
    params["w2c"] = w2c0
    params["org_width"] = dataset_config["desired_image_width"]
    params["org_height"] = dataset_config["desired_image_height"]
    if "gt_w2c_all_frames" in ckpt:
        params["gt_w2c_all_frames"] = ckpt["gt_w2c_all_frames"]
    params["keyframe_time_indices"] = ckpt.get(
        "keyframe_time_indices", np.array([])
    )

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
    post_opt(config)
