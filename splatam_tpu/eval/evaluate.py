"""Final evaluation: PSNR / MS-SSIM / LPIPS / depth RMSE & L1 / ATE RMSE.

Parity: utils/eval_helpers.py:408-623 (eval) and :626+ (eval_nvs). Renders
use the fused renderer; masking and metric definitions follow the reference
exactly (valid-depth mask, silhouette mask in tracking-only mode, per-frame
txt dumps, metrics.png plot, 2x3 qualitative plots).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from splatam_tpu.core.camera import Camera, setup_camera
from splatam_tpu.core.gaussians import GaussianMap, from_params_dict
from splatam_tpu.core.losses import calc_psnr, ms_ssim
from splatam_tpu.core.transforms import build_rotation, normalize
from splatam_tpu.eval.ate import evaluate_ate
from splatam_tpu.eval.lpips_jax import lpips_fn
from splatam_tpu.render.api import RenderConfig, render_rgbd_sil, split_overflow
from splatam_tpu.slam.steps import transform_to_frame

# Binning packs pair offsets into 23 bits (render.binning); mirrors
# slam.pipeline.PAIR_CAP_HARD_LIMIT without importing the pipeline here.
_PAIR_CAP_HARD_LIMIT = (1 << 23) - (1 << 17)


def _render_checked(gm: GaussianMap, q, t, cam: Camera, rcfg: RenderConfig):
    """render_at_pose with overflow self-healing.

    The online pipeline retries a phase with grown buffers whenever the
    render reports pair/tile-list overflow (pipeline._bump_pair_margin);
    eval had no such retry, so an rcfg sized below the scene's true pair
    count silently truncated the densest tiles and rendered holes — which
    the metrics then scored as catastrophic depth error (round-5
    diagnostic: final-eval PSNR 14 on a map whose frames all render clean
    at a sufficient cap). Returns (out, rcfg) where rcfg is the possibly
    grown config the CALLER should reuse for subsequent frames (each
    growth is one extra jit compile, offline-only cost).
    """
    import dataclasses

    while True:
        out = _render_at_pose_jit(gm, jnp.asarray(q), jnp.asarray(t), cam, rcfg)
        dropped, list_ovf = split_overflow(out.overflow)
        if not dropped and not list_ovf:
            return out, rcfg
        new_pair_cap = (min(rcfg.pair_cap * 2, _PAIR_CAP_HARD_LIMIT)
                        if dropped else rcfg.pair_cap)
        new_tile_k = rcfg.tile_k_max * 2 if list_ovf else rcfg.tile_k_max
        if (new_pair_cap, new_tile_k) == (rcfg.pair_cap, rcfg.tile_k_max):
            print(f"[splatam-tpu] eval render overflow at the hard cap "
                  f"(dropped={dropped}, list={list_ovf}) — metrics for this "
                  f"view underrender")
            return out, rcfg
        print(f"[splatam-tpu] eval render overflow (dropped={dropped}, "
              f"list={list_ovf}) — retrying at pair_cap={new_pair_cap}, "
              f"tile_k_max={new_tile_k}")
        rcfg = dataclasses.replace(
            rcfg, pair_cap=new_pair_cap, tile_k_max=new_tile_k)


def _lpips_metrics(lpips, value) -> dict:
    """Self-describing LPIPS entries for a metrics dict.

    The reference always evaluates a trained AlexNet LPIPS
    (utils/eval_helpers.py:484-489); this environment may fall back to the
    deterministic synthesized calibration (eval/lpips_jax.py), whose values
    are NOT comparable to the paper's. To keep saved artifacts
    self-describing, the canonical key `lpips` is reserved for pretrained
    calibration only; synthetic values land under `lpips_synthetic`, and
    `lpips_calibration` records which one was used.
    """
    v = float(value)
    if lpips is None or np.isnan(v):
        return {"lpips_calibration": "unavailable"}
    if getattr(lpips, "synthetic", False):
        return {"lpips_synthetic": v, "lpips_calibration": "synthetic"}
    return {"lpips": v, "lpips_calibration": "pretrained"}


def _lpips_txt_name(lpips) -> str:
    return "lpips_synthetic" if getattr(lpips, "synthetic", False) else "lpips"


def render_at_pose(gm: GaussianMap, q, t, cam: Camera, rcfg: RenderConfig):
    means_cam, rots_cam = transform_to_frame(gm, jnp.asarray(q), jnp.asarray(t), False, False)
    return render_rgbd_sil(
        cam, means_cam, gm.rgb_colors, rots_cam, gm.logit_opacities,
        gm.log_scales, gm.active, config=rcfg,
    )


_render_at_pose_jit = jax.jit(render_at_pose, static_argnames=("cam", "rcfg"))


def est_w2c_list_from_params(params: dict, num_frames: int, gt_w2c_list):
    """Rebuild the estimated trajectory, skipping nan-gt frames.

    Parity: utils/eval_helpers.py:545-566. Returns (valid_gt, est) lists.
    """
    first = np.asarray(gt_w2c_list[0])
    valid_gt = [first]
    est = [np.eye(4, dtype=np.float32)]
    cam_rots = np.asarray(params["cam_unnorm_rots"])
    cam_trans = np.asarray(params["cam_trans"])
    for idx in range(1, num_frames):
        if np.isnan(np.asarray(gt_w2c_list[idx])).sum() > 0:
            continue
        q = cam_rots[..., idx].reshape(4)
        tr = cam_trans[..., idx].reshape(3)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.asarray(build_rotation(jnp.asarray(q / np.linalg.norm(q))[None]))[0]
        w2c[:3, 3] = tr
        est.append(w2c)
        valid_gt.append(np.asarray(gt_w2c_list[idx]))
    return valid_gt, est


def _plot_rgbd_silhouette(color, depth, rastered_color, rastered_depth, sil_mask,
                          diff_depth_l1, psnr, depth_l1, fig_title, plot_dir, plot_name):
    """Parity: plot_rgbd_silhouette (utils/eval_helpers.py:109-149)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    aspect_ratio = color.shape[2] / color.shape[1]
    fig, axs = plt.subplots(2, 3, figsize=(14 / 1.55 * aspect_ratio, 8))
    axs[0, 0].imshow(np.transpose(np.asarray(color), (1, 2, 0)))
    axs[0, 0].set_title("Ground Truth RGB")
    axs[0, 1].imshow(np.asarray(depth), cmap="jet", vmin=0, vmax=6)
    axs[0, 1].set_title("Ground Truth Depth")
    axs[1, 0].imshow(np.clip(np.transpose(np.asarray(rastered_color), (1, 2, 0)), 0, 1))
    axs[1, 0].set_title("Rasterized RGB, PSNR: {:.2f}".format(psnr))
    axs[1, 1].imshow(np.asarray(rastered_depth), cmap="jet", vmin=0, vmax=6)
    axs[1, 1].set_title("Rasterized Depth, L1: {:.2f}".format(depth_l1))
    axs[0, 2].imshow(np.asarray(sil_mask), cmap="gray")
    axs[0, 2].set_title("Rasterized Silhouette")
    axs[1, 2].imshow(np.asarray(diff_depth_l1), cmap="jet", vmin=0, vmax=6)
    axs[1, 2].set_title("Diff Depth L1")
    for ax in axs.flatten():
        ax.axis("off")
    fig.suptitle(fig_title, y=0.95, fontsize=16)
    fig.tight_layout()
    os.makedirs(plot_dir, exist_ok=True)
    plt.savefig(os.path.join(plot_dir, f"{plot_name}.png"), bbox_inches="tight")
    plt.close()


def report_progress(
    gm: GaussianMap,
    q,
    t,
    color,
    depth_gt,
    cam: Camera,
    sil_thres: float,
    rcfg: RenderConfig = RenderConfig(),
    tracking: bool = False,
    gt_w2c_list=None,
    est_w2c_list=None,
) -> dict:
    """Per-frame progress metrics (PSNR, depth RMSE/L1, tracking ATE).

    Parity: report_progress (utils/eval_helpers.py:152-277) minus the
    wandb/tqdm plumbing — returns the metric dict instead.
    """
    out = _render_at_pose_jit(gm, jnp.asarray(q), jnp.asarray(t), cam, rcfg)
    valid = depth_gt > 0
    sil_mask = out.silhouette > sil_thres
    if tracking:
        psnr = float(
            calc_psnr(out.im * sil_mask[None], color * sil_mask[None]).mean()
        )
        diff = (out.depth - depth_gt) * sil_mask * valid
    else:
        psnr = float(calc_psnr(out.im, color).mean())
        diff = (out.depth - depth_gt) * valid
    cnt = jnp.maximum(valid.sum(), 1)
    metrics = {
        "psnr": psnr,
        "depth_rmse": float(jnp.sqrt(diff**2).sum() / cnt),
        "depth_l1": float(jnp.abs(diff).sum() / cnt),
    }
    if tracking and gt_w2c_list is not None and est_w2c_list is not None:
        try:
            metrics["ate_rmse"] = evaluate_ate(gt_w2c_list, est_w2c_list)
        except Exception:
            metrics["ate_rmse"] = float("nan")
    return metrics


def eval_online(
    dataset,
    all_params: list,
    num_frames: int,
    eval_online_dir: str,
    sil_thres: float,
    mapping_iters: int,
    add_new_gaussians: bool,
    eval_every: int = 1,
    rcfg: RenderConfig = RenderConfig(),
) -> dict:
    """Per-timestep online evaluation over saved parameter snapshots.

    Parity: eval_online (utils/eval_helpers.py:279-405): frame t is
    evaluated against the params as they were at time t.
    """
    print("Evaluating Online Final Parameters...")
    os.makedirs(eval_online_dir, exist_ok=True)
    psnr_list, rmse_list, l1_list = [], [], []
    cam = None
    tracking_only = mapping_iters == 0 and not add_new_gaussians
    for time_idx in range(num_frames):
        if time_idx != 0 and (time_idx + 1) % eval_every != 0:
            continue
        params = all_params[time_idx]
        color_np, depth_np, intrinsics_np, pose_np = dataset[time_idx]
        if cam is None:
            cam = setup_camera(
                color_np.shape[1], color_np.shape[0], intrinsics_np[:3, :3], None
            )
        gm = from_params_dict(params)
        q = np.asarray(params["cam_unnorm_rots"])[0][:, time_idx]
        t = np.asarray(params["cam_trans"])[0][:, time_idx]
        color = jnp.asarray(color_np.transpose(2, 0, 1) / 255.0, jnp.float32)
        depth = jnp.asarray(depth_np[..., 0], jnp.float32)
        m = report_progress(
            gm, q, t, color, depth, cam, sil_thres, rcfg, tracking=tracking_only
        )
        psnr_list.append(m["psnr"])
        rmse_list.append(m["depth_rmse"])
        l1_list.append(m["depth_l1"])
    result = {
        "psnr": float(np.mean(psnr_list)),
        "depth_rmse": float(np.mean(rmse_list)),
        "depth_l1": float(np.mean(l1_list)),
    }
    print("Online Average PSNR: {:.2f}".format(result["psnr"]))
    print("Online Average Depth RMSE: {:.2f}".format(result["depth_rmse"]))
    print("Online Average Depth L1: {:.2f}".format(result["depth_l1"]))
    np.savetxt(os.path.join(eval_online_dir, "online_psnr.txt"), np.array(psnr_list))
    np.savetxt(os.path.join(eval_online_dir, "online_rmse.txt"), np.array(rmse_list))
    np.savetxt(os.path.join(eval_online_dir, "online_l1.txt"), np.array(l1_list))
    return result


def render_at_w2c(gm: GaussianMap, w2c: np.ndarray, cam: Camera, rcfg: RenderConfig):
    """Render at an arbitrary pose given as a 4x4 w2c matrix (NVS eval path:
    utils/eval_helpers.py:672-691 — world means transformed by gt_w2c, then
    rendered through the identity first-frame camera)."""
    q = _quat_from_w2c_np(w2c)
    t = w2c[:3, 3].astype(np.float32)
    return _render_at_pose_jit(gm, jnp.asarray(q), jnp.asarray(t), cam, rcfg)


def _quat_from_w2c_np(w2c: np.ndarray) -> np.ndarray:
    from splatam_tpu.core.transforms import matrix_to_quaternion

    q = np.asarray(matrix_to_quaternion(jnp.asarray(w2c[:3, :3], jnp.float32)))
    return q / np.linalg.norm(q)


def eval_nvs(
    dataset,
    final_params: dict,
    num_frames: int,
    eval_dir: str,
    sil_thres: float,
    mapping_iters: int,
    add_new_gaussians: bool,
    eval_every: int = 1,
    rcfg: RenderConfig = RenderConfig(),
    save_plots: bool = True,
    lpips_weights: str | None = None,
) -> dict:
    """Novel-view-synthesis evaluation on a held-out split.

    Parity: utils/eval_helpers.py:626-841 (eval_nvs): frame 0 is the first
    train frame (skipped), test views render at gt poses, frames with >0.1%
    holes (neither silhouette-present nor invalid-depth) are excluded from
    the averages.
    """
    print("Evaluating Final Parameters for Novel View Synthesis ...")
    os.makedirs(eval_dir, exist_ok=True)
    plot_dir = os.path.join(eval_dir, "plots")
    gm = from_params_dict(final_params)
    lpips = lpips_fn(lpips_weights)
    tracking_only = mapping_iters == 0 and not add_new_gaussians

    psnr_list, rmse_list, l1_list, ssim_list, lpips_list, valid_nvs = [], [], [], [], [], []
    cam = None
    for time_idx in range(num_frames):
        color_np, depth_np, intrinsics_np, pose_np = dataset[time_idx]
        gt_w2c = np.linalg.inv(pose_np)
        if time_idx == 0:
            cam = setup_camera(
                color_np.shape[1], color_np.shape[0], intrinsics_np[:3, :3], None
            )
            continue  # first train frame is not a test view
        test_time_idx = time_idx - 1
        if test_time_idx != 0 and (test_time_idx + 1) % eval_every != 0:
            continue

        color = jnp.asarray(color_np.transpose(2, 0, 1) / 255.0, jnp.float32)
        depth = jnp.asarray(depth_np[..., 0], jnp.float32)
        out, rcfg = _render_checked(
            gm, _quat_from_w2c_np(gt_w2c), gt_w2c[:3, 3].astype(np.float32),
            cam, rcfg)

        valid = depth > 0
        sil_mask = out.silhouette > sil_thres
        rastered_depth = out.depth * valid

        # Hole-validity check (eval_helpers.py:710-716).
        valid_region = sil_mask | ~valid
        percent_holes = float((~valid_region).mean()) * 100
        valid_nvs.append(percent_holes <= 0.1)

        if tracking_only:
            weighted_im = out.im * sil_mask[None] * valid[None]
            weighted_gt = color * sil_mask[None] * valid[None]
        else:
            weighted_im = out.im * valid[None]
            weighted_gt = color * valid[None]
        psnr = float(calc_psnr(weighted_im, weighted_gt).mean())
        ssim = float(ms_ssim(weighted_im, weighted_gt))
        lp = (
            float(lpips(jnp.clip(weighted_im, 0, 1), jnp.clip(weighted_gt, 0, 1)))
            if lpips is not None
            else float("nan")
        )
        diff = (rastered_depth - depth) * valid
        cnt = jnp.maximum(valid.sum(), 1)
        rmse = float(jnp.sqrt(diff**2).sum() / cnt)
        depth_l1 = float(jnp.abs(diff).sum() / cnt)

        psnr_list.append(psnr)
        ssim_list.append(ssim)
        lpips_list.append(lp)
        rmse_list.append(rmse)
        l1_list.append(depth_l1)
        if save_plots:
            _plot_rgbd_silhouette(
                color, depth, out.im, out.depth, sil_mask, jnp.abs(diff),
                psnr, depth_l1, f"Time Step: {time_idx}", plot_dir,
                "%04d" % time_idx,
            )

    valid_nvs = np.array(valid_nvs, bool)
    if valid_nvs.sum() == 0:
        print("WARNING: no valid NVS frames (all exceeded the hole threshold)")
        valid_nvs = np.ones_like(valid_nvs)
    metrics = {
        "psnr": float(np.array(psnr_list)[valid_nvs].mean()),
        "depth_rmse": float(np.array(rmse_list)[valid_nvs].mean()),
        "depth_l1": float(np.array(l1_list)[valid_nvs].mean()),
        "ms_ssim": float(np.array(ssim_list)[valid_nvs].mean()),
        "num_valid_frames": int(valid_nvs.sum()),
    }
    metrics.update(_lpips_metrics(lpips, np.array(lpips_list)[valid_nvs].mean()))
    print("Average PSNR: {:.2f}".format(metrics["psnr"]))
    print("Average Depth RMSE: {:.2f} cm".format(metrics["depth_rmse"] * 100))
    print("Average Depth L1: {:.2f} cm".format(metrics["depth_l1"] * 100))
    print("Average MS-SSIM: {:.3f}".format(metrics["ms_ssim"]))
    for name, vals in [
        ("psnr", psnr_list), ("rmse", rmse_list), ("l1", l1_list),
        ("ssim", ssim_list), (_lpips_txt_name(lpips), lpips_list),
    ]:
        np.savetxt(os.path.join(eval_dir, f"{name}.txt"), np.array(vals))
    np.save(os.path.join(eval_dir, "valid_nvs_frames.npy"), valid_nvs)
    return metrics


def eval_sequence(
    dataset,
    final_params: dict,
    num_frames: int,
    eval_dir: str,
    sil_thres: float,
    mapping_iters: int,
    add_new_gaussians: bool,
    eval_every: int = 1,
    rcfg: RenderConfig = RenderConfig(),
    save_plots: bool = True,
    lpips_weights: str | None = None,
) -> dict:
    """The reference's eval() — returns the summary metric dict."""
    print("Evaluating Final Parameters ...")
    os.makedirs(eval_dir, exist_ok=True)
    plot_dir = os.path.join(eval_dir, "plots")

    gm = from_params_dict(final_params)
    cam_rots = np.asarray(final_params["cam_unnorm_rots"])
    cam_trans = np.asarray(final_params["cam_trans"])
    lpips = lpips_fn(lpips_weights)

    psnr_list, rmse_list, l1_list, ssim_list, lpips_list = [], [], [], [], []
    gt_w2c_list = []
    cam = None
    tracking_only = mapping_iters == 0 and not add_new_gaussians

    for time_idx in range(num_frames):
        color_np, depth_np, intrinsics_np, pose_np = dataset[time_idx]
        gt_w2c_list.append(np.linalg.inv(pose_np))
        if time_idx == 0:
            cam = setup_camera(
                color_np.shape[1], color_np.shape[0], intrinsics_np[:3, :3], None
            )
        if time_idx != 0 and (time_idx + 1) % eval_every != 0:
            continue

        color = jnp.asarray(color_np.transpose(2, 0, 1) / 255.0, jnp.float32)
        depth = jnp.asarray(depth_np[..., 0], jnp.float32)
        q = jnp.asarray(cam_rots[..., time_idx].reshape(4))
        t = jnp.asarray(cam_trans[..., time_idx].reshape(3))
        out, rcfg = _render_checked(gm, q, t, cam, rcfg)

        valid = depth > 0
        sil_mask = out.silhouette > sil_thres
        rastered_depth_viz = out.depth
        rastered_depth = out.depth * valid

        if tracking_only:
            weighted_im = out.im * sil_mask[None] * valid[None]
            weighted_gt = color * sil_mask[None] * valid[None]
        else:
            weighted_im = out.im * valid[None]
            weighted_gt = color * valid[None]
        psnr = float(calc_psnr(weighted_im, weighted_gt).mean())
        ssim = float(ms_ssim(weighted_im, weighted_gt))
        if lpips is not None:
            lp = float(
                lpips(jnp.clip(weighted_im, 0, 1), jnp.clip(weighted_gt, 0, 1))
            )
        else:
            lp = float("nan")

        diff = rastered_depth - depth
        if tracking_only:
            diff = (rastered_depth - depth) * sil_mask
        diff = diff * valid
        cnt = jnp.maximum(valid.sum(), 1)
        rmse = float(jnp.sqrt(diff**2).sum() / cnt)
        depth_l1 = float(jnp.abs(diff).sum() / cnt)

        psnr_list.append(psnr)
        ssim_list.append(ssim)
        lpips_list.append(lp)
        rmse_list.append(rmse)
        l1_list.append(depth_l1)

        if save_plots:
            _plot_rgbd_silhouette(
                color, depth, out.im, rastered_depth_viz, sil_mask,
                jnp.abs(diff), psnr, depth_l1,
                f"Time Step: {time_idx}", plot_dir, "%04d" % time_idx,
            )

    try:
        nf = final_params["cam_unnorm_rots"].shape[-1]
        valid_gt, est = est_w2c_list_from_params(final_params, nf, gt_w2c_list)
        ate_rmse = evaluate_ate(valid_gt, est)
        print("Final Average ATE RMSE: {:.2f} cm".format(ate_rmse * 100))
    except Exception:
        ate_rmse = 100.0
        print("Failed to evaluate trajectory with alignment.")

    metrics = {
        "psnr": float(np.mean(psnr_list)),
        "depth_rmse": float(np.mean(rmse_list)),
        "depth_l1": float(np.mean(l1_list)),
        "ms_ssim": float(np.mean(ssim_list)),
        "ate_rmse": float(ate_rmse),
    }
    metrics.update(_lpips_metrics(lpips, np.mean(lpips_list)))
    print("Average PSNR: {:.2f}".format(metrics["psnr"]))
    print("Average Depth RMSE: {:.2f} cm".format(metrics["depth_rmse"] * 100))
    print("Average Depth L1: {:.2f} cm".format(metrics["depth_l1"] * 100))
    print("Average MS-SSIM: {:.3f}".format(metrics["ms_ssim"]))
    if metrics["lpips_calibration"] == "unavailable":
        print("Average LPIPS: unavailable (no AlexNet weights found)")
    elif metrics["lpips_calibration"] == "synthetic":
        print(
            "Average LPIPS (synthetic calibration): {:.3f} — NOT comparable"
            " to paper values; drop a pretrained lpips_alex.npz in"
            " ~/.cache/splatam_tpu/ for canonical ones".format(
                metrics["lpips_synthetic"])
        )
    else:
        print("Average LPIPS: {:.3f}".format(metrics["lpips"]))

    for name, vals in [
        ("psnr", psnr_list), ("rmse", rmse_list), ("l1", l1_list),
        ("ssim", ssim_list), (_lpips_txt_name(lpips), lpips_list),
    ]:
        np.savetxt(os.path.join(eval_dir, f"{name}.txt"), np.array(vals))

    if save_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 2, figsize=(12, 4))
        axs[0].plot(np.arange(len(psnr_list)), psnr_list)
        axs[0].set_title("RGB PSNR")
        axs[0].set_xlabel("Time Step")
        axs[0].set_ylabel("PSNR")
        axs[1].plot(np.arange(len(l1_list)), np.array(l1_list) * 100)
        axs[1].set_title("Depth L1")
        axs[1].set_xlabel("Time Step")
        axs[1].set_ylabel("L1 (cm)")
        fig.suptitle(
            "Average PSNR: {:.2f}, Average Depth L1: {:.2f} cm, ATE RMSE: {:.2f} cm".format(
                metrics["psnr"], metrics["depth_l1"] * 100, metrics["ate_rmse"] * 100
            ),
            y=1.05,
            fontsize=16,
        )
        plt.savefig(os.path.join(eval_dir, "metrics.png"), bbox_inches="tight")
        plt.close()
    return metrics
