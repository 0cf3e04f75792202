"""Synthetic box-room sequence — smoke-test / benchmark config.

Mirrors configs/replica/splatam.py structurally; the dataset is the
procedural ray-cast SyntheticDataset (no files needed).
"""
import os

seed = int(os.environ.get("SEED", 0))

config = dict(
    workdir="./experiments/Synthetic",
    run_name=f"box_{seed}",
    seed=seed,
    primary_device="tpu:0",
    map_every=1,
    keyframe_every=5,
    mapping_window_size=10,
    report_global_progress_every=500,
    eval_every=1,
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    load_checkpoint=False,
    checkpoint_time_idx=0,
    save_checkpoints=False,
    checkpoint_interval=100,
    use_wandb=False,
    data=dict(
        dataset_name="synthetic",
        basedir="",
        sequence="box",
        desired_image_height=120,
        desired_image_width=160,
        start=0,
        end=-1,
        stride=1,
        num_frames=20,
    ),
    tracking=dict(
        use_gt_poses=False,
        forward_prop=True,
        num_iters=12,
        use_sil_for_loss=True,
        sil_thres=0.99,
        use_l1=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(
            means3D=0.0,
            rgb_colors=0.0,
            unnorm_rotations=0.0,
            logit_opacities=0.0,
            log_scales=0.0,
            cam_unnorm_rots=0.0004,
            cam_trans=0.002,
        ),
    ),
    mapping=dict(
        num_iters=20,
        add_new_gaussians=True,
        sil_thres=0.5,
        use_l1=True,
        use_sil_for_loss=False,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(
            means3D=0.0001,
            rgb_colors=0.0025,
            unnorm_rotations=0.001,
            logit_opacities=0.05,
            log_scales=0.001,
            cam_unnorm_rots=0.0000,
            cam_trans=0.0000,
        ),
        prune_gaussians=True,
        pruning_dict=dict(
            start_after=0,
            remove_big_after=0,
            stop_after=20,
            prune_every=20,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities=False,
            reset_opacities_every=500,
        ),
        use_gaussian_splatting_densification=False,
        densify_dict=dict(
            start_after=500,
            remove_big_after=3000,
            stop_after=5000,
            densify_every=100,
            grad_thresh=0.0002,
            num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities_every=3000,
        ),
    ),
    viz=dict(
        render_mode="color",
        offset_first_viz_cam=True,
        show_sil=False,
        visualize_cams=True,
        viz_w=600,
        viz_h=340,
        viz_near=0.01,
        viz_far=100.0,
        view_scale=2,
        viz_fps=5,
        enter_interactive_post_online=True,
    ),
    # Buffer capacities intentionally omitted: backfill_defaults sizes them
    # from the image (capacity ~ 1.25*H*W, pair_cap ceiling >= 2^21) and the
    # runtime grows them on demand. Hardcoding small values here once
    # silently truncated pair lists at gauntlet scale, which the densifier
    # read as unmapped area — a runaway-map death spiral.
    tpu=dict(
        backend="auto",
    ),
)
