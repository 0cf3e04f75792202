"""Post-SplaTAM 3DGS refinement on ScanNet++.
Values: reference configs/scannetpp/post_splatam_opt.py (30k iters,
RGB-only loss)."""
import os

scenes = ["8b5caf3398", "b20a261fdf"]

scene_idx = int(os.environ.get("SCENE", 0))
use_train_split = True
scene_num_frames = [-1, 360] if use_train_split else [-1, -1]
scene_name = scenes[scene_idx]
num_frames = scene_num_frames[scene_idx]

config = dict(
    workdir="./experiments/ScanNet++",
    run_name="Post_SplaTAM_Opt",
    seed=0,
    primary_device="tpu:0",
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    use_wandb=False,
    eval_every=1,
    data=dict(
        dataset_name="scannetpp",
        basedir="./data/ScanNet++/data",
        sequence=scene_name,
        ignore_bad=False,
        use_train_split=use_train_split,
        desired_image_height=584,
        desired_image_width=876,
        start=0,
        end=-1,
        stride=1,
        num_frames=num_frames,
        eval_stride=1,
        eval_num_frames=-1,
        param_ckpt_path="./experiments/ScanNet++/8b5caf3398_0/params.npz",
    ),
    train=dict(
        num_iters_mapping=30000,
        sil_thres=0.5,
        use_sil_for_loss=True,
        loss_weights=dict(im=1.0, depth=0.0),
        lrs_mapping=dict(
            means3D=0.00032,
            rgb_colors=0.0025,
            unnorm_rotations=0.001,
            logit_opacities=0.05,
            log_scales=0.005,
            cam_unnorm_rots=0.0000,
            cam_trans=0.0000,
        ),
        lrs_mapping_means3D_final=0.0000032,
        lr_delay_mult=0.01,
        use_gaussian_splatting_densification=True,
        densify_dict=dict(
            start_after=500,
            remove_big_after=3000,
            stop_after=15000,
            densify_every=100,
            grad_thresh=0.0002,
            num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities=True,
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
)
