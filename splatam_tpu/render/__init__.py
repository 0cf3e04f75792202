from splatam_tpu.render.api import RenderConfig, render_gaussians, render_rgbd_sil  # noqa: F401
