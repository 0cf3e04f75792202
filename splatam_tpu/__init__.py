"""splatam_tpu: TPU-native dense RGB-D SLAM over a 3D Gaussian map.

A from-scratch JAX/XLA/Pallas framework with the capabilities of SplaTAM
(CVPR 2024, reference at /root/reference): online camera tracking,
silhouette-guided densification, and keyframe-window mapping against a
differentiable Gaussian rasterizer that renders RGB, depth, and silhouette
with analytic gradients.

Key architectural departures from the reference (see SURVEY.md section 7):
  * The rasterizer is a fused single-pass renderer producing all six
    channels (RGB + [z, 1, z^2]) in one tile-sorted alpha-compositing sweep
    (reference launches the CUDA rasterizer twice per loss evaluation:
    scripts/splatam.py:249,253).
  * The Gaussian map lives in fixed-capacity masked buffers so that
    densification and pruning never change array shapes (reference reshapes
    tensors and performs Adam-state surgery: utils/slam_external.py:122-244).
  * Tracking and mapping inner loops are jitted lax.while_loop/fori_loop
    programs; one device dispatch per frame phase instead of one per
    optimizer iteration.
"""

__version__ = "0.1.0"

import jax as _jax

# The reference pipeline is float32 end-to-end; the TPU MXU default of
# bfloat16 matmuls (~4e-3 relative error measured on this chip) corrupts
# pose transforms and covariance math far beyond SLAM tolerances. Force
# full-precision matmuls globally; hot kernels opt into lower precision
# explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")
