"""hierslam_tpu — a TPU-native (JAX / XLA / Pallas) semantic Gaussian-splatting
SLAM framework with the capabilities of Hier-SLAM (ICRA'25, arXiv:2409.12518).

This is a from-scratch rebuild designed TPU-first:

* the differentiable tile-based Gaussian rasterizer is implemented as
  static-shape XLA + Pallas kernels (``hierslam_tpu.ops``) instead of CUDA;
* the SLAM loops (per-frame camera tracking, keyframe-window mapping,
  densification and pruning) compile into jitted ``lax.scan`` steps over a
  fixed-capacity Gaussian map (``hierslam_tpu.slam``);
* RGB-D(+semantic) dataset loaders are a NumPy host pipeline feeding device
  arrays (``hierslam_tpu.datasets``);
* evaluation (ATE / PSNR / SSIM / depth / mIoU / boundary-IoU) lives in
  ``hierslam_tpu.eval``.

Reference behavior citations use ``file:line`` into the upstream repo
(LeeBY68/Hier-SLAM) and are noted in the relevant docstrings.
"""

__version__ = "0.1.0"

from hierslam_tpu.core.camera import Camera, setup_camera  # noqa: F401
from hierslam_tpu.ops.rasterize import RasterConfig, RenderOutput, rasterize  # noqa: F401
