from hierslam_tpu.core.camera import Camera, setup_camera  # noqa: F401
from hierslam_tpu.core import transforms  # noqa: F401
