from hierslam_tpu.parallel.mesh import make_mesh  # noqa: F401
from hierslam_tpu.parallel.shard import (  # noqa: F401
    make_dp_mapper,
    make_dp_mapping_step,
    make_tile_sharded_render,
)
