from densepoints_tpu.parallel.mesh import (
    PATCH_AXIS,
    make_mesh,
    replicate,
    shard_patches,
)
from densepoints_tpu.parallel.distributed import (
    distributed_insert,
    distributed_refine_step,
    shard_state,
)
