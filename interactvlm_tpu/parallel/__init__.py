from interactvlm_tpu.parallel.mesh import (  # noqa: F401
    MESH_AXES,
    create_mesh,
    LOGICAL_RULES,
    logical_to_mesh,
    shard_params,
    param_shardings,
)
from interactvlm_tpu.parallel.collectives import (  # noqa: F401
    all_gather_batch,
    all_reduce_mean,
    all_reduce_sum,
    host_gather,
    ppermute_ring,
    psum_scatter,
)
