from interactvlm_tpu.parallel.mesh import (  # noqa: F401
    MESH_AXES,
    create_mesh,
    LOGICAL_RULES,
    logical_to_mesh,
    shard_params,
    param_shardings,
)
