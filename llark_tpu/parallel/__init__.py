from llark_tpu.parallel.mesh import (  # noqa: F401
    MeshAxes,
    batch_sharding,
    make_mesh,
    param_partition_specs,
    param_shardings,
)
