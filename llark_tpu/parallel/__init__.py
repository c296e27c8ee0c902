from llark_tpu.parallel.mesh import (  # noqa: F401
    MeshAxes,
    batch_sharding,
    make_mesh,
    param_partition_specs,
    param_shardings,
)
from llark_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_layers_fn,
    make_pp_mesh,
    make_pp_train_step,
    pp_param_specs,
)
