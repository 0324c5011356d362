from vsr_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    param_sharding_rules,
    replicate,
)

__all__ = ["create_mesh", "data_sharding", "param_sharding_rules", "replicate"]
