from busca_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
)

__all__ = ["make_mesh", "batch_sharding", "param_shardings"]
