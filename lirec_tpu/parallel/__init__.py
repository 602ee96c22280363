from lirec_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    batch_shardings,
    param_shardings,
    table_shardings,
    shard_tree,
)
from lirec_tpu.parallel.step import make_sharded_train_step  # noqa: F401
