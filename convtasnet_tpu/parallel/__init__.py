from convtasnet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from convtasnet_tpu.parallel.dpt_tp import (  # noqa: F401
    dpt_tp_forward,
    dpt_tp_variables,
    ensure_probed_dpt_tp,
    make_dpt_tp_train_step,
)
