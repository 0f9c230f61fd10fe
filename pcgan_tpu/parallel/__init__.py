from pcgan_tpu.parallel.mesh import (  # noqa: F401
    data_sharding, make_hybrid_mesh, make_mesh, mesh_from_config, replicated)
from pcgan_tpu.parallel.train_parallel import (  # noqa: F401
    make_parallel_train_step, shard_train_state, make_parallel_comparator_step)
