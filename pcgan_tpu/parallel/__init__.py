from pcgan_tpu.parallel.mesh import make_mesh, data_sharding, replicated  # noqa: F401
from pcgan_tpu.parallel.train_parallel import (  # noqa: F401
    make_parallel_train_step, shard_train_state, make_parallel_comparator_step)
