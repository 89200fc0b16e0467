from red_diffeq_tpu.parallel.mesh import (
    make_mesh, batch_sharding, batch_shot_sharding, replicated,
    shard_inversion_inputs,
)
