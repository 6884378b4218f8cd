from openpvsg_tpu.parallel.mesh import (
    make_mesh, data_sharding, replicated, shard_batch)
