from tcvom_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                     batch_sharding, local_data)  # noqa: F401
