from .mesh import (batch_sharding, device_prefetch, initialize_distributed,
                   make_eval_step, make_mesh, make_sharded_forward,
                   make_train_step, replicated, shard_batch,
                   spatial_sharded_apply)
